"""Porter stemmer (pure Python, public algorithm).

Implements M.F. Porter, "An algorithm for suffix stripping", Program 14(3)
1980, including the NLTK-documented extensions (the mode the reference runs
in: NLTK ``PorterStemmer()`` defaults to ``NLTK_EXTENSIONS`` — see reference
``utils/text_processing.py:21`` / ``:69``). NLTK itself is not a dependency
of this engine; the stemmer is reimplemented from the published algorithm so
the same pure function backs both the Arrow UDFs and the test oracle.

Extensions replicated (as documented in NLTK's porter module docstring):
  * irregular-forms pool (sky/dying/lying/tying/news/innings/...)
  * words of length <= 2 returned unchanged
  * step 1a: 4-letter "ies" -> "ie" (ties->tie, dies->die)
  * step 1b: "ied" handled like "ies" (died->die, bodied->bodi)
  * step 1c: y->i only after a consonant with stem length > 1
    (happy->happi, enjoy->enjoy, by->by)
  * step 2: "alli" recursion, "fulli"->"ful", Porter-website departures
    bli->ble and logi->log
  * _ends_cvc extension for 2-letter vowel-consonant words
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")

_IRREGULAR_FORMS = {
    "sky": ["sky", "skies"],
    "die": ["dying"],
    "lie": ["lying"],
    "tie": ["tying"],
    "news": ["news"],
    "inning": ["innings", "inning"],
    "outing": ["outings", "outing"],
    "canning": ["cannings", "canning"],
    "howe": ["howe"],
    "proceed": ["proceed"],
    "exceed": ["exceed"],
    "succeed": ["succeed"],
}
_POOL = {form: stem for stem, forms in _IRREGULAR_FORMS.items() for form in forms}


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        if i == 0:
            return True
        return not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    # m in [C](VC)^m[V]
    cv = "".join("c" if _is_consonant(stem, i) else "v" for i in range(len(stem)))
    return cv.count("vc")


def _has_positive_measure(stem: str) -> bool:
    return _measure(stem) > 0


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    return (
        len(word) >= 3
        and _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in ("w", "x", "y")
    ) or (
        # NLTK extension: 2-letter vowel-consonant words end CVC
        len(word) == 2
        and not _is_consonant(word, 0)
        and _is_consonant(word, 1)
    )


def _apply_rules(word: str, rules) -> str:
    for suffix, replacement, condition in rules:
        if suffix == "*d" and _ends_double_consonant(word):
            stem = word[:-2]
            if condition is None or condition(stem):
                return stem + replacement
            return word
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)] if suffix else word
            if condition is None or condition(stem):
                return stem + replacement
            return word
    return word


def _step1a(word: str) -> str:
    if word.endswith("ies") and len(word) == 4:
        return word[:-3] + "ie"
    return _apply_rules(
        word,
        [("sses", "ss", None), ("ies", "i", None), ("ss", "ss", None), ("s", "", None)],
    )


def _step1b(word: str) -> str:
    if word.endswith("ied"):
        return word[:-3] + ("ie" if len(word) == 4 else "i")
    if word.endswith("eed"):
        stem = word[:-3]
        return stem + "ee" if _measure(stem) > 0 else word
    intermediate = None
    for suffix in ("ed", "ing"):
        if word.endswith(suffix):
            candidate = word[: -len(suffix)]
            if _contains_vowel(candidate):
                intermediate = candidate
            break
    if intermediate is None:
        return word
    last = intermediate[-1] if intermediate else ""
    return _apply_rules(
        intermediate,
        [
            ("at", "ate", None),
            ("bl", "ble", None),
            ("iz", "ize", None),
            ("*d", last, lambda stem: last not in ("l", "s", "z")),
            ("", "e", lambda stem: _measure(stem) == 1 and _ends_cvc(stem)),
        ],
    )


def _step1c(word: str) -> str:
    return _apply_rules(
        word,
        [("y", "i", lambda stem: len(stem) > 1 and _is_consonant(stem, len(stem) - 1))],
    )


def _step2(word: str) -> str:
    if word.endswith("alli") and _has_positive_measure(word[:-4]):
        return _step2(word[:-4] + "al")
    rules = [
        ("ational", "ate", _has_positive_measure),
        ("tional", "tion", _has_positive_measure),
        ("enci", "ence", _has_positive_measure),
        ("anci", "ance", _has_positive_measure),
        ("izer", "ize", _has_positive_measure),
        ("bli", "ble", _has_positive_measure),  # departure: Porter's website
        ("alli", "al", _has_positive_measure),
        ("entli", "ent", _has_positive_measure),
        ("eli", "e", _has_positive_measure),
        ("ousli", "ous", _has_positive_measure),
        ("ization", "ize", _has_positive_measure),
        ("ation", "ate", _has_positive_measure),
        ("ator", "ate", _has_positive_measure),
        ("alism", "al", _has_positive_measure),
        ("iveness", "ive", _has_positive_measure),
        ("fulness", "ful", _has_positive_measure),
        ("ousness", "ous", _has_positive_measure),
        ("aliti", "al", _has_positive_measure),
        ("iviti", "ive", _has_positive_measure),
        ("biliti", "ble", _has_positive_measure),
        ("fulli", "ful", _has_positive_measure),
        ("logi", "log", lambda stem: _has_positive_measure(word[:-3])),
    ]
    return _apply_rules(word, rules)


def _step3(word: str) -> str:
    return _apply_rules(
        word,
        [
            ("icate", "ic", _has_positive_measure),
            ("ative", "", _has_positive_measure),
            ("alize", "al", _has_positive_measure),
            ("iciti", "ic", _has_positive_measure),
            ("ical", "ic", _has_positive_measure),
            ("ful", "", _has_positive_measure),
            ("ness", "", _has_positive_measure),
        ],
    )


def _step4(word: str) -> str:
    gt1 = lambda stem: _measure(stem) > 1  # noqa: E731
    return _apply_rules(
        word,
        [
            ("al", "", gt1),
            ("ance", "", gt1),
            ("ence", "", gt1),
            ("er", "", gt1),
            ("ic", "", gt1),
            ("able", "", gt1),
            ("ible", "", gt1),
            ("ant", "", gt1),
            ("ement", "", gt1),
            ("ment", "", gt1),
            ("ent", "", gt1),
            ("ion", "", lambda stem: _measure(stem) > 1 and bool(stem) and stem[-1] in ("s", "t")),
            ("ou", "", gt1),
            ("ism", "", gt1),
            ("ate", "", gt1),
            ("iti", "", gt1),
            ("ous", "", gt1),
            ("ive", "", gt1),
            ("ize", "", gt1),
        ],
    )


def _step5a(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            return stem
    return word


def _step5b(word: str) -> str:
    if word.endswith("ll") and _measure(word[:-1]) > 1:
        return word[:-1]
    return word


@lru_cache(maxsize=1 << 18)
def stem(word: str) -> str:
    """Stem a single (already lowercase) token."""
    w = word.lower()
    if w in _POOL:
        return _POOL[w]
    if len(w) <= 2:
        return w
    w = _step1a(w)
    w = _step1b(w)
    w = _step1c(w)
    w = _step2(w)
    w = _step3(w)
    w = _step4(w)
    w = _step5a(w)
    w = _step5b(w)
    return w
