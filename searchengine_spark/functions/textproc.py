"""Pure text-processing functions (the reference-semantics contract).

Each function replicates one reference routine exactly (citations are
``file:line`` into /root/reference). These pure functions are shared by:

  * the Arrow pandas UDFs (:mod:`searchengine_spark.functions.udfs`) that run
    distributed inside Spark, and
  * the single-process test oracle (:mod:`searchengine_spark.oracle`),

which is what makes per-row byte-identity testable.

The reference tokenizes with NLTK ``word_tokenize`` + ``PorterStemmer``
(``text_processing.py:63-74``). NLTK is not available in this environment;
however, by the time ``word_tokenize`` runs, the reference has already
replaced every non-``[\\w\\s-]`` character and every hyphen with spaces
(``text_processing.py:51-60``), so the input contains only word characters
and whitespace — on that alphabet ``word_tokenize`` degenerates to a
whitespace split, which is what we implement. Stemming uses the pure-Python
Porter implementation in :mod:`searchengine_spark.functions.porter`.
"""

from __future__ import annotations

import hashlib
import html.parser as _htmlparser
import re
from typing import Iterable

from searchengine_spark.config import (
    DEFAULT_STOPWORDS,
    MAX_TOKEN_LENGTH,
    MIN_TOKEN_LENGTH,
    SNIPPET_LENGTH,
    SNIPPET_WINDOW_STEP,
)
from searchengine_spark.functions.porter import stem

# --- regexes, compiled once (identical patterns to the reference) ---
_RE_TAG = re.compile(r"<[^>]+>")  # text_processing.py:88
_RE_WS = re.compile(r"\s+")  # text_processing.py:91
_RE_ENTITY = re.compile(r"&\w+;")  # text_processing.py:51
_RE_URL = re.compile(r"https?://\S+")  # text_processing.py:54
_RE_NONWORD = re.compile(r"[^\w\s-]")  # text_processing.py:57
# Fused hot-path variant: sub([^\w\s-])→' ' then replace('-',' ') is exactly
# sub([^\w\s])→' ' in one C pass (any non-word non-space char, hyphen
# included, becomes a space either way).
_RE_NONWORD_OR_HYPHEN = re.compile(r"[^\w\s]")
_RE_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_RE_META1 = re.compile(r'<meta[^>]*name="description"[^>]*content="([^"]*)"', re.IGNORECASE)
_RE_META2 = re.compile(r'<meta[^>]*content="([^"]*)"[^>]*name="description"', re.IGNORECASE)
_RE_DOMAIN = re.compile(r"https?://(?:www\.)?([^/]+)")
# Elements whose entire subtree the reference decomposes (crawler.py:287-288)
_DROP_ELEMENTS = frozenset({"script", "style", "nav", "footer", "header"})


def clean_text(text: str) -> str:
    """Strip tags and collapse whitespace (text_processing.py:83-93)."""
    text = _RE_TAG.sub(" ", text)
    return _RE_WS.sub(" ", text).strip()


class _TextExtractor(_htmlparser.HTMLParser):
    """Event-driven twin of the reference's extraction (crawler.py:284-290):
    BeautifulSoup(lxml) ``decompose()`` of script/style/nav/footer/header
    subtrees followed by ``get_text()`` (bare concatenation of text nodes,
    no separator). Parser-level behaviors replicated:

    * quoted attribute values may contain ``>`` (a regex tag-stripper
      mis-splits these; the tokenizer here does not);
    * script/style are raw-text elements — their content is swallowed up
      to the matching close tag, or to EOF when unclosed;
    * nav/footer/header are container elements unknown to libxml2's HTML4
      tag table, so an unclosed one stays open and swallows everything to
      its parent's end (≈ EOF) — modeled by a drop-depth that only a
      matching close tag decrements; nested same-name blocks nest;
    * ``<nav/>`` self-closing syntax does not exist for non-void HTML
      elements — real HTML parsers treat it as an OPEN tag, so it swallows;
    * comments, doctype, CDATA/marked sections produce no text;
    * entities decode at parse time (``convert_charrefs``), so the
      reference's ``clean_text`` tag-strip runs on DECODED text — escaped
      markup (``&lt;b&gt;``) becomes a literal tag that clean_text removes.

    Hand-derived hostile-input expectations live in
    tests/test_extraction_hostile.py; the remaining known divergences from
    bs4+lxml are documented there per-case.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._drop_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_ELEMENTS:
            self._drop_depth += 1

    def handle_startendtag(self, tag, attrs):
        # "<nav/>": HTML has no self-closing non-void elements — it opens
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _DROP_ELEMENTS and self._drop_depth > 0:
            self._drop_depth -= 1

    def handle_data(self, data):
        if self._drop_depth == 0:
            self.parts.append(data)


def extract_text_from_html(html: str) -> str:
    """HTML → main-content text (crawler.py:284-290 semantics).

    bs4/lxml are unavailable in this environment; the stdlib
    ``html.parser`` event stream drives an exact re-derivation of
    decompose+get_text (see :class:`_TextExtractor`), then the reference's
    ``clean_text`` (tag-strip + whitespace-collapse) runs over the decoded
    text — the same post-pass the reference applies to ``soup.get_text()``.
    """
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return clean_text("".join(p.parts))


def extract_title_from_html(html: str) -> str:
    """text_processing.py:105-112."""
    m = _RE_TITLE.search(html)
    return clean_text(m.group(1)) if m else ""


def extract_meta_description(html: str) -> str:
    """text_processing.py:114-125 (both attribute orders)."""
    m = _RE_META1.search(html) or _RE_META2.search(html)
    return clean_text(m.group(1)) if m else ""


def extract_domain(url: str) -> str:
    """text_processing.py:95-103."""
    m = _RE_DOMAIN.search(url)
    return m.group(1) if m else ""


def tokenize(text: str) -> list[str]:
    """Lowercase → strip entities/URLs/punct/hyphens → split → Porter stem →
    drop len<=1 (text_processing.py:40-81, NLTK path)."""
    if not text:
        return []
    text = text.lower()
    text = _RE_ENTITY.sub(" ", text)
    text = _RE_URL.sub(" ", text)
    text = _RE_NONWORD.sub(" ", text)
    text = text.replace("-", " ")
    tokens = [stem(t) for t in text.split()]
    return [t for t in tokens if len(t) > 1]


def tokenize_simple(text: str) -> list[str]:
    """SQL-expressible tokenizer variant (no stemming) used by the
    DuckDB-checkable ``__spark_entry__`` queries: lowercase, split on
    non-alphanumeric runs, keep 2..20-char non-stopword tokens.

    Equivalent SQL (DuckDB & Spark SQL):
    ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` + length/stopword
    filter. Kept deliberately simple so the oracle is exactly expressible.
    """
    if not text:
        return []
    out = []
    for t in re.split(r"[^a-z0-9]+", text.lower()):
        if MIN_TOKEN_LENGTH <= len(t) <= MAX_TOKEN_LENGTH and t not in DEFAULT_STOPWORDS:
            out.append(t)
    return out


# Per-token outcome memo for tokenize_filtered: raw token → surviving stem,
# or None if the token is dropped (too short/long after stemming, or a
# stopword). Zipf token distributions make the hit rate ≈1, so the steady
# state is ONE dict probe per token instead of stem() (an lru_cache call:
# arg hashing + wrapper frame) plus a length test plus a set probe. Keyed by
# id(stopword set) with a strong reference held, so ids can never be reused.
# Memory bounds are tiered: the hot DEFAULT_STOPWORDS memo gets the large
# cap and is NEVER evicted by other sets' pressure; each non-default set
# gets a much smaller per-memo cap, and when the set count overflows only
# the non-default memos are dropped — an overflow can no longer wipe the
# default memo, and only the offending memo is ever cleared for size.
# Worst case resident: _FILTER_MEMO_MAX + 64·_FILTER_MEMO_SET_MAX entries
# per worker process. Only FROZEN sets are memoized across calls — a
# mutable set could be mutated between calls, which would make cached
# outcomes stale; those get a fresh per-call memo instead.
_FILTER_MEMO: dict[int, tuple[frozenset[str], dict[str, str | None]]] = {}
_FILTER_MEMO_MAX = 1 << 21  # default-stopwords memo (the index-build path)
_FILTER_MEMO_SET_MAX = 1 << 15  # each non-default stopword set
_MISS = object()  # memo-miss sentinel ('' and None are valid cached values)


def tokenize_filtered(
    text: str, stopwords: frozenset[str] | set[str] = DEFAULT_STOPWORDS
) -> list[str]:
    """Fused ``filter_tokens(tokenize(text))`` — the index-build hot path.

    Output-identical to the three-pass spec (property-tested in
    tests/test_textproc.py); raw len-1 tokens skip the stem call entirely
    (their stems are identity and dropped by the post-stem length bound).
    ``tokenize``/``filter_tokens`` stay the executable spec.
    """
    if not text:
        return []
    text = text.lower()
    text = _RE_ENTITY.sub(" ", text)
    text = _RE_URL.sub(" ", text)
    text = _RE_NONWORD_OR_HYPHEN.sub(" ", text)
    if isinstance(stopwords, frozenset):
        entry = _FILTER_MEMO.get(id(stopwords))
        if entry is None:
            if len(_FILTER_MEMO) > 64:
                for k, (s, _) in list(_FILTER_MEMO.items()):
                    if s is not DEFAULT_STOPWORDS:
                        del _FILTER_MEMO[k]
            _FILTER_MEMO[id(stopwords)] = entry = (stopwords, {})
        memo = entry[1]
        cap = (
            _FILTER_MEMO_MAX
            if stopwords is DEFAULT_STOPWORDS
            else _FILTER_MEMO_SET_MAX
        )
        if len(memo) > cap:
            memo.clear()
    else:  # mutable set: memoize within this call only (no staleness)
        memo = {}
    out = []
    append = out.append
    get = memo.get
    for t in text.split():
        s = get(t, _MISS)
        if s is _MISS:
            if len(t) > 1:
                s = stem(t)
                if not (
                    MIN_TOKEN_LENGTH <= len(s) <= MAX_TOKEN_LENGTH
                    and s not in stopwords
                ):
                    s = None
            else:
                s = None
            memo[t] = s
        if s is not None:
            append(s)
    return out


def filter_tokens(tokens: Iterable[str], stopwords: frozenset[str] | set[str] = DEFAULT_STOPWORDS) -> list[str]:
    """Stopword + length bound filter (indexer.py:73-90 / :300-305)."""
    return [
        t
        for t in tokens
        if t not in stopwords and MIN_TOKEN_LENGTH <= len(t) <= MAX_TOKEN_LENGTH
    ]


def expand_query(query: str) -> str:
    """Query expansion (text_processing.py:127-161).

    Tokenize each whitespace phrase; append stems not already present (the
    tokens are already stemmed, so the NLTK branch at :146-153 never adds
    anything — replicated faithfully); append original phrases of len>1.
    """
    query = query.lower().strip()
    phrases = [p.strip() for p in query.split() if p.strip()]
    tokens: list[str] = []
    for phrase in phrases:
        tokens.extend(tokenize(phrase))
    expanded = tokens.copy()
    for token in tokens:
        s = stem(token)
        if s != token and s not in expanded:
            expanded.append(s)
    for phrase in phrases:
        if phrase not in expanded and len(phrase) > 1:
            expanded.append(phrase)
    return " ".join(expanded)


def weighted_tokens(
    title: str,
    meta_description: str,
    content: str,
    stopwords: frozenset[str] | set[str] = DEFAULT_STOPWORDS,
    title_boost: float = 5.0,
    meta_boost: float = 3.0,
) -> dict[str, float]:
    """Field-weighted term-frequency map (indexer.py:58-107)."""
    weighted: dict[str, float] = {}
    for field_text, boost in ((title, title_boost), (meta_description, meta_boost), (content, 1.0)):
        for tok in filter_tokens(tokenize(field_text), stopwords):
            weighted[tok] = weighted.get(tok, 0.0) + boost
    return weighted


def doc_id_for_url(url: str) -> str:
    """md5 hex of url (crawler.py:79-83)."""
    return hashlib.md5(url.encode()).hexdigest()


def make_snippet(content: str) -> str:
    """Stored content snippet (indexer.py:141): first 200 chars + '...'."""
    return content[:SNIPPET_LENGTH] + "..." if content else ""


def relevant_snippet(content_snippet: str, query_tokens: list[str]) -> str:
    """Query-relevant snippet windowing (indexer.py:344-374)."""
    content = content_snippet or ""
    if not content or not query_tokens:
        return content
    content_lower = content.lower()
    best_start, best_count = 0, 0
    for i in range(0, len(content) - SNIPPET_LENGTH, SNIPPET_WINDOW_STEP):
        window = content_lower[i : i + SNIPPET_LENGTH]
        count = sum(1 for term in query_tokens if term in window)
        if count > best_count:
            best_count, best_start = count, i
    if best_count > 0:
        return content[best_start : best_start + SNIPPET_LENGTH] + "..."
    return content[:SNIPPET_LENGTH] + "..." if len(content) > SNIPPET_LENGTH else content
