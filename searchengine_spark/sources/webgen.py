"""Deterministic synthetic ``web_pages`` corpus generator (FIXTURES.md §1).

Schema per ``BASELINE.json`` ``input_hint``::

    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

``text`` is the reference-extracted text of ``html`` (crawler.py:284-290
semantics via textproc.extract_text_from_html) — the byte-identity oracle
column. Generation is pure per ``doc_id`` (counter-based RNG), so the same
``(seed, doc_id)`` always yields the same bytes, regardless of partitioning
— which is what makes distributed generation + resume tests deterministic.

Corpus properties (to exercise every engine path):
  * Zipf(~1.07) vocabulary of ~5000 words incl. derivational suffixes
    (stemmer collisions), so head terms create real posting-list skew.
  * Planted rare terms ``zqplanted{k}`` with exact known df for
    hand-checkable BM25 assertions: term k appears in docs where
    ``doc_id % (50 * (k+1)) == k``, 3 occurrences each.
  * HTML noise: nav/header/footer/script/style blocks (must be stripped),
    comments, entities, raw URLs, hyphenated words, <a href> links whose
    anchor text *is* content (bs4 get_text keeps it).
  * Hostile-HTML slices (deterministic doc_id residues): '>' inside quoted
    attributes, escaped markup, word-splitting inline tags, uppercase
    drop-elements, CDATA sections, unclosed containers — the constructs
    tests/test_extraction_hostile.py pins hand-derived expectations for.
  * meta description alternates attribute order (exercises
    text_processing.py:114-125 fallback).
  * ~10% of URLs lack article-path/date patterns (crawler.py:131-157).
"""

from __future__ import annotations

import bisect
import datetime as dt
import itertools
import random
from functools import lru_cache

import pandas as pd

from searchengine_spark.functions import textproc

SEED = 42
VOCAB_SIZE = 5000
N_PLANTED = 8
LANGS = ["en", "en", "en", "en", "es", "de", "fr", "zh"]  # Zipf-ish: en-heavy
_EPOCH = dt.datetime(2025, 7, 1, tzinfo=dt.timezone.utc)

_SUFFIXES = ["", "", "", "", "s", "ing", "ed", "tion", "ness", "ly", "er", "al"]


@lru_cache(maxsize=4)
def vocabulary(seed: int = SEED) -> list[str]:
    """~5000 deterministic pseudo-words, rank 0 = most frequent."""
    rng = random.Random(seed)
    consonants = "bcdfghjklmnprstvwz"
    vowels = "aeiou"
    syllables = [c + v for c, v in itertools.product(consonants, vowels)]
    words: list[str] = []
    seen: set[str] = set()
    while len(words) < VOCAB_SIZE:
        base = "".join(rng.choice(syllables) for _ in range(rng.randint(1, 3)))
        w = base + rng.choice(_SUFFIXES)
        if len(w) >= 2 and w not in seen:
            seen.add(w)
            words.append(w)
    return words


@lru_cache(maxsize=4)
def _zipf_cumweights(seed: int = SEED) -> list[float]:
    s = 1.07
    weights = [1.0 / (rank + 1) ** s for rank in range(VOCAB_SIZE)]
    return list(itertools.accumulate(weights))


def planted_term(k: int) -> str:
    return f"zqplanted{k}"


def planted_doc_ids(k: int, n_docs: int) -> list[int]:
    period = 50 * (k + 1)
    return [d for d in range(n_docs) if d % period == k]


_NOISE_WORDS = "sitemap login subscribe cookie banner advertisement tracker menu"


def _sample_words(rng: random.Random, cum: list[float], vocab: list[str], n: int) -> list[str]:
    total = cum[-1]
    return [vocab[bisect.bisect_left(cum, rng.random() * total)] for _ in range(n)]


def gen_doc(doc_id: int, seed: int = SEED) -> dict:
    """Pure function (seed, doc_id) → one web_pages row."""
    vocab = vocabulary(seed)
    cum = _zipf_cumweights(seed)
    rng = random.Random((seed << 34) ^ (doc_id * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFF))

    site = doc_id % 50
    yyyy = 2020 + (doc_id % 6)
    mm = 1 + (doc_id % 12)
    if doc_id % 10 == 7:  # ~10% non-article URLs
        url = f"https://blog{site}.example.com/about-{doc_id}"
    else:
        url = f"https://blog{site}.example.com/{yyyy}/{mm:02d}/post-{doc_id}"

    title_words = _sample_words(rng, cum, vocab, rng.randint(3, 7))
    title = " ".join(w.capitalize() for w in title_words)
    meta_words = _sample_words(rng, cum, vocab, rng.randint(8, 16))
    meta = " ".join(meta_words)

    n_paras = rng.randint(3, 8)
    paras = []
    for _ in range(n_paras):
        words = _sample_words(rng, cum, vocab, rng.randint(30, 90))
        # sprinkle structure the tokenizer must handle
        if rng.random() < 0.5 and len(words) > 4:
            i = rng.randrange(len(words) - 1)
            words[i] = words[i] + "-" + words[i + 1]  # hyphenated
        if rng.random() < 0.4:
            words.insert(rng.randrange(len(words)), "&amp;")  # entity
        if rng.random() < 0.3:
            words.insert(rng.randrange(len(words)), f"https://ref{doc_id % 9}.example.org/x")
        if rng.random() < 0.3:
            words.insert(rng.randrange(len(words)), str(rng.randint(0, 9999)))
        paras.append(" ".join(words))

    # planted rare terms with exact df/tf
    for k in range(N_PLANTED):
        if doc_id % (50 * (k + 1)) == k:
            paras.append(" ".join([planted_term(k)] * 3))

    anchor = " ".join(_sample_words(rng, cum, vocab, 2))
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)

    # hostile-HTML slices (deterministic by doc_id): constructs real
    # Common-Crawl pages contain that break naive tag regexes — quoted
    # '>' in attributes, escaped markup, word-splitting inline tags,
    # uppercase drop-elements, CDATA, unclosed containers. The ``text``
    # column derives through the extractor, so hand-derived per-construct
    # expectations live in tests/test_extraction_hostile.py.
    if doc_id % 13 == 5:
        body_paras += (
            f'\n<p>see <a title="q>{doc_id}" href="/x">note {doc_id}</a> end</p>'
        )
    if doc_id % 17 == 3:
        w = _sample_words(rng, cum, vocab, 1)[0]
        body_paras += f"\n<p>&lt;em&gt;{w}&lt;/em&gt; emphasized</p>"
    if doc_id % 19 == 4:
        body_paras += "\n<NAV>stale uppercase menu</NAV>"
    if doc_id % 23 == 6:
        body_paras += f"\n<![CDATA[raw {doc_id}]]>"
    if doc_id % 29 == 7:
        w = _sample_words(rng, cum, vocab, 1)[0]
        h = max(1, len(w) // 2)
        body_paras += f"\n<p>{w[:h]}<b>{w[h:]}</b> inline</p>"
    if doc_id % 31 == 8:
        body_paras += "\n<div class=open data-x='1'>unclosed container text"
    meta_tag = (
        f'<meta name="description" content="{meta}">'
        if doc_id % 2 == 0
        else f'<meta content="{meta}" name="description">'
    )
    html = f"""<!DOCTYPE html>
<html lang="en">
<head>
<title>{title}</title>
{meta_tag}
<style>body {{ font-size: 14px; }} .ad {{ display: none }}</style>
<script>var t = {doc_id}; console.log("tracking " + t);</script>
</head>
<body>
<header>{_NOISE_WORDS}</header>
<nav><a href="/home">home</a> <a href="/archive">archive</a></nav>
<!-- comment noise {doc_id} -->
<h1>{title}</h1>
{body_paras}
<p>Read also <a href="/{yyyy}/{mm:02d}/post-{doc_id + 1}">{anchor}</a> &copy; blog{site}</p>
<footer>{_NOISE_WORDS} footer-{site}</footer>
</body>
</html>"""

    return {
        "url": url,
        "warc_ts": _EPOCH + dt.timedelta(seconds=doc_id),
        "html": html.encode("utf-8"),
        "text": textproc.extract_text_from_html(html),
        "lang": LANGS[doc_id % len(LANGS)],
    }


def generate_pandas(n_docs: int, seed: int = SEED, start: int = 0) -> pd.DataFrame:
    rows = [gen_doc(d, seed) for d in range(start, start + n_docs)]
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    return df


def generate_spark(spark, n_docs: int, seed: int = SEED, partitions: int = 32):
    """Distributed generation: spark.range → mapInPandas (one Arrow batch
    per id-range chunk). Pure per-id, so output is partitioning-invariant."""
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            for chunk_start in range(0, len(pdf), 2000):
                ids = pdf["id"].iloc[chunk_start : chunk_start + 2000]
                yield pd.DataFrame(
                    [gen_doc(int(d), seed) for d in ids],
                    columns=["url", "warc_ts", "html", "text", "lang"],
                )

    return spark.range(0, n_docs, numPartitions=partitions).mapInPandas(gen, schema)


# --- reference query set (FIXTURES.md §2): 21 queries modeled on the shapes
# in /root/reference/data/google_cache/search_cache.json keys, regenerated
# against the synthetic vocabulary + planted terms ---
def reference_queries(seed: int = SEED) -> list[tuple[int, str]]:
    vocab = vocabulary(seed)
    rng = random.Random(seed + 1)
    head = vocab[:30]
    mid = vocab[100:400]
    qs: list[str] = []
    qs.append(head[0].capitalize())  # single head term, capitalized ("Coffee")
    qs.append(f"how to become a {mid[0]} {mid[1]}")  # stopword-heavy phrase
    qs.append(f"{head[1].capitalize()} of {mid[2]}")  # "Power of Russia"
    qs.append(f"{mid[3]} ratio")
    qs.append(mid[4].capitalize())  # name-like single term
    qs.append(f"Best way to learn {mid[5]}")
    qs.append(f"{head[2].capitalize()} {mid[6].capitalize()} cup")
    qs.append(f"{mid[7].capitalize()} {mid[8].capitalize()}")
    qs.append(f"{head[3].capitalize()} war 2")  # numeric token
    qs.append(planted_term(0))  # planted exact-df term
    qs.append(f"{planted_term(1)} {mid[9]}")  # planted + vocab
    qs.append(f"Get better in {mid[5]}")
    qs.append(f"Professional career as {mid[10].capitalize()} {mid[11].capitalize()}")
    qs.append(f"{mid[12].capitalize()} network in {mid[13].capitalize()}")
    qs.append(f"{mid[4][:3]}\\")  # truncated + escape char ("Gar\")
    qs.append(f"{mid[12].capitalize()} in {mid[14].upper()}")
    qs.append(rng.choice(mid).capitalize())
    qs.append(f"{mid[4].capitalize()} ki {mid[15].capitalize()}")
    qs.append(f"{head[3].capitalize()} war ")  # trailing space
    qs.append("Python")  # out-of-vocabulary term
    qs.append(f"{mid[4].capitalize()} ki {mid[15]}")  # case variant duplicate
    return list(enumerate(qs))
