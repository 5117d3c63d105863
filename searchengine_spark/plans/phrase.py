"""Phrase queries over the positional sharded index.

The reference has no positional index and no phrase operator — its closest
behaviors are the raw-substring phrase boosts (indexer.py:405-419) and the
all-tokens-in-snippet "proximity" test (indexer.py:439-441). The north rule,
however, specifies the posting payload as (docID, tf, positions); phrase
matching is the operator that payload exists for, so we implement the
classic positional-intersection phrase query (Manning/Raghavan/Schütze IR
§2.4.2) on top of it.

Two execution paths, both distributed:

* :func:`phrase_match_sharded` — the engine path. Posting blocks for the
  phrase terms are pruned by the term IN-list (term-sorted parquet row
  groups skip), grouped per shard, and a vectorized numpy kernel intersects
  position sets: a phrase occurrence starting at position p requires
  p ∈ pos(t₀), p+1 ∈ pos(t₁), …, p+i ∈ pos(tᵢ). Encoding each candidate as
  the 64-bit key ``local_docno·2³² + (pos − i)`` turns the phrase test into
  ``np.intersect1d`` across terms — no per-document Python loop. Doc-range
  sharding means every doc's postings are local to one shard, so the kernel
  needs no cross-shard traffic and global results are a plain union.

* :func:`phrase_tf_col` — the Catalyst-native path for token-array frames
  (no index): a within-row lambda over the token array counts adjacent
  matches; map-only, no shuffle, used by the driver-contract entry query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.config import DEFAULT_STOPWORDS
from searchengine_spark.functions import textproc
from searchengine_spark.operators import codec

PHRASE_RESULT_SCHEMA = "shard int, docno long, phrase_tf long"

# The positional kernels pack (local_docno, position) into one signed int64
# key as docno·2³² + pos. Positions are bounded < 2³² by the codec; the
# local docno must stay below 2³¹ so the key never overflows the sign bit
# (and window arithmetic like ``ka − window`` can't collide across docs).
# At 10¹² docs this means n_shards ≥ 466 — enforced, not assumed.
_MAX_SHARD_SIZE = 1 << 31


def _check_shard_size(shard_size: int) -> None:
    if shard_size > _MAX_SHARD_SIZE:
        raise ValueError(
            f"shard_size={shard_size} exceeds 2^31: positional kernels pack "
            "local docno into the high bits of a signed int64 key — rebuild "
            "the index with a larger n_shards so each doc-range shard covers "
            "at most 2^31 docs"
        )


def _term_pos_keys(pdf: pd.DataFrame, t: str, base: np.int64, offset: int = 0) -> np.ndarray:
    """Sorted ``(local_docno << 32) | (pos − offset)`` keys for one term's
    (already term-filtered input) block rows; occurrences with
    ``pos < offset`` are dropped. Shared by the phrase / proximity / window
    kernels — one decode routine, one key layout."""
    keys = []
    for row in pdf[pdf["term"] == t].itertuples(index=False):
        d, _tf, _dl = codec.decode_postings(row.gaps, row.tfs, row.dls)
        counts, pos = codec.decode_positions(row.pcounts, row.pgaps)
        docrep = np.repeat(d.astype(np.int64) - base, counts)
        p = pos.astype(np.int64) - offset
        if offset:
            ok = p >= 0
            docrep, p = docrep[ok], p[ok]
        keys.append((docrep << np.int64(32)) | p)
    return np.sort(np.concatenate(keys)) if keys else np.empty(0, dtype=np.int64)


def analyze_phrase(phrase: str, stopwords: frozenset[str] = DEFAULT_STOPWORDS) -> list[str]:
    """Phrase text → ordered term list via the full reference tokenizer
    (tokenize + length/stopword filter, text_processing.py:40-81 +
    indexer.py:73-90). Order and duplicates are preserved — a phrase is a
    sequence, not a term set."""
    return textproc.filter_tokens(textproc.tokenize(phrase), stopwords)


def _phrase_kernel_factory(
    terms: list[str], shard_size: int, kill: np.ndarray | None = None
):
    """Per-shard kernel: positional block rows (already filtered to the
    phrase terms) → (shard, docno, phrase_tf) rows. ``kill`` is a sorted
    tombstone-mask docno array (operators/tombstones): masked docs drop
    BEFORE ranking, so a masked winner can never displace a survivor."""
    _check_shard_size(shard_size)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "shard": pd.Series(dtype="int32"),
                "docno": pd.Series(dtype="int64"),
                "phrase_tf": pd.Series(dtype="int64"),
            }
        )
        if len(pdf) == 0:
            return empty
        shard = int(pdf["shard"].iloc[0])
        base = np.int64(shard) * np.int64(shard_size)
        keys: np.ndarray | None = None
        for i, t in enumerate(terms):
            tk = _term_pos_keys(pdf, t, base, offset=i)
            if tk.size == 0:
                return empty
            if keys is None:
                keys = tk
            else:
                keys = np.intersect1d(keys, tk, assume_unique=True)
            if keys.size == 0:
                return empty
        assert keys is not None
        local_docs, tf = np.unique(keys >> np.int64(32), return_counts=True)
        docnos = local_docs + base
        if kill is not None and kill.size:
            alive = ~np.isin(docnos, kill)
            docnos, tf = docnos[alive], tf[alive]
        return pd.DataFrame(
            {
                "shard": np.full(docnos.size, shard, dtype=np.int32),
                "docno": docnos,
                "phrase_tf": tf.astype(np.int64),
            }
        )

    return kernel


def phrase_match_sharded(
    spark: SparkSession,
    index,
    phrase: str,
    top_k: int | None = 50,
    terms: list[str] | None = None,
    mask=None,
    extra_cols: tuple = (),
) -> DataFrame:
    """Exact phrase query over a positional :class:`ShardedIndex`.

    Returns (doc_id, url, content_snippet, phrase_tf) for the ``top_k`` docs
    by occurrence count (ties broken by docno — deterministic). The blocks
    scan is pruned to the phrase terms (IN-list over term-sorted parquet);
    each shard resolves its own matches locally (doc-range sharding), so
    the only shuffle is the per-shard regroup of the pruned block rows.

    ``extra_cols`` appends further docs-store metadata columns (e.g.
    ``("title", "description")``) to the output — same pruned join, the
    serving layer uses it to fill the full result contract.

    ``top_k=None`` returns ALL matching docs (no limit) — used when the
    caller needs a different tie-break than docno order (e.g. the driver
    contract orders by numeric doc_id); only safe when the match set is
    known to be broadcast-small.
    """
    if not index.with_positions:
        raise ValueError("phrase_match_sharded requires a positional index "
                         "(build_and_write_sharded(..., with_positions=True))")
    if terms is None:
        terms = analyze_phrase(phrase)
    # unknown extra_cols must fail loudly on EVERY path: the non-empty
    # branch raises at its final select, so the empty branch must not
    # quietly fabricate a column for the same typo (a request would
    # otherwise succeed or 500 depending on the query text)
    docs_types = {f.name: f.dataType.simpleString()
                  for f in index.docs.schema.fields}
    missing = [c for c in extra_cols if c not in docs_types]
    if missing:
        raise ValueError(
            f"extra_cols not in the docs store: {missing} "
            f"(available: {sorted(docs_types)})"
        )
    if not terms:
        # empty-result schema must MATCH the non-empty path's: extra_cols
        # take their real types from the docs store, not a string default
        # (an all-stopword phrase must not change a union's schema)
        extra = "".join(
            f", {c} {docs_types[c]}" for c in extra_cols
        )
        return spark.createDataFrame(
            [],
            f"doc_id string, url string, content_snippet string{extra}, "
            "phrase_tf long",
        )
    kernel = _phrase_kernel_factory(
        terms, index.shard_size, kill=mask.killed if mask is not None else None
    )
    matches = (
        index.blocks.filter(F.col("term").isin(list(set(terms))))
        .groupBy("shard")
        .applyInPandas(lambda pdf: kernel(pdf), PHRASE_RESULT_SCHEMA)
    )
    # top-k BEFORE the docs join: the ranked match set is ≤ top_k rows, so
    # the metadata join is a broadcast hash join — the big docs table is
    # never shuffled (scan-only), which is what survives at 10^12 docs.
    # With top_k=None the match set is unbounded (a phrase can hit a large
    # fraction of the corpus), so the hint is withheld and AQE picks the
    # join strategy from the actual match-set size at runtime.
    topk = matches.orderBy(F.desc("phrase_tf"), F.asc("docno"))
    if top_k is not None:
        topk = topk.limit(top_k)
        topk = F.broadcast(topk)
    return (
        index.docs.join(topk, ["shard", "docno"])
        .select("doc_id", "url", "content_snippet", *extra_cols, "phrase_tf")
        .orderBy(F.desc("phrase_tf"), F.asc("docno"))
    )


def phrase_batch_sharded(
    spark: SparkSession,
    index,
    batch: list[tuple[int, str]],
    top_k: int = 50,
    mask=None,
) -> DataFrame:
    """Batched phrase queries: ONE pruned blocks scan + ONE per-shard
    kernel pass answers every phrase (the batch analog of
    plans/bm25.search_batch — at 100 TB the scan dominates, so per-phrase
    jobs waste it). Returns (query_id, rank, doc_id, url, content_snippet,
    phrase_tf) rows for phrases with ≥1 match."""
    if not index.with_positions:
        raise ValueError("phrase_batch_sharded requires a positional index")
    phrases: dict[int, list[str]] = {
        qid: analyze_phrase(text) for qid, text in batch
    }
    phrases = {qid: t for qid, t in phrases.items() if t}
    if not phrases:
        return spark.createDataFrame(
            [],
            "query_id int, rank int, doc_id string, url string, "
            "content_snippet string, phrase_tf long",
        )
    all_terms = sorted({t for terms in phrases.values() for t in terms})
    kill = mask.killed if mask is not None else None
    kernels = {
        qid: _phrase_kernel_factory(terms, index.shard_size, kill=kill)
        for qid, terms in phrases.items()
    }

    def batch_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for qid, kernel in kernels.items():
            sub = kernel(pdf)
            if len(sub):
                sub.insert(0, "query_id", np.int32(qid))
                frames.append(sub)
        if not frames:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int32"),
                    "shard": pd.Series(dtype="int32"),
                    "docno": pd.Series(dtype="int64"),
                    "phrase_tf": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    matches = (
        index.blocks.filter(F.col("term").isin(all_terms))
        .groupBy("shard")
        .applyInPandas(
            lambda pdf: batch_kernel(pdf),
            "query_id int, shard int, docno long, phrase_tf long",
        )
    )
    from pyspark.sql import Window

    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("phrase_tf"), F.asc("docno")
    )
    topk = matches.withColumn("rank", F.row_number().over(rank_w)).filter(
        F.col("rank") <= top_k
    )
    return (
        index.docs.join(F.broadcast(topk), ["shard", "docno"])
        .select(
            "query_id", "rank", "doc_id", "url", "content_snippet", "phrase_tf"
        )
        .orderBy("query_id", "rank")
    )


def positions_col(toks: Column, term: str) -> Column:
    """0-based positions of ``term`` in a token-array column — native
    transform-with-index + filter, one pass over the array."""
    tagged = F.transform(
        toks, lambda t, i: F.when(t == F.lit(term), i).otherwise(F.lit(-1))
    )
    return F.filter(tagged, lambda i: i >= 0)


def cooccur_count_col(
    toks: Column, term_a: str, term_b: str, window: int, ordered: bool = False
) -> Column:
    """Proximity co-occurrence over a token-array column: the number of
    ``term_a`` occurrences that have a ``term_b`` within ``window`` tokens
    (unordered: |posA − posB| ≤ window, posA ≠ posB; ordered: 0 < posB −
    posA ≤ window — "b follows a"). Native nested array lambdas — no UDF,
    no shuffle. The positional-index path with the same semantics is
    :func:`proximity_match_sharded`."""
    pa = positions_col(toks, term_a)
    pb = positions_col(toks, term_b)
    w = F.lit(window)
    if ordered:
        pred = lambda a: F.exists(pb, lambda b: (b > a) & (b - a <= w))
    else:
        pred = lambda a: F.exists(pb, lambda b: (F.abs(a - b) <= w) & (a != b))
    return F.size(F.filter(pa, pred)).cast("long")


def _proximity_kernel_factory(
    term_a: str, term_b: str, window: int, shard_size: int, ordered: bool = False
):
    """Per-shard kernel: positional block rows for the two terms →
    (shard, docno, cooccur) rows. Fully vectorized: positions are lifted
    into one global sorted key space (local_docno·2³² + pos, positions
    < 2³²), so the within-window test for EVERY doc at once is two
    ``np.searchsorted`` calls — windows cannot cross docs because doc keys
    differ in the high 32 bits by ≥ 2³² > window."""
    _check_shard_size(shard_size)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "shard": pd.Series(dtype="int32"),
                "docno": pd.Series(dtype="int64"),
                "cooccur": pd.Series(dtype="int64"),
            }
        )
        if len(pdf) == 0:
            return empty
        shard = int(pdf["shard"].iloc[0])
        base = np.int64(shard) * np.int64(shard_size)
        ka = _term_pos_keys(pdf, term_a, base)
        kb = _term_pos_keys(pdf, term_b, base)
        if ka.size == 0 or kb.size == 0:
            return empty
        # b-positions within the key window: a key window never reaches a
        # neighboring doc's key range (positions < 2^32 - window). Ordered
        # mode counts b in (a, a+window]; unordered in [a-window, a+window].
        lo_key = ka + 1 if ordered else ka - window
        lo = np.searchsorted(kb, lo_key, side="left")
        hi = np.searchsorted(kb, ka + window, side="right")
        n_in = hi - lo
        if term_a == term_b and not ordered:
            n_in -= 1  # a matches itself at distance 0
        ok = n_in > 0
        if not ok.any():
            return empty
        docs, counts = np.unique(ka[ok] >> np.int64(32), return_counts=True)
        return pd.DataFrame(
            {
                "shard": np.full(docs.size, shard, dtype=np.int32),
                "docno": docs + base,
                "cooccur": counts.astype(np.int64),
            }
        )

    return kernel


def proximity_match_sharded(
    spark: SparkSession,
    index,
    term_a: str,
    term_b: str,
    window: int = 5,
    top_k: int = 50,
    ordered: bool = False,
) -> DataFrame:
    """Proximity query over a positional :class:`ShardedIndex`: docs where
    ``term_a`` and ``term_b`` co-occur within ``window`` tokens (``ordered``
    restricts to b-follows-a), ranked by the number of such ``term_a``
    occurrences. Same pruned-scan / per-shard locality as
    :func:`phrase_match_sharded`."""
    if not index.with_positions:
        raise ValueError("proximity_match_sharded requires a positional index")
    kernel = _proximity_kernel_factory(
        term_a, term_b, window, index.shard_size, ordered
    )
    matches = (
        index.blocks.filter(F.col("term").isin([term_a, term_b]))
        .groupBy("shard")
        .applyInPandas(
            lambda pdf: kernel(pdf), "shard int, docno long, cooccur long"
        )
    )
    topk = matches.orderBy(F.desc("cooccur"), F.asc("docno")).limit(top_k)
    return (
        index.docs.join(F.broadcast(topk), ["shard", "docno"])
        .select("doc_id", "url", "content_snippet", "cooccur")
        .orderBy(F.desc("cooccur"), F.asc("docno"))
    )


def window_count_col(toks: Column, terms: list[str], window: int) -> Column:
    """n-term window co-occurrence over a token-array column: the number of
    ``terms[0]`` occurrences (anchors) that have EVERY other term within
    ``window`` tokens (|posA − posB| ≤ window). Duplicate terms collapse
    (an anchor is within 0 of itself). Native nested array lambdas."""
    w = F.lit(window)
    pa = positions_col(toks, terms[0])
    others = [t for t in dict.fromkeys(terms[1:]) if t != terms[0]]

    def pred(a: Column) -> Column:
        cond = F.lit(True)
        for t in others:
            pb = positions_col(toks, t)
            cond = cond & F.exists(pb, lambda b: F.abs(a - b) <= w)
        return cond

    return F.size(F.filter(pa, pred)).cast("long")


def _window_kernel_factory(terms: list[str], window: int, shard_size: int):
    """Per-shard kernel for n-term window co-occurrence: anchors are
    ``terms[0]`` occurrences; each other term contributes one pair of
    ``np.searchsorted`` bound arrays over the shared 64-bit key space
    (local_docno·2³² + pos) — n−1 vectorized membership tests, no
    per-document loop."""
    _check_shard_size(shard_size)
    others = [t for t in dict.fromkeys(terms[1:]) if t != terms[0]]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "shard": pd.Series(dtype="int32"),
                "docno": pd.Series(dtype="int64"),
                "cooccur": pd.Series(dtype="int64"),
            }
        )
        if len(pdf) == 0:
            return empty
        shard = int(pdf["shard"].iloc[0])
        base = np.int64(shard) * np.int64(shard_size)
        ka = _term_pos_keys(pdf, terms[0], base)
        if ka.size == 0:
            return empty
        ok = np.ones(ka.size, dtype=bool)
        for t in others:
            kb = _term_pos_keys(pdf, t, base)
            if kb.size == 0:
                return empty
            lo = np.searchsorted(kb, ka - window, side="left")
            hi = np.searchsorted(kb, ka + window, side="right")
            ok &= hi > lo
            if not ok.any():
                return empty
        docs, counts = np.unique(ka[ok] >> np.int64(32), return_counts=True)
        return pd.DataFrame(
            {
                "shard": np.full(docs.size, shard, dtype=np.int32),
                "docno": docs + base,
                "cooccur": counts.astype(np.int64),
            }
        )

    return kernel


def window_match_sharded(
    spark: SparkSession,
    index,
    terms: list[str],
    window: int = 10,
    top_k: int = 50,
) -> DataFrame:
    """n-term window query over a positional :class:`ShardedIndex`: docs
    where every term occurs within ``window`` tokens of a ``terms[0]``
    occurrence, ranked by the number of such anchors. Same pruned-scan /
    per-shard locality as :func:`phrase_match_sharded`."""
    if not index.with_positions:
        raise ValueError("window_match_sharded requires a positional index")
    if not terms:
        return spark.createDataFrame(
            [], "doc_id string, url string, content_snippet string, cooccur long"
        )
    kernel = _window_kernel_factory(terms, window, index.shard_size)
    matches = (
        index.blocks.filter(F.col("term").isin(list(set(terms))))
        .groupBy("shard")
        .applyInPandas(
            lambda pdf: kernel(pdf), "shard int, docno long, cooccur long"
        )
    )
    topk = matches.orderBy(F.desc("cooccur"), F.asc("docno")).limit(top_k)
    return (
        index.docs.join(F.broadcast(topk), ["shard", "docno"])
        .select("doc_id", "url", "content_snippet", "cooccur")
        .orderBy(F.desc("cooccur"), F.asc("docno"))
    )


def phrase_tf_col(toks: Column, terms: list[str]) -> Column:
    """Catalyst-native phrase occurrence count over a token-array column:
    within-row lambda, no UDF, no shuffle. ``terms`` must be the already-
    normalized token sequence (same tokenizer as the array).

    Implementation: zip the n shifted slices of the array and count
    windows equal to the phrase. The obvious alternative — filter an index
    ``sequence`` with ``element_at(toks, i+j)`` — is 7× slower when
    ``toks`` is itself an expression (e.g. the tokenizer): projection
    collapse inlines that expression into the lambda, so ``element_at``
    re-tokenizes the row once per window instead of once per slice."""
    n = len(terms)
    if n == 0:
        return F.lit(0).cast("long")
    if n == 1:
        return F.size(F.filter(toks, lambda t: t == F.lit(terms[0]))).cast("long")

    m = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, m).alias(f"w{j}") for j in range(n)])

    def is_match(s: Column) -> Column:
        cond = F.lit(True)
        for j, t in enumerate(terms):
            cond = cond & (s[f"w{j}"] == F.lit(t))
        return cond

    return F.size(F.filter(zipped, is_match)).cast("long")
