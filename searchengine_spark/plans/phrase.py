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


def analyze_phrase(phrase: str, stopwords: frozenset[str] = DEFAULT_STOPWORDS) -> list[str]:
    """Phrase text → ordered term list via the full reference tokenizer
    (tokenize + length/stopword filter, text_processing.py:40-81 +
    indexer.py:73-90). Order and duplicates are preserved — a phrase is a
    sequence, not a term set."""
    return textproc.filter_tokens(textproc.tokenize(phrase), stopwords)


def _phrase_kernel_factory(terms: list[str], shard_size: int):
    """Per-shard kernel: positional block rows (already filtered to the
    phrase terms) → (shard, docno, phrase_tf) rows."""
    n_terms = len(terms)

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
            sub = pdf[pdf["term"] == t]
            if len(sub) == 0:
                return empty
            term_keys = []
            for row in sub.itertuples(index=False):
                d, _tf, _dl = codec.decode_postings(row.gaps, row.tfs, row.dls)
                counts, pos = codec.decode_positions(row.pcounts, row.pgaps)
                docrep = np.repeat(d.astype(np.int64) - base, counts)
                p = pos.astype(np.int64) - i
                ok = p >= 0
                term_keys.append((docrep[ok] << np.int64(32)) | p[ok])
            tk = np.concatenate(term_keys) if term_keys else np.empty(0, dtype=np.int64)
            if keys is None:
                keys = np.sort(tk)
            else:
                keys = np.intersect1d(keys, tk, assume_unique=True)
            if keys.size == 0:
                return empty
        assert keys is not None
        local_docs, tf = np.unique(keys >> np.int64(32), return_counts=True)
        return pd.DataFrame(
            {
                "shard": np.full(local_docs.size, shard, dtype=np.int32),
                "docno": local_docs + base,
                "phrase_tf": tf.astype(np.int64),
            }
        )

    return kernel


def phrase_match_sharded(
    spark: SparkSession,
    index,
    phrase: str,
    top_k: int = 50,
    terms: list[str] | None = None,
) -> DataFrame:
    """Exact phrase query over a positional :class:`ShardedIndex`.

    Returns (doc_id, url, content_snippet, phrase_tf) for the ``top_k`` docs
    by occurrence count (ties broken by docno — deterministic). The blocks
    scan is pruned to the phrase terms (IN-list over term-sorted parquet);
    each shard resolves its own matches locally (doc-range sharding), so
    the only shuffle is the per-shard regroup of the pruned block rows.
    """
    if not index.with_positions:
        raise ValueError("phrase_match_sharded requires a positional index "
                         "(build_and_write_sharded(..., with_positions=True))")
    if terms is None:
        terms = analyze_phrase(phrase)
    if not terms:
        return spark.createDataFrame(
            [], "doc_id string, url string, content_snippet string, phrase_tf long"
        )
    kernel = _phrase_kernel_factory(terms, index.shard_size)
    matches = (
        index.blocks.filter(F.col("term").isin(list(set(terms))))
        .groupBy("shard")
        .applyInPandas(lambda pdf: kernel(pdf), PHRASE_RESULT_SCHEMA)
    )
    return (
        matches.join(index.docs, ["shard", "docno"])
        .select("doc_id", "url", "content_snippet", "phrase_tf")
        .orderBy(F.desc("phrase_tf"), F.asc("docno"))
        .limit(top_k)
    )


def phrase_tf_col(toks: Column, terms: list[str]) -> Column:
    """Catalyst-native phrase occurrence count over a token-array column:
    within-row lambda, no UDF, no shuffle. ``terms`` must be the already-
    normalized token sequence (same tokenizer as the array)."""
    n = len(terms)
    if n == 0:
        return F.lit(0).cast("long")
    if n == 1:
        return F.size(F.filter(toks, lambda t: t == F.lit(terms[0]))).cast("long")

    def is_match(i: Column) -> Column:
        cond = F.lit(True)
        for j, t in enumerate(terms):
            cond = cond & (F.element_at(toks, i + F.lit(j + 1)) == F.lit(t))
        return cond

    starts = F.when(
        F.size(toks) >= n,
        F.filter(F.sequence(F.lit(0), F.size(toks) - F.lit(n)), is_match),
    ).otherwise(F.array().cast("array<int>"))
    return F.size(starts).cast("long")
