"""Multi-pass segment merge for the inverted index.

A *segment* is an index built over a disjoint subset of the corpus (e.g.
one checkpoint chunk, one Iceberg snapshot increment, one day of crawl).
The reference has no segments — it rebuilds the whole pickle in RAM
(indexer.py:109-167); a 10^12-doc index is necessarily built as segments
that are merged in passes (the classic Lucene/inverted-file strategy).

Two levels:

* **logical merge** (:func:`merge_index_tables`) — segment ``IndexTables``
  → one ``IndexTables``. Doc-disjointness makes postings/doc_stats/docs a
  pure union (no combine); term df re-sums per term and idf/avgdl are
  recomputed from merged totals — so a merge is NOT just a union of
  term_stats, which is what the associativity test pins down.

* **block merge** (:func:`merge_block_segments`) — segment posting-*block*
  tables (operators/shards.py layout, shared docno space) → one block
  table: union → repartition by (shard, term) → per-group decode,
  merge-sort by docno, re-encode fresh blocks. One shuffle per pass;
  ``applyInPandas`` groups are bounded by shard size, so head terms cannot
  blow up a task (same skew argument as the build).

Property-tested: merge(A,B,C) ≡ merge(merge(A,B),C) ≡ build-from-union
(SURVEY.md §5.4 merge associativity).
"""

from __future__ import annotations

import math
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.operators import codec
from searchengine_spark.operators import shards as shards_mod
from searchengine_spark.operators.index_build import IndexTables
from searchengine_spark.operators.shards import BLOCK_POS_SCHEMA, BLOCK_SCHEMA, DEFAULT_BLOCK_SIZE


def _union_all(dfs: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), dfs)


def merge_index_tables(spark: SparkSession, segments: list[IndexTables]) -> IndexTables:
    """Merge doc-disjoint logical segments into one logical index."""
    if not segments:
        raise ValueError("no segments to merge")
    postings = _union_all([s.postings for s in segments])
    docs = _union_all([s.docs for s in segments])
    doc_stats = _union_all([s.doc_stats for s in segments])

    stats = doc_stats.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    # df re-sums across segments (a term can appear in many); idf needs the
    # merged N, so it is recomputed, not unioned.
    term_stats = (
        _union_all([s.term_stats.select("term", "df") for s in segments])
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            "df",
            F.greatest(
                F.lit(0.0),
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            ).alias("idf"),
        )
    )
    return IndexTables(
        docs=docs,
        postings=postings,
        doc_stats=doc_stats,
        term_stats=term_stats,
        stats=stats,
    )


def merge_block_segments(
    segments: list[DataFrame],
    avgdl: float,
    block_size: int = DEFAULT_BLOCK_SIZE,
    num_partitions: int | None = None,
) -> DataFrame:
    """Merge posting-block tables (shared docno space, doc-disjoint
    segments) into one re-blocked table. One shuffle by (shard, term)."""
    u = _union_all(segments)
    if num_partitions:
        u = u.repartition(num_partitions, "shard", "term")
    with_positions = "pcounts" in u.columns

    def regroup(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        # "\x00"-prefixed pseudo-terms (the field-signature sidecar,
        # functions/fieldsig.py) pass through VERBATIM as already-encoded
        # block rows: their streams are not (tf, doc_len) postings, segments
        # are doc-disjoint so per-segment rows stay valid side by side, and
        # readers concatenate by docno. Only block_no is renumbered (docno
        # order) for a deterministic layout.
        out_cols = (
            shards_mod._BLOCK_POS_COLS if with_positions else shards_mod._BLOCK_COLS
        )
        pseudo = pdf["term"].str.startswith("\x00")
        passthrough = pdf[pseudo]
        if len(passthrough):
            passthrough = passthrough.sort_values(
                ["shard", "term", "min_docno"], kind="stable"
            ).copy()
            passthrough["block_no"] = passthrough.groupby(
                ["shard", "term"], sort=False
            ).cumcount()
            passthrough = passthrough[out_cols]
            pdf = pdf[~pseudo]
        else:
            passthrough = None
        for (shard, term), g in pdf.groupby(["shard", "term"], sort=False):
            parts = [codec.decode_postings(r.gaps, r.tfs, r.dls) for r in g.itertuples()]
            # carry the boost-bound flag stream through the re-encode; a
            # source block without one (pre-flag segment) contributes the
            # UNKNOWN sentinel per posting, never fabricated zeros
            flags = [
                codec.varint_decode(r.fls).astype(np.int64)
                if len(getattr(r, "fls", b"")) > 0
                else np.full(p[0].size, shards_mod.FLAG_UNKNOWN, dtype=np.int64)
                for r, p in zip(g.itertuples(), parts)
            ]
            cols = {
                "shard": int(shard),
                "term": term,
                "docno": np.concatenate([p[0].astype(np.int64) for p in parts]),
                "tf": np.concatenate([p[1] for p in parts]),
                "doc_len": np.concatenate([p[2] for p in parts]),
                "flags": np.concatenate(flags),
            }
            if with_positions:
                plists: list[np.ndarray] = []
                for r in g.itertuples():
                    counts, flat_pos = codec.decode_positions(r.pcounts, r.pgaps)
                    plists.extend(
                        np.split(flat_pos.astype(np.int64), np.cumsum(counts)[:-1])
                    )
                cols["positions"] = plists
            frames.append(pd.DataFrame(cols))
        if not frames:
            encoded = pd.DataFrame(columns=out_cols)
        else:
            flat = pd.concat(frames, ignore_index=True)
            encoded = shards_mod.encode_blocks_pdf(
                flat, avgdl, block_size, with_positions
            )
        if passthrough is not None:
            encoded = pd.concat(
                [encoded[out_cols] if len(encoded) else encoded, passthrough],
                ignore_index=True,
            )
        return encoded

    # same coarse grouping as the build: (shard, term-bucket), per-term
    # split inside the kernel (see operators/shards.py)
    return (
        u.withColumn(
            "_tb", F.pmod(F.xxhash64("term"), F.lit(shards_mod.TERM_BUCKETS))
        )
        .groupBy("shard", "_tb")
        .applyInPandas(
            lambda pdf: regroup(pdf.drop(columns=["_tb"])),
            BLOCK_POS_SCHEMA if with_positions else BLOCK_SCHEMA,
        )
    )


def multi_pass_merge(
    segments: list[DataFrame],
    avgdl: float,
    block_size: int = DEFAULT_BLOCK_SIZE,
    fan_in: int = 2,
) -> DataFrame:
    """Merge many segments in passes of ``fan_in`` (bounds per-pass shuffle
    width; at 10^12 docs segment counts reach thousands and a single
    all-way union would shuffle everything at once)."""
    runs = list(segments)
    while len(runs) > 1:
        runs = [
            merge_block_segments(runs[i : i + fan_in], avgdl, block_size)
            if len(runs[i : i + fan_in]) > 1
            else runs[i]
            for i in range(0, len(runs), fan_in)
        ]
    return runs[0]
