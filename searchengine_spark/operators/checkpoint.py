"""Checkpoint-resumable index build with per-chunk lineage + metrics.

The reference's only incremental behavior is "skip URLs whose JSON file
already exists" (crawler.py:210-219, 250-254) plus the persisted visited
set (crawler.py:55-77). The Spark re-expression, per the north rule, is a
**resumable batch build**: the expensive stage-1 extract+tokenize pass runs
in deterministic *chunks*; each completed chunk appends its output under
``{path}/tokenized/chunk=<id>/`` and a lineage row (row/token/byte metrics,
wall time) to the ``{path}/checkpoints`` metadata table. A killed build
resumes by skipping chunks whose checkpoint row says ``complete`` — the
final table is byte-identical to a single-shot build (pytest kill/resume
test), because chunk membership is content-addressed (md5(url) mod
n_chunks, crawler.py:79-83's doc-id hash), not partition-dependent.

At cluster scale the same scheme maps chunks to Iceberg partition/file
groups and the checkpoint table to an Iceberg metadata table; locally both
are parquet directories. Chunk writes are idempotent (``overwrite`` of the
chunk's own subdirectory), so a chunk killed mid-write is simply redone.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.operators.index_build import tokenize_documents

CHECKPOINT_SCHEMA = (
    "chunk_id int, status string, n_docs long, n_tokens long, n_chars long, "
    "wall_s double, finished_ts double"
)


class SimulatedFailure(RuntimeError):
    """Raised by the ``fail_after`` test hook to simulate a mid-build kill."""


def _completed_chunks(spark: SparkSession, path: str) -> set[int]:
    cp = f"{path}/checkpoints"
    try:
        rows = spark.read.parquet(cp).filter(F.col("status") == "complete").collect()
    except Exception:
        return set()
    return {int(r["chunk_id"]) for r in rows}


def checkpointed_tokenize(
    spark: SparkSession,
    pages: DataFrame,
    path: str,
    n_chunks: int = 8,
    use_precomputed_text: bool = True,
    fail_after: int | None = None,
    with_positions: bool = False,
) -> DataFrame:
    """Stage-1 tokenize, resumable. Returns the completed tokenized frame.

    ``fail_after=k`` raises :class:`SimulatedFailure` after k chunk commits
    (test hook for the kill/resume property).
    """
    done = _completed_chunks(spark, path)
    chunk_col = F.pmod(
        F.conv(F.substring(F.md5(F.col("url")), 1, 15), 16, 10).cast("long"),
        F.lit(n_chunks),
    ).cast("int")
    pages = pages.withColumn("_chunk", chunk_col)

    committed_this_run = 0
    for chunk in range(n_chunks):
        if chunk in done:
            continue
        t0 = time.time()
        subset = pages.filter(F.col("_chunk") == chunk).drop("_chunk")
        out_dir = f"{path}/tokenized/chunk={chunk}"
        tokenized = tokenize_documents(
            subset,
            use_precomputed_text=use_precomputed_text,
            with_positions=with_positions,
        )
        tokenized.write.mode("overwrite").parquet(out_dir)

        # lineage metrics from the committed chunk files (columnar, cheap)
        m = (
            spark.read.parquet(out_dir)
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
                F.sum(F.length("content_snippet")).alias("n_chars"),
            )
            .collect()[0]
        )
        row = [
            (
                chunk,
                "complete",
                int(m["n_docs"] or 0),
                int(m["n_tokens"] or 0),
                int(m["n_chars"] or 0),
                round(time.time() - t0, 3),
                time.time(),
            )
        ]
        spark.createDataFrame(row, CHECKPOINT_SCHEMA).write.mode("append").parquet(
            f"{path}/checkpoints"
        )
        committed_this_run += 1
        if fail_after is not None and committed_this_run >= fail_after:
            raise SimulatedFailure(
                f"simulated kill after {committed_this_run} chunk(s)"
            )

    return read_tokenized(spark, path)


def read_tokenized(spark: SparkSession, path: str) -> DataFrame:
    """Read all completed chunks (partition-discovered) minus the chunk col."""
    return spark.read.parquet(f"{path}/tokenized").drop("chunk")


def lineage(spark: SparkSession, path: str) -> DataFrame:
    """The checkpoint/lineage metadata table."""
    return spark.read.parquet(f"{path}/checkpoints")


def is_complete(spark: SparkSession, path: str, n_chunks: int) -> bool:
    return len(_completed_chunks(spark, path)) >= n_chunks
