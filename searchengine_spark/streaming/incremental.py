"""Incremental index maintenance via Structured Streaming.

The reference's only incremental behavior is crawl resumability — "skip
pages already on disk" (crawler.py:210-219) — i.e. *new pages extend the
corpus; old pages are never reprocessed*. The Spark-native expression of
that contract is a Structured Streaming job over the input table's arrivals:

    new web_pages files → foreachBatch → build a doc-disjoint index
    *segment* per micro-batch → segments merge into the serving index
    (operators/merge.py)

``availableNow`` triggers make the same job run as a catch-up batch
(process everything new, then stop) — which is how a periodic 10^12-doc
ingest actually operates; the streaming checkpoint gives exactly-once
segment production across restarts (complementing the chunk-level
checkpointing of full rebuilds in operators/checkpoint.py).

Segments written here are the same shape as any other segment, so the
multi-pass merge and its associativity guarantees apply unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from searchengine_spark.operators import index_build, merge

WEB_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    max_files_per_trigger: int | None = None,
) -> list[str]:
    """Process all unseen input files into index segments; returns the list
    of all segment paths (previous + new). Restart-safe: the streaming
    checkpoint under ``{work_dir}/_checkpoint`` remembers consumed files."""
    reader = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("latestFirst", "false")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)

    seg_root = os.path.join(work_dir, "segments")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        seg = os.path.join(seg_root, f"batch={batch_id}")
        tokenized = index_build.tokenize_documents(batch_df)
        tokenized.write.mode("overwrite").parquet(f"{seg}/tokenized")
        spark_l = batch_df.sparkSession
        tok = spark_l.read.parquet(f"{seg}/tokenized")
        if tok.limit(1).count() == 0:
            return
        tables = index_build.build_index_tables(tok)
        index_build.write_index(tables, seg, postings_partitions=8)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(work_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return segment_paths(work_dir)


def segment_paths(work_dir: str) -> list[str]:
    seg_root = os.path.join(work_dir, "segments")
    if not os.path.isdir(seg_root):
        return []
    out = []
    for d in sorted(os.listdir(seg_root)):
        if os.path.exists(os.path.join(seg_root, d, "stats")):
            out.append(os.path.join(seg_root, d))
    return out


def merged_index(spark: SparkSession, work_dir: str):
    """Serving view: all segments merged into one logical IndexTables."""
    paths = segment_paths(work_dir)
    if not paths:
        raise FileNotFoundError(f"no completed segments under {work_dir}")
    segments = [index_build.read_index(spark, p) for p in paths]
    return merge.merge_index_tables(spark, segments)
