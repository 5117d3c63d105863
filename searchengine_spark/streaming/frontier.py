"""Streaming visited-set dedup (crawl frontier) — custom stateful operator.

The reference's crawler keeps an in-RAM ``visited_urls`` set and skips
re-seen urls (crawler.py:66,210-219 + the frontier loop). The batch engine
expresses that as a left-anti join (plans/classify.py:crawl_frontier) and
checkpointed resume (operators/checkpoint.py). This module is the
STREAMING twin: a continuous arrivals stream of pages flows through
``applyInPandasWithState``, whose keyed state is the visited set — each url
is emitted exactly once across micro-batches AND across restarts (state
lives in the streaming checkpoint).

Scale design: state is keyed by a bounded url-hash prefix (``n_state_shards``
keys), so state distributes across executors regardless of url skew — a
single hot domain cannot pin one task. Per-key state holds the md5 ids of
seen urls (exact semantics, matching the reference's set). At 10^12-url
scale the same operator shape swaps the exact set for a bloom/HLL payload in
the state row — the operator contract (key → state row, append output) is
unchanged; exactness here mirrors the reference, which is also exact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("doc_id", StringType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("seen", ArrayType(StringType())),
        StructField("n_seen", LongType()),
    ]
)


def _dedup_fn(key, pdf_iter, state: GroupState):
    """One state shard: emit rows whose doc_id (md5 of url) is unseen;
    fold the batch's new ids into state. Within-batch duplicates are also
    collapsed (first occurrence wins, arrival order)."""
    seen: set[str]
    if state.exists:
        (seen_list, _) = state.get
        seen = set(seen_list)
    else:
        seen = set()
    out = []
    for pdf in pdf_iter:
        fresh_mask = []
        for did in pdf["doc_id"]:
            if did in seen:
                fresh_mask.append(False)
            else:
                seen.add(did)
                fresh_mask.append(True)
        out.append(pdf.loc[fresh_mask, ["url", "warc_ts", "doc_id"]])
    state.update((sorted(seen), len(seen)))
    if out:
        yield pd.concat(out, ignore_index=True)


def dedup_frontier(pages_stream: DataFrame, n_state_shards: int = 32) -> DataFrame:
    """Streaming DataFrame of pages (url, warc_ts, ...) → first-seen rows
    (url, warc_ts, doc_id), exactly once across batches and restarts.

    doc_id = md5(url) — the reference's url hash (crawler.py:79-83); the
    state key is a hash shard of it, so visited-set memory spreads evenly
    over the cluster."""
    keyed = pages_stream.select(
        "url",
        "warc_ts",
        F.md5(F.col("url").cast("binary")).alias("doc_id"),
        F.pmod(F.xxhash64("url"), F.lit(n_state_shards)).alias("_k"),
    )
    return keyed.groupBy("_k").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_frontier(
    spark,
    input_dir: str,
    work_dir: str,
    schema: StructType | None = None,
) -> int:
    """Catch-up run (availableNow): consume unseen input files, append
    first-seen urls to ``{work_dir}/frontier`` parquet. Returns rows
    emitted this run. Restart-safe via the streaming checkpoint — killing
    and re-running never re-emits a url (test_streaming_frontier)."""
    import os

    from searchengine_spark.streaming.incremental import WEB_PAGES_SCHEMA

    sink = os.path.join(work_dir, "frontier")
    before = _count_or_zero(spark, sink)
    stream = (
        spark.readStream.schema(schema or WEB_PAGES_SCHEMA)
        .parquet(input_dir)
    )
    out = dedup_frontier(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(work_dir, "_frontier_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _count_or_zero(spark, sink) - before


def _count_or_zero(spark, path: str) -> int:
    try:
        return spark.read.parquet(path).count()
    except Exception:
        return 0
