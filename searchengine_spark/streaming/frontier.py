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
single hot domain cannot pin one task. Two state payloads behind the SAME
operator contract (key → state row, append output):

* ``state_mode="exact"`` — per-key state holds the md5 ids of seen urls
  (exact semantics, matching the reference's in-RAM set). Right while the
  visited set fits state storage.
* ``state_mode="bloom"`` — per-key state is a fixed-size Bloom bitset
  (``bloom_bits`` per shard; k = ``bloom_hashes`` double-hashed probes off
  the url md5). State is O(bits), not O(urls) — the 10^12-url payload.
  **Error semantics are one-sided and must be understood**: a Bloom
  "seen" can be a false positive, which DROPS A NOVEL URL (a crawl misses
  a page; nothing is ever emitted twice). The expected FP rate after n
  inserts into one shard is (1 − e^{−k·n/m})^k — :func:`bloom_fp_rate` —
  and the frontier test pins a measured ceiling against it. Size
  ``bloom_bits`` ≈ 10–12 bits per expected url per shard for ~0.3–1% FP.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
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
BLOOM_STATE_SCHEMA = StructType(
    [
        StructField("bits", BinaryType()),
        StructField("n_seen", LongType()),
    ]
)

DEFAULT_BLOOM_BITS = 1 << 23  # 1 MiB/shard ≈ 10 bits/url at ~840k urls/shard
DEFAULT_BLOOM_HASHES = 7


def bloom_fp_rate(n_inserted: int, m_bits: int, k_hashes: int) -> float:
    """Expected false-positive probability after ``n_inserted`` distinct
    keys: (1 − e^{−k·n/m})^k — the standard Bloom bound."""
    return (1.0 - math.exp(-k_hashes * n_inserted / m_bits)) ** k_hashes


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


def _bloom_dedup_factory(m_bits: int, k_hashes: int):
    """Bloom-state twin of :func:`_dedup_fn` (module doc: a false positive
    drops a novel url, never emits a duplicate). The batch path is
    vectorized: probe indices derive from the md5 hex id by double hashing
    (h1 + i·h2 mod m, Kirsch-Mitzenmacher), membership is one gather over
    the bitset, and inserts are one batched ``bitwise_or.at``."""
    if m_bits <= 0 or m_bits % 8:
        # the bitset is m_bits//8 bytes while probes range over [0, m_bits):
        # a non-multiple-of-8 size would IndexError inside an executor —
        # fail loudly at the API boundary instead
        raise ValueError(f"bloom_bits must be a positive multiple of 8, got {m_bits}")
    if k_hashes <= 0:
        raise ValueError(f"bloom_hashes must be positive, got {k_hashes}")

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            (buf, n_seen) = state.get
            bits = np.frombuffer(bytes(buf), dtype=np.uint8).copy()
        else:
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            n_seen = 0
        out = []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            dids = pdf["doc_id"].to_numpy()
            # within-batch duplicates: only first occurrences proceed
            _, first_idx = np.unique(dids, return_index=True)
            cand = np.sort(first_idx)
            h1 = np.array([int(d[:16], 16) for d in dids[cand]], dtype=np.uint64)
            h2 = np.array(
                [int(d[16:32], 16) | 1 for d in dids[cand]], dtype=np.uint64
            )
            steps = np.arange(k_hashes, dtype=np.uint64)
            idx = (h1[:, None] + steps[None, :] * h2[:, None]) % np.uint64(m_bits)
            byte_ix = (idx >> np.uint64(3)).astype(np.int64)
            bit_msk = (
                np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)
            ).astype(np.uint8)
            seen = ((bits[byte_ix] & bit_msk) == bit_msk).all(axis=1)
            fresh = cand[~seen]
            if fresh.size:
                np.bitwise_or.at(
                    bits, byte_ix[~seen].ravel(), bit_msk[~seen].ravel()
                )
                n_seen += int(fresh.size)
                out.append(pdf.iloc[fresh][["url", "warc_ts", "doc_id"]])
        state.update((bits.tobytes(), n_seen))
        if out:
            yield pd.concat(out, ignore_index=True)

    return fn


def dedup_frontier(
    pages_stream: DataFrame,
    n_state_shards: int = 32,
    state_mode: str = "exact",
    bloom_bits: int = DEFAULT_BLOOM_BITS,
    bloom_hashes: int = DEFAULT_BLOOM_HASHES,
) -> DataFrame:
    """Streaming DataFrame of pages (url, warc_ts, ...) → first-seen rows
    (url, warc_ts, doc_id); exactly once across batches and restarts in
    ``exact`` mode, never-twice with a bounded novel-drop FP rate in
    ``bloom`` mode (module doc).

    doc_id = md5(url) — the reference's url hash (crawler.py:79-83); the
    state key is a hash shard of it, so visited-set memory spreads evenly
    over the cluster."""
    keyed = pages_stream.select(
        "url",
        "warc_ts",
        F.md5(F.col("url").cast("binary")).alias("doc_id"),
        F.pmod(F.xxhash64("url"), F.lit(n_state_shards)).alias("_k"),
    )
    if state_mode == "bloom":
        fn, schema = _bloom_dedup_factory(bloom_bits, bloom_hashes), BLOOM_STATE_SCHEMA
    elif state_mode == "exact":
        fn, schema = _dedup_fn, STATE_SCHEMA
    else:
        raise ValueError(f"unknown state_mode {state_mode!r}")
    return keyed.groupBy("_k").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_frontier(
    spark,
    input_dir: str,
    work_dir: str,
    schema: StructType | None = None,
    state_mode: str = "exact",
    bloom_bits: int = DEFAULT_BLOOM_BITS,
    bloom_hashes: int = DEFAULT_BLOOM_HASHES,
    n_state_shards: int = 32,
) -> int:
    """Catch-up run (availableNow): consume unseen input files, append
    first-seen urls to ``{work_dir}/frontier`` parquet. Returns rows
    emitted this run. Restart-safe via the streaming checkpoint — killing
    and re-running never re-emits a url (test_streaming_frontier). A
    checkpoint is bound to its state schema: do not switch ``state_mode``
    on an existing ``work_dir``."""
    import os

    from searchengine_spark.streaming.incremental import WEB_PAGES_SCHEMA

    sink = os.path.join(work_dir, "frontier")
    before = _count_or_zero(spark, sink)
    stream = (
        spark.readStream.schema(schema or WEB_PAGES_SCHEMA)
        .parquet(input_dir)
    )
    out = dedup_frontier(
        stream,
        n_state_shards=n_state_shards,
        state_mode=state_mode,
        bloom_bits=bloom_bits,
        bloom_hashes=bloom_hashes,
    )
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
