"""Structured-Streaming incremental indexing (streaming/incremental.py):
two availableNow catch-up runs over a growing input directory produce a
merged index identical to a single batch build, and the second run
reprocesses nothing (exactly-once via the stream checkpoint)."""

import math
import os

import pytest

from searchengine_spark.operators import index_build
from searchengine_spark.plans.bm25 import BM25SearchEngine
from searchengine_spark.sources import webgen
from searchengine_spark.streaming import incremental

N_DOCS = 200


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = webgen.generate_pandas(N_DOCS)
    return spark.createDataFrame(pdf)


def test_incremental_equals_batch(spark, corpus, tmp_path_factory):
    input_dir = str(tmp_path_factory.mktemp("stream_in"))
    work = str(tmp_path_factory.mktemp("stream_work"))

    from pyspark.sql import functions as F

    first = corpus.filter(F.col("url").contains("post-") & (F.crc32("url") % 2 == 0))
    second = corpus.subtract(first)

    # arrival 1
    first.coalesce(2).write.mode("append").parquet(input_dir)
    segs1 = incremental.run_incremental(spark, input_dir, work)
    assert len(segs1) >= 1
    n1 = incremental.merged_index(spark, work).stats.collect()[0]["n_docs"]
    assert n1 == first.count()

    # arrival 2: new files in the same dir; only they get processed
    second.coalesce(2).write.mode("append").parquet(input_dir)
    segs2 = incremental.run_incremental(spark, input_dir, work)
    assert len(segs2) > len(segs1)

    merged = incremental.merged_index(spark, work)
    batch = index_build.build_index(corpus)

    s_m = merged.stats.collect()[0]
    s_b = batch.stats.collect()[0]
    assert s_m["n_docs"] == N_DOCS == s_b["n_docs"]
    assert math.isclose(s_m["avgdl"], s_b["avgdl"], rel_tol=1e-12)

    got = {(r["term"], r["doc_id"]): r["tf"] for r in merged.postings.collect()}
    want = {(r["term"], r["doc_id"]): r["tf"] for r in batch.postings.collect()}
    assert got == want

    # queries over the merged incremental index match the batch index
    queries = webgen.reference_queries()[:5]
    res_m = BM25SearchEngine(spark, merged).search_batch(queries, top_k=5)
    res_b = BM25SearchEngine(spark, batch).search_batch(queries, top_k=5)
    key = lambda df: [  # noqa: E731
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert key(res_m) == key(res_b)


def test_rerun_without_new_data_is_noop(spark, corpus, tmp_path_factory):
    input_dir = str(tmp_path_factory.mktemp("stream_in2"))
    work = str(tmp_path_factory.mktemp("stream_work2"))
    corpus.limit(50).coalesce(1).write.mode("append").parquet(input_dir)
    segs1 = incremental.run_incremental(spark, input_dir, work)
    segs2 = incremental.run_incremental(spark, input_dir, work)
    assert segs1 == segs2
    # exactly-once: total docs across segments == input docs, no dupes
    n = incremental.merged_index(spark, work).stats.collect()[0]["n_docs"]
    assert n == 50
