"""Stateful streaming frontier dedup (streaming/frontier.py):
exactly-once url emission across micro-batches AND across restarts — the
streaming twin of the reference's in-RAM visited set (crawler.py:66,
210-219), with state distributed over bounded hash shards."""

import pytest

from searchengine_spark.sources import webgen
from searchengine_spark.streaming import frontier


def _write_pages(spark, path, start, n, mode="append"):
    spark.createDataFrame(webgen.generate_pandas(n, start=start)).write.mode(
        mode
    ).parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "in"), str(tmp_path / "work")


def test_first_seen_once_across_batches_and_restarts(spark, dirs):
    input_dir, work_dir = dirs
    # batch 1: docs 0..79
    _write_pages(spark, input_dir, 0, 80, mode="overwrite")
    n1 = frontier.run_frontier(spark, input_dir, work_dir)
    assert n1 == 80
    # batch 2: docs 40..119 — 40 duplicates, 40 fresh; a NEW run (fresh
    # availableNow query over the same checkpoint) must emit only the fresh
    _write_pages(spark, input_dir, 40, 80)
    n2 = frontier.run_frontier(spark, input_dir, work_dir)
    assert n2 == 40
    # batch 3: pure duplicates → nothing
    _write_pages(spark, input_dir, 0, 50)
    n3 = frontier.run_frontier(spark, input_dir, work_dir)
    assert n3 == 0
    out = spark.read.parquet(f"{work_dir}/frontier")
    assert out.count() == 120
    assert out.select("doc_id").distinct().count() == 120


def test_within_batch_duplicates_collapse(spark, dirs):
    input_dir, work_dir = dirs
    # same doc range written twice into one availableNow pass
    _write_pages(spark, input_dir, 0, 30, mode="overwrite")
    _write_pages(spark, input_dir, 0, 30)
    n = frontier.run_frontier(spark, input_dir, work_dir)
    assert n == 30


def test_state_spreads_over_shards(spark, dirs):
    input_dir, work_dir = dirs
    _write_pages(spark, input_dir, 0, 200, mode="overwrite")
    frontier.run_frontier(spark, input_dir, work_dir)
    from pyspark.sql import functions as F

    out = spark.read.parquet(f"{work_dir}/frontier").select(
        F.pmod(F.xxhash64("url"), F.lit(32)).alias("k")
    )
    n_keys = out.distinct().count()
    # 200 urls over 32 hash shards: essentially all shards carry state
    assert n_keys >= 25, n_keys
