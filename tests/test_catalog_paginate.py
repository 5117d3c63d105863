"""Gated catalog IO (S3/S6/S7 analog) and Q11 pagination."""

from searchengine_spark.plans.bm25 import paginate
from searchengine_spark.sources import catalog


def test_catalog_parquet_roundtrip(spark, tmp_path):
    df = spark.range(100).withColumnRenamed("id", "x")
    loc = str(tmp_path / "t1")
    catalog.write_table(df, loc)
    got = catalog.read_table(spark, loc)
    assert got.count() == 100
    catalog.write_table(df, loc, mode="append")
    assert catalog.read_table(spark, loc).count() == 200


def test_iceberg_gate_reports_availability(spark):
    # this sandbox ships no Iceberg runtime; the gate must say so (and a
    # path location must fall back to parquet regardless)
    assert catalog.iceberg_available(spark) in (True, False)
    assert not catalog._is_table_ref("/tmp/some/dir")
    assert catalog._is_table_ref("local.db.tbl")


def test_paginate_semantics():
    rows = list(range(23))
    p1 = paginate(rows, page=1, per_page=10)
    assert p1["results"] == list(range(10))
    assert p1["total_pages"] == 3 and p1["total_results"] == 23
    p3 = paginate(rows, page=3, per_page=10)
    assert p3["results"] == [20, 21, 22]
    clamped = paginate(rows, page=99, per_page=10)
    assert clamped["page"] == 3 and clamped["results"] == [20, 21, 22]
    empty = paginate([], page=1, per_page=10)
    assert empty["results"] == [] and empty["total_pages"] == 1
