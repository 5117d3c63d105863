"""Catalog IO gate (sources/catalog.py): Iceberg branch when the runtime
jar is present, parquet degradation otherwise.

The north rule names Iceberg tables; this sandbox ships no
iceberg-spark-runtime jar and has no network to fetch one (verified: no
*iceberg* jar on the filesystem, pip install disallowed), so the Iceberg
branch is exercised ONLY when a jar is provided via
$ICEBERG_RUNTIME_JAR — otherwise the test records a documented skip, and
the parquet-degraded semantics (same write/read contract) are asserted
unconditionally.
"""

import os

import pytest
from pyspark.sql import SparkSession

from searchengine_spark.sources import catalog


def test_parquet_degradation_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    loc = str(tmp_path / "t1")
    catalog.write_table(df, loc)
    got = catalog.read_table(spark, loc).orderBy("id").collect()
    assert [(r["id"], r["v"]) for r in got] == [(1, "a"), (2, "b")]
    catalog.write_table(df, loc, mode="append")
    assert catalog.read_table(spark, loc).count() == 4


def test_iceberg_detection_is_honest(spark):
    # no runtime jar in this sandbox → gate must report False, and
    # write_table must take the parquet branch (asserted indirectly by
    # test_parquet_degradation_roundtrip writing a directory)
    jar = os.environ.get("ICEBERG_RUNTIME_JAR")
    if not jar:
        assert not catalog.iceberg_available(spark)


def test_iceberg_branch_with_runtime_jar(tmp_path):
    """Runs the REAL Iceberg branch (configure_catalog + writeTo/table)
    when $ICEBERG_RUNTIME_JAR points at an iceberg-spark-runtime jar;
    documented skip otherwise (no jar shippable in this sandbox)."""
    jar = os.environ.get("ICEBERG_RUNTIME_JAR")
    if not jar or not os.path.exists(jar):
        pytest.skip(
            "no iceberg-spark-runtime jar available: sandbox has no "
            "network and no vendored jar (set ICEBERG_RUNTIME_JAR to run "
            "the Iceberg branch; the parquet-degraded contract is covered "
            "by test_parquet_degradation_roundtrip)"
        )
    warehouse = str(tmp_path / "wh")
    builder = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-test")
        .config("spark.jars", jar)
        .config("spark.sql.shuffle.partitions", "2")
    )
    s = catalog.configure_catalog(builder, warehouse).getOrCreate()
    try:
        assert catalog.iceberg_available(s)
        df = s.createDataFrame([(1, "a")], "id long, v string")
        catalog.write_table(df, "local.db.t1")
        assert catalog.read_table(s, "local.db.t1").count() == 1
        catalog.write_table(df, "local.db.t1", mode="append")
        assert catalog.read_table(s, "local.db.t1").count() == 2
    finally:
        s.stop()
