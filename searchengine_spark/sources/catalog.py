"""Gated table IO: Iceberg tables when the runtime is on the classpath,
plain parquet directories otherwise.

The reference persists its index as pickled dicts + JSON files
(indexer.py:238-256); the Spark-native analog per SURVEY.md §1.1 is a set
of catalog tables. At cluster scale those are Iceberg tables (snapshot
isolation for the incremental/append path in streaming/incremental.py,
partition pruning metadata, schema evolution); this sandbox ships no
Iceberg runtime jar, so every call degrades to parquet directories with
identical semantics for everything this engine does (overwrite/append +
scan). Callers never branch: they use :func:`write_table` /
:func:`read_table` with a location string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is loadable in this JVM."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(_ICEBERG_CLASS)
        return True
    except Exception:
        return False


def configure_catalog(builder, warehouse: str, name: str = "local"):
    """Attach a hadoop-type Iceberg catalog to a SparkSession builder.

    Only meaningful when the runtime jar is present; harmless otherwise
    (the configs are inert without the classes)."""
    return (
        builder.config(f"spark.sql.catalog.{name}", _ICEBERG_CLASS)
        .config(f"spark.sql.catalog.{name}.type", "hadoop")
        .config(f"spark.sql.catalog.{name}.warehouse", warehouse)
    )


def _is_table_ref(location: str) -> bool:
    """Catalog table refs look like ``catalog.db.table`` (no path chars)."""
    return "/" not in location and "." in location


def write_table(df: DataFrame, location: str, mode: str = "overwrite", **options) -> None:
    """Persist ``df`` at ``location``: an Iceberg table ref (when available)
    or a parquet directory path."""
    spark = df.sparkSession
    if _is_table_ref(location) and iceberg_available(spark):
        writer = df.writeTo(location)
        for k, v in options.items():
            writer = writer.option(k, v)
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    w = df.write.mode(mode)
    for k, v in options.items():
        w = w.option(k, v)
    w.parquet(location)


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """Load the table written by :func:`write_table`."""
    if _is_table_ref(location) and iceberg_available(spark):
        return spark.table(location)
    return spark.read.parquet(location)
