"""SparkSession builder tuned for this engine.

Local sessions default to ``local[*]`` with AQE on; at cluster scale the
same config block applies (submit via ``spark-submit --py-files``; see
cli.py). Iceberg catalog support is gated: if the Iceberg runtime jar is on
the classpath we register a hadoop catalog, otherwise table IO falls back to
plain parquet directories (see sources/catalog.py) — semantics are
identical, only the table format differs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from searchengine_spark.config import DEFAULT_SHUFFLE_PARTITIONS


def get_spark(
    app_name: str = "searchengine-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size balances python-worker memory vs per-batch overhead
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Input-split granularity: default 128MB gives a GB-scale corpus
        # too few map tasks to saturate 32 cores (and the mapInPandas
        # tokenize stage inherits file-split parallelism). 32MB keeps
        # every core busy at local scale; at cluster scale the same knob
        # is sized so splits ≈ 2-4× total cores.
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
