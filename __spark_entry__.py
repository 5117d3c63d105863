"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full Porter-stemmed BM25 engine over the
sf0.001 ``documents`` table, answering a fixed query batch.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator slice
(SURVEY.md §2), checked by the driver against DuckDB at sf=0.01. The SQL
mirrors use the simple (SQL-expressible) tokenizer; the full stemmed path is
rows-only checked here and rank-identity checked in tests/ against the
reference-semantics oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from searchengine_spark.plans.bm25 import BM25SearchEngine
    from searchengine_spark.plans.text_only import build_text_only_index

    documents = spark.read.parquet(f"{SF0001}/documents.parquet")
    tables = build_text_only_index(spark, documents)
    engine = BM25SearchEngine(spark, tables)
    # 'dup' is the only discriminative term in the testdata vocabulary (all
    # others occur in >half the docs → reference IDF clamps to 0, see
    # plans/entry_queries.py); include it so the flagship returns hits.
    batch = [
        (0, "dup fast join"),
        (1, "dup spark window query"),
        (2, "slow dup merge sort"),
    ]
    res = engine.search_batch(batch, top_k=10)
    return res.select(
        "query_id", "rank", "doc_id", "url", "content_snippet",
        F.round("score", 6).alias("score"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from searchengine_spark.plans.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from searchengine_spark.plans.entry_queries import (
        ORACLE_SQL,
        STEMMED_ORACLE_SF_DIR,
        materialize_hybrid_oracle_embeddings,
        materialize_stemmed_oracle_table,
    )

    out = dict(ORACLE_SQL)
    # The stemmed-path oracle reads a parquet of Porter-stemmed token arrays
    # produced driver-side with the engine's own pure functions; build it
    # now so the SQL is runnable regardless of query/oracle execution order.
    # Degrading to rows-only is ONLY legitimate when the sf0.01 testdata
    # itself is absent (e.g. a bare checkout without /root/testdata); a
    # failure with the testdata present is a code bug in the materializer
    # and must surface, not silently remove the hash gate.
    testdata_present = os.path.exists(
        os.path.join(STEMMED_ORACLE_SF_DIR, "documents.parquet")
    )
    try:
        materialize_stemmed_oracle_table(STEMMED_ORACLE_SF_DIR)
    except Exception:
        if testdata_present:
            raise
        out.pop("bm25_stemmed_topk", None)
        out.pop("wand_stemmed_topk", None)
        out.pop("wand_subsplit_topk", None)
        out.pop("wand_masked_topk", None)
        out.pop("wand_compacted_topk", None)
        out.pop("bm25_merged_topk", None)
        out.pop("bm25_serving", None)
        out.pop("hybrid_topk", None)
    # Same mechanism for the hybrid combine twin's embedding vectors
    # (engine's own pure encoder, driver-side; see plans/entry_queries.py).
    try:
        materialize_hybrid_oracle_embeddings(STEMMED_ORACLE_SF_DIR)
    except Exception:
        if testdata_present:
            raise
        out.pop("hybrid_topk", None)
    return out
