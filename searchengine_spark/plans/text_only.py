"""Adapter: text-only ``documents`` table → full index tables.

The driver testdata ``documents`` table (doc_id:int64, text, lang, source,
n_chars) has no html/title/meta, so the reference's field boosts degenerate
to content-weight 1.0 (FIXTURES.md §4): tf = plain Porter-stemmed token
count, doc map title/description are empty strings, the snippet is the
first 200 chars of text (indexer.py:141).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from searchengine_spark.config import DEFAULT_STOPWORDS
from searchengine_spark.functions import textproc
from searchengine_spark.operators.index_build import (
    TOKENIZED_SCHEMA,
    IndexTables,
    build_index_tables,
)


def tokenize_text_documents(
    documents: DataFrame, stopwords: frozenset[str] = DEFAULT_STOPWORDS
) -> DataFrame:
    """(doc_id, text, ...) → the stage-1 tokenized shape (title/meta empty)."""
    stop = stopwords

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                content = text or ""
                ct = textproc.filter_tokens(textproc.tokenize(content), stop)
                tf: dict[str, float] = {}
                for tok in ct:
                    tf[tok] = tf.get(tok, 0.0) + 1.0
                rows.append(
                    (
                        str(doc_id),
                        f"doc://{doc_id}",
                        "",
                        "",
                        textproc.make_snippet(content),
                        list(tf.items()),
                        len(ct),
                        float(len(ct)),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in TOKENIZED_SCHEMA.fields])

    return documents.mapInPandas(process, TOKENIZED_SCHEMA)


def build_text_only_index(spark: SparkSession, documents: DataFrame) -> IndexTables:
    return build_index_tables(tokenize_text_documents(documents))
