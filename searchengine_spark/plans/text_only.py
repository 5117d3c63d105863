"""Adapter: text-only ``documents`` table → full index tables.

The driver testdata ``documents`` table (doc_id:int64, text, lang, source,
n_chars) has no html/title/meta, so the reference's field boosts degenerate
to content-weight 1.0 (FIXTURES.md §4): tf = plain Porter-stemmed token
count, doc map title/description are empty strings, the snippet is the
first 200 chars of text (indexer.py:141).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from searchengine_spark.config import DEFAULT_STOPWORDS
from searchengine_spark.functions import fieldsig, textproc
from searchengine_spark.operators.index_build import (
    TOKENIZED_POS_SCHEMA,
    TOKENIZED_SCHEMA,
    IndexTables,
    _pos_terms_col,
    _tf_and_positions,
    _tf_only,
    build_index_tables,
)


def _tokenize_with(
    documents: DataFrame,
    tokenizer: Callable[[str], list[str]],
    with_positions: bool,
) -> DataFrame:
    """Shared stage-1 body for the text-only adapters: one row shape, one
    positions branch — only the tokenizer differs between the stemmed and
    the SQL-expressible variants."""
    schema = TOKENIZED_POS_SCHEMA if with_positions else TOKENIZED_SCHEMA

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            snippets = [textproc.make_snippet(t or "") for t in pdf["text"]]
            empties = [""] * len(snippets)
            sigs = fieldsig.sig_words_batch(empties, empties, snippets).astype("int64")
            rows = []
            for i, (doc_id, text) in enumerate(zip(pdf["doc_id"], pdf["text"])):
                content = text or ""
                ct = tokenizer(content)
                if with_positions:
                    tf, pos, n = _tf_and_positions([(ct, 1.0)])
                    terms_col = _pos_terms_col(tf, pos)
                else:
                    tf, n = _tf_only([(ct, 1.0)])
                    terms_col = list(tf.items())
                rows.append(
                    (
                        str(doc_id),
                        f"doc://{doc_id}",
                        "",
                        "",
                        snippets[i],
                        terms_col,
                        n,
                        float(n),
                        sigs[i].tolist(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return documents.mapInPandas(process, schema)


def tokenize_text_documents(
    documents: DataFrame,
    stopwords: frozenset[str] = DEFAULT_STOPWORDS,
    with_positions: bool = False,
) -> DataFrame:
    """(doc_id, text, ...) → the stage-1 tokenized shape (title/meta empty).

    ``with_positions=True`` widens ``tf_terms`` entries to
    (term, tf, positions) — positions index the filtered content token
    stream — for the positional index layout (operators/shards.py)."""
    stop = stopwords
    return _tokenize_with(
        documents, lambda text: textproc.tokenize_filtered(text, stop), with_positions
    )


def tokenize_text_documents_simple(
    documents: DataFrame, with_positions: bool = False
) -> DataFrame:
    """Like :func:`tokenize_text_documents` but with the SQL-expressible
    simple tokenizer (textproc.tokenize_simple — no stemming), so results
    over the produced index are DuckDB-checkable (plans/entry_queries.py)."""
    return _tokenize_with(documents, textproc.tokenize_simple, with_positions)


def build_text_only_index(spark: SparkSession, documents: DataFrame) -> IndexTables:
    return build_index_tables(tokenize_text_documents(documents))
