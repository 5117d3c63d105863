"""Arrow-vectorized pandas UDFs wrapping the pure text functions.

These are the only Python↔JVM crossing points in the hot path; everything
else (explode, groupBy, join, top-k) stays JVM-side in whole-stage codegen.
No per-row Python UDFs anywhere (per ``input_hint``).

Batches arrive as pandas Series via Arrow; each UDF maps the pure functions
from :mod:`searchengine_spark.functions.textproc` over the batch. Stemming is
memoized per-process (``lru_cache`` on :func:`porter.stem`), so the cost per
batch is proportional to *unique* tokens, which on Zipf text is a small
fraction of total tokens.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from searchengine_spark.config import DEFAULT_STOPWORDS
from searchengine_spark.functions import textproc

_FIELDS_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("meta_description", StringType()),
        StructField("content", StringType()),
    ]
)


@pandas_udf(_FIELDS_SCHEMA)
def extract_fields(html: pd.Series) -> pd.DataFrame:
    """html (binary) → (title, meta_description, content).

    Replicates crawler.py:280-290: title via text_processing.py:105-112,
    meta description via :114-125, content via bs4-decompose+get_text+
    clean_text (:284-290 semantics, see textproc.extract_text_from_html).
    """
    decoded = html.map(lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else (b or ""))
    return pd.DataFrame(
        {
            "title": decoded.map(textproc.extract_title_from_html),
            "meta_description": decoded.map(textproc.extract_meta_description),
            "content": decoded.map(textproc.extract_text_from_html),
        }
    )


@pandas_udf(ArrayType(StringType()))
def tokenize_filtered(text: pd.Series) -> pd.Series:
    """tokenize (text_processing.py:40-81) + stopword/length filter
    (indexer.py:73-90) with the default 40-word stopword list."""
    return text.map(
        lambda t: textproc.tokenize_filtered(t or "", DEFAULT_STOPWORDS)
    )


@pandas_udf(ArrayType(StringType()))
def tokenize_raw(text: pd.Series) -> pd.Series:
    """tokenize only (text_processing.py:40-81), no stopword/length filter —
    used for original-query-token membership tests (indexer.py:298)."""
    return text.map(lambda t: textproc.tokenize(t or ""))


def tokens_simple_col(col):
    """SQL-expressible simple tokenizer as a *native* column expression
    (no Python): lower → split on non-alphanumeric → keep 2..20 chars,
    drop stopwords. Mirrors textproc.tokenize_simple and the DuckDB oracle
    SQL exactly; stays inside whole-stage codegen.
    """
    toks = F.split(F.lower(col), "[^a-z0-9]+")
    stop = F.array(*[F.lit(s) for s in sorted(DEFAULT_STOPWORDS)])
    return F.filter(
        toks,
        lambda t: (F.length(t) >= 2) & (F.length(t) <= 20) & ~F.array_contains(stop, t),
    )
