"""Distributed inverted-index build (the Spark re-expression of
``indexer.py:109-167`` + ``_process_document`` ``indexer.py:58-107``).

Dataflow (all JVM-side except the two Arrow UDF crossings)::

    web_pages (url, warc_ts, html, text, lang)
      → extract_fields UDF (title, meta_description, content)   [Arrow]
      → tokenize_filtered UDF per field                         [Arrow]
      → explode(field tokens ⊗ field weight)                    [codegen]
      → groupBy(doc_id, term).sum(weight)        = tf            [hash agg,
                                                      map-side partial]
      → groupBy(doc_id).sum(tf)                  = doc_stats
      → groupBy(term).count / idf                = term_stats
      → postings = tf ⋈ doc_len (denormalized)   — doc_len is stored in the
        posting row so query-time scoring needs NO doc_stats join
      → avg(doc_len), count                      = stats

Scale notes (100 TB / 10^12 docs):
  * The (doc_id, term) aggregation is key-uniform (doc_id is md5 — no skew);
    partial aggregation keeps the shuffle at ~unique pairs per partition.
  * The per-term grouping (posting blocks, see operators/codec.py) is
    Zipf-skewed; it is salted by the leading hex nibble(s) of doc_id, which
    splits every head term into uniform *lexicographic ranges* so block
    order is preserved without a per-term global sort.
  * postings are written repartitioned+sorted by term, so parquet row-group
    min/max stats give term-range skipping at query time — the distributed
    analog of the reference's dict lookup (indexer.py:384-394).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.config import (
    CONTENT_WEIGHT,
    META_BOOST,
    TITLE_BOOST,
)
from searchengine_spark.functions.udfs import extract_fields, tokenize_filtered


@dataclass
class IndexTables:
    """Logical index: the Spark analogs of the reference's pickled dicts
    (SURVEY.md §1.1)."""

    docs: DataFrame  # doc_id, url, title, description, content_snippet
    postings: DataFrame  # term, doc_id, tf, dl
    doc_stats: DataFrame  # doc_id, doc_len
    term_stats: DataFrame  # term, df, idf
    stats: DataFrame  # n_docs, avgdl


def extract_documents(pages: DataFrame, use_precomputed_text: bool = True) -> DataFrame:
    """web_pages → (doc_id, url, title, meta_description, content).

    ``content`` is the reference-extracted text (crawler.py:284-290). When
    the input table carries the precomputed ``text`` column (input_hint) we
    use it and only extract title/meta from html; the byte-identity of the
    UDF extraction vs ``text`` is pytest-asserted separately.
    """
    out = pages.withColumn("doc_id", F.md5(F.col("url"))).withColumn(
        "_f", extract_fields(F.col("html"))
    )
    content = F.col("text") if use_precomputed_text else F.col("_f.content")
    return out.select(
        "doc_id",
        "url",
        F.col("_f.title").alias("title"),
        F.col("_f.meta_description").alias("meta_description"),
        content.alias("content"),
    )


def term_frequencies(documents: DataFrame) -> DataFrame:
    """Field-weighted tf (indexer.py:92-107): one exploded row per token
    occurrence carrying its field weight, summed per (doc_id, term)."""
    weighted = documents.select(
        "doc_id",
        F.explode(
            F.concat(
                F.transform(
                    tokenize_filtered(F.col("title")),
                    lambda t: F.struct(
                        t.alias("term"), F.lit(TITLE_BOOST).alias("weight")
                    ),
                ),
                F.transform(
                    tokenize_filtered(F.col("meta_description")),
                    lambda t: F.struct(
                        t.alias("term"), F.lit(META_BOOST).alias("weight")
                    ),
                ),
                F.transform(
                    tokenize_filtered(F.col("content")),
                    lambda t: F.struct(
                        t.alias("term"), F.lit(CONTENT_WEIGHT).alias("weight")
                    ),
                ),
            )
        ).alias("tw"),
    )
    return weighted.groupBy("doc_id", F.col("tw.term").alias("term")).agg(
        F.sum("tw.weight").alias("tf")
    )


def build_index(documents: DataFrame) -> IndexTables:
    """Full logical index build. ``documents`` from :func:`extract_documents`."""
    tf = term_frequencies(documents)

    doc_stats = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))

    stats = doc_stats.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )

    # IDF (indexer.py:386-388): max(0, ln((N - n + 0.5) / (n + 0.5)))
    term_stats = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            "df",
            F.greatest(
                F.lit(0.0),
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            ).alias("idf"),
        )
    )

    # Denormalize doc_len into the posting row: query-time BM25 then needs
    # only the postings scan + one small broadcast of query terms.
    postings = tf.join(doc_stats, "doc_id").select("term", "doc_id", "tf", "doc_len")

    docs = documents.select(
        "doc_id",
        "url",
        "title",
        F.col("meta_description").alias("description"),
        # indexer.py:141 snippet: first 200 chars + "..." when content non-empty
        F.when(
            F.length("content") > 0, F.concat(F.substring("content", 1, 200), F.lit("..."))
        )
        .otherwise(F.lit(""))
        .alias("content_snippet"),
    )

    return IndexTables(
        docs=docs, postings=postings, doc_stats=doc_stats, term_stats=term_stats, stats=stats
    )


def write_index(tables: IndexTables, path: str, postings_partitions: int = 32) -> None:
    """Persist the index. Postings are repartitioned by term and sorted
    within partitions so parquet row-group min/max stats prune term lookups
    (the distributed analog of the reference's hash-dict lookup)."""
    tables.docs.write.mode("overwrite").parquet(f"{path}/docs")
    (
        tables.postings.repartition(postings_partitions, "term")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    tables.doc_stats.write.mode("overwrite").parquet(f"{path}/doc_stats")
    tables.term_stats.repartition(postings_partitions, "term").sortWithinPartitions(
        "term"
    ).write.mode("overwrite").parquet(f"{path}/term_stats")
    tables.stats.write.mode("overwrite").parquet(f"{path}/stats")


def read_index(spark: SparkSession, path: str) -> IndexTables:
    return IndexTables(
        docs=spark.read.parquet(f"{path}/docs"),
        postings=spark.read.parquet(f"{path}/postings"),
        doc_stats=spark.read.parquet(f"{path}/doc_stats"),
        term_stats=spark.read.parquet(f"{path}/term_stats"),
        stats=spark.read.parquet(f"{path}/stats"),
    )
