"""searchengine_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference single-process search engine (adarshukla3005/SearchEngine):
HTML→text extraction, tokenization + Porter stemming, field-weighted
inverted-index construction, BM25 scoring with the reference's boost
chain, and exact top-k retrieval — built on the DataFrame API, Arrow
pandas UDFs (no per-row Python), doc-range sharding of Zipf-skewed
head terms, delta-gap+varint posting compression, block-max WAND, and
checkpoint-resumable builds with per-partition lineage.

Reference semantics citations use ``file:line`` of the read-only
snapshot at /root/reference (e.g. ``indexer.py:376-443`` is the BM25
scorer this engine is rank-identical to).
"""

__version__ = "0.1.0"
