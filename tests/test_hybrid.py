"""Hybrid BM25+embedding path (plans/hybrid.py) vs a straight-line Python
oracle of optimized_indexer.py:119-203 / bert_embeddings.py:188-226
semantics, using the same deterministic stand-in encoder on both sides."""

import math

import numpy as np
import pytest

from searchengine_spark.operators import index_build
from searchengine_spark.plans.bm25 import BM25SearchEngine
from searchengine_spark.plans.hybrid import (
    BM25_WEIGHT,
    EMB_WEIGHT,
    HybridSearchEngine,
    _hash_embed,
    build_doc_embeddings,
)
from searchengine_spark.sources import webgen

N_DOCS = 200
QUERIES = [(i, q) for i, (_, q) in enumerate(webgen.reference_queries()[:6])]


@pytest.fixture(scope="module")
def spark_index(spark):
    pages = spark.createDataFrame(webgen.generate_pandas(N_DOCS))
    tables = index_build.build_index(pages)
    for name in ("docs", "postings", "doc_stats", "term_stats", "stats"):
        setattr(tables, name, getattr(tables, name).cache())
    return tables


@pytest.fixture(scope="module")
def engine(spark, spark_index):
    eng = HybridSearchEngine(spark, spark_index)
    eng.embeddings = eng.embeddings.cache()
    return eng


def test_embeddings_normalized(engine):
    rows = engine.embeddings.collect()
    assert len(rows) == N_DOCS
    for r in rows[:20]:
        v = np.array(r["embedding"])
        assert v.shape == (384,)
        assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-5)


def test_embedding_build_matches_standalone(spark, spark_index, engine):
    docs = {r["doc_id"]: r for r in spark_index.docs.collect()}
    got = {r["doc_id"]: np.array(r["embedding"]) for r in engine.embeddings.collect()}
    for doc_id, row in list(docs.items())[:25]:
        text = (
            f"{row['title']} {row['title']} {row['description']} "
            f"{row['content_snippet']}"
        )
        want = _hash_embed(text)
        assert np.allclose(got[doc_id], want, atol=1e-6), doc_id


def _oracle_hybrid(spark, spark_index, queries, top_k):
    """Python reimplementation of the combine (optimized_indexer.py:119-169):
    BM25 2k candidates (from the pinned exhaustive engine), sims over ALL
    docs → top-k, intersection-weighted, sort desc, slice k."""
    docs = spark_index.docs.collect()
    embs = {
        r["doc_id"]: _hash_embed(
            f"{r['title']} {r['title']} {r['description']} {r['content_snippet']}"
        )
        for r in docs
    }
    bm25 = BM25SearchEngine(spark, spark_index).search_batch(
        queries, top_k=2 * top_k, with_metadata=False
    )
    bm25_by_q = {}
    for r in bm25.collect():
        bm25_by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    out = {}
    for qid, qtext in queries:
        qv = _hash_embed(qtext)
        sims = {
            d: 1.0 / (1.0 + (2.0 - 2.0 * float(np.dot(v, qv)))) for d, v in embs.items()
        }
        emb_topk = dict(
            sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        )
        combined = [
            (d, BM25_WEIGHT * s + EMB_WEIGHT * emb_topk[d])
            for d, s in bm25_by_q.get(qid, {}).items()
            if d in emb_topk
        ]
        combined.sort(key=lambda kv: (-kv[1], kv[0]))
        out[qid] = combined[:top_k]
    return out


def test_hybrid_matches_oracle(spark, spark_index, engine):
    top_k = 5
    got_df = engine.search_batch(QUERIES, top_k=top_k)
    got = {}
    for r in got_df.collect():
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    want = _oracle_hybrid(spark, spark_index, QUERIES, top_k)
    for qid in want:
        g, w = got.get(qid, []), want[qid]
        assert [d for d, _ in g] == [d for d, _ in w], qid
        for (_, gs), (_, ws) in zip(g, w):
            assert math.isclose(gs, ws, rel_tol=1e-6), qid


def test_query_embed_differs_from_doc_embed(spark, spark_index):
    """Guard: embedding text composition is doc-side only (title doubled);
    the query side encodes the raw query string."""
    e = build_doc_embeddings(spark_index.docs)
    assert e.columns == ["doc_id", "embedding"]


def test_embedding_ann_path(spark, engine):
    """ann_planes=[] means one bucket — must equal the exact scan row for
    row; with real planes, every returned (query, doc, sim) must agree
    with the exact path's sim for that pair (the prune only drops rows)."""
    queries = [(0, "make work"), (1, "time year")]
    exact = {
        (r["query_id"], r["doc_id"]): r["sim"]
        for r in engine.embedding_search_batch(queries, top_k=500).collect()
    }
    empty = engine.embedding_search_batch(queries, top_k=5, ann_planes=[]).collect()
    base = engine.embedding_search_batch(queries, top_k=5).collect()
    assert sorted((r["query_id"], r["doc_id"], round(r["sim"], 9)) for r in empty) == \
        sorted((r["query_id"], r["doc_id"], round(r["sim"], 9)) for r in base)

    from searchengine_spark.plans import ann
    from searchengine_spark.plans.hybrid import EMBEDDING_DIM

    planes = ann.make_hyperplanes(EMBEDDING_DIM, 4)
    # a query whose text IS a doc's embedding composition lands in that
    # doc's bucket by construction (identical vector) — the pruned path
    # must find it with sim = 1/(1+0) = 1.0
    doc = engine.tables.docs.orderBy("doc_id").first()
    self_q = f"{doc['title']} {doc['title']} {doc['description']} {doc['content_snippet']}"
    pruned = engine.embedding_search_batch(
        [(7, self_q)], top_k=5, ann_planes=planes
    ).collect()
    assert any(r["doc_id"] == doc["doc_id"] for r in pruned), pruned
    top = {r["doc_id"]: r["sim"] for r in pruned}
    assert abs(top[doc["doc_id"]] - 1.0) < 1e-6  # float32 storage rounding
    # prune-only property on arbitrary queries: any returned sim equals
    # the exact path's sim for that (query, doc) pair
    pruned2 = engine.embedding_search_batch(queries, top_k=5, ann_planes=planes).collect()
    for r in pruned2:
        assert abs(exact[(r["query_id"], r["doc_id"])] - r["sim"]) < 1e-9


def test_hybrid_oracle_embeddings_bit_identical(spark, tmp_path, monkeypatch):
    """The driver-side materializer that feeds the DuckDB hybrid-combine
    twin (entry_queries.materialize_hybrid_oracle_embeddings) must produce
    BIT-identical float32 vectors to the engine's own Arrow build
    (build_doc_embeddings over the text-only corpus) — the twin's sims are
    only hash-comparable because the vectors, not just the math, agree."""
    import numpy as np
    import pyarrow.parquet as pq

    from searchengine_spark.plans import entry_queries as eq
    from searchengine_spark.plans.text_only import tokenize_text_documents
    from searchengine_spark.operators.index_build import build_index_tables

    sf_dir = "/root/testdata/sf0.001"
    monkeypatch.setattr(
        eq, "_scratch_dir", lambda sf, name: str(tmp_path)
    )
    path = eq.materialize_hybrid_oracle_embeddings(sf_dir)
    mat = pq.read_table(path)
    by_id = {
        d: np.asarray(e, dtype=np.float32)
        for d, q, e in zip(
            mat.column("doc_id").to_pylist(),
            mat.column("is_query").to_pylist(),
            mat.column("embedding").to_pylist(),
        )
        if not q
    }
    qvec = next(
        np.asarray(e, dtype=np.float32)
        for q, e in zip(
            mat.column("is_query").to_pylist(),
            mat.column("embedding").to_pylist(),
        )
        if q
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tables = build_index_tables(tokenize_text_documents(docs))
    built = build_doc_embeddings(tables.docs).collect()
    assert len(built) == len(by_id)
    for r in built:
        want = by_id[r["doc_id"]]
        got = np.asarray(r["embedding"], dtype=np.float32)
        assert np.array_equal(got, want), r["doc_id"]
    # the query row is the engine's encoder over the raw query string
    from searchengine_spark.plans.hybrid import make_encoder

    want_q = make_encoder()([eq.STEMMED_QUERY]).astype(np.float32)[0]
    assert np.array_equal(qvec, want_q)
