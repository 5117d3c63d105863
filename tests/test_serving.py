"""Serving layer (EP1): endpoint contract vs the reference app.py routes,
over a real in-process HTTP server + engine."""

import json
import threading
import urllib.request

import pytest

from searchengine_spark import serving
from searchengine_spark.operators import index_build
from searchengine_spark.plans.bm25 import BM25SearchEngine
from searchengine_spark.sources import webgen

N_DOCS = 300


@pytest.fixture(scope="module")
def service(spark):
    pages = spark.createDataFrame(webgen.generate_pandas(N_DOCS))
    tables = index_build.build_index(pages)
    for name in ("docs", "postings", "doc_stats", "term_stats", "stats"):
        setattr(tables, name, getattr(tables, name).cache())
    return serving.SearchService(spark, BM25SearchEngine(spark, tables))


@pytest.fixture(scope="module")
def server(service):
    srv = serving.serve(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_health_reports_index_counts(server, service):
    for path in ("/health", "/api/health"):
        status, body = _get(server + path)
        assert status == 200
        assert body["status"] == "healthy" and body["index_loaded"]
        assert body["document_count"] == N_DOCS
        assert body["term_count"] == service.term_count > 0


def test_api_search_contract(server):
    q = urllib.request.quote(webgen.reference_queries()[9][1])  # planted term
    status, body = _get(f"{server}/api/search?q={q}&limit=5")
    assert status == 200
    assert set(body) == {"results", "total"}
    assert 0 < body["total"] <= 5
    r0 = body["results"][0]
    assert {"doc_id", "url", "title", "meta_description", "content_snippet",
            "score", "source"} <= set(r0)
    assert 0.05 < r0["score"] <= 1.0


def test_api_search_empty_query(server):
    status, body = _get(server + "/api/search?q=")
    assert status == 200 and body == {"results": [], "total": 0}


def test_search_pagination(server):
    q = urllib.request.quote(webgen.reference_queries()[9][1])
    status, body = _get(f"{server}/search?q={q}&page=1")
    assert status == 200
    assert body["page"] == 1 and body["per_page"] == serving.RESULTS_PER_PAGE
    assert body["total_pages"] >= 1
    assert len(body["results"]) <= serving.RESULTS_PER_PAGE
    # out-of-range page clamps (plans/bm25.paginate semantics)
    _, body2 = _get(f"{server}/search?q={q}&page=999")
    assert body2["page"] == body2["total_pages"]


def test_unknown_route_404(server):
    try:
        urllib.request.urlopen(server + "/nope", timeout=60)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_hostile_query_params_are_clamped(server):
    """Negative/huge/non-numeric limit+page must not reach the engine or
    the paginator — they clamp to sane bounds (never a 500, never an echo
    of internals)."""
    q = urllib.request.quote(webgen.reference_queries()[9][1])
    for params in ("limit=-5", "limit=99999999", "limit=abc"):
        status, body = _get(f"{server}/api/search?q={q}&{params}")
        assert status == 200
        assert 0 <= body["total"] <= serving.MAX_LIMIT
    for params in ("page=-3", "page=0", "page=notanint"):
        status, body = _get(f"{server}/search?q={q}&{params}")
        assert status == 200
        assert 1 <= body["page"] <= body["total_pages"]


def test_error_payload_never_echoes_internals(server, service, monkeypatch):
    """A failing engine must yield a generic 500 payload — no exception
    text (paths, Spark plan details) crosses the HTTP boundary."""
    def boom(*a, **k):
        raise RuntimeError("secret /internal/path leaked")

    monkeypatch.setattr(service, "search", boom)
    try:
        urllib.request.urlopen(server + "/search?q=x", timeout=60)
        assert False, "expected 500"
    except urllib.error.HTTPError as e:
        assert e.code == 500
        body = json.loads(e.read())
        assert body == {"status": "unhealthy", "error": "internal error"}


def test_microbatched_concurrent_requests(spark, service):
    """N concurrent requests within the batching window must execute as
    ≤2 Spark batches (one window plus at most one straggler) with
    per-request results IDENTICAL to unbatched dispatch — the serving-side
    use of the engine's batch amortization (264 → ~30 ms/query measured).
    Reference analog: app.py:111-194 serializes requests on one worker."""
    import concurrent.futures

    batched = serving.SearchService(
        spark, service.engine, batch_window_ms=300.0
    )
    queries = [webgen.reference_queries()[i][1] for i in (3, 5, 7, 9, 11, 13)]
    want = [service.api_search(q, limit=5) for q in queries]

    before = batched.batcher.batches_dispatched
    with concurrent.futures.ThreadPoolExecutor(max_workers=len(queries)) as ex:
        got = list(ex.map(lambda q: batched.api_search(q, limit=5), queries))
    dispatched = batched.batcher.batches_dispatched - before
    batched.batcher.close()

    assert 1 <= dispatched <= 2, dispatched
    assert got == want
