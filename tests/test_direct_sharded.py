"""One-pass direct sharded build ≡ two-step (plain tables → shard) build.

``shards.build_and_write_sharded`` never materializes the raw postings
table; this asserts its output (decoded postings, term_stats, meta, and the
WAND query results over it) is identical to ``build_sharded_index`` run on
the persisted logical tables — i.e. skipping the intermediate loses nothing.
"""

import pandas as pd
import pytest

from searchengine_spark.operators import index_build, shards
from searchengine_spark.plans.wand import WandSearchEngine
from searchengine_spark.sources import webgen

N_DOCS = 400
N_SHARDS = 4


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(webgen.generate_pandas(N_DOCS))


@pytest.fixture(scope="module")
def direct(spark, pages, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("direct"))
    return shards.build_and_write_sharded(spark, pages, path, n_shards=N_SHARDS)


@pytest.fixture(scope="module")
def two_step(spark, pages, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plain"))
    tables = index_build.build_and_write_index(spark, pages, path, postings_partitions=4)
    return shards.build_sharded_index(spark, tables, n_shards=N_SHARDS)


def _decoded(index) -> pd.DataFrame:
    out = shards.decode_blocks_to_postings(index.blocks.toPandas())
    return out.sort_values(["term", "docno"]).reset_index(drop=True)


def test_blocks_identical(direct, two_step):
    pd.testing.assert_frame_equal(_decoded(direct), _decoded(two_step))


def test_meta_identical(direct, two_step):
    assert direct.n_docs == two_step.n_docs
    assert direct.avgdl == pytest.approx(two_step.avgdl, abs=1e-9)
    assert direct.shard_size == two_step.shard_size
    assert direct.block_size == two_step.block_size


def test_term_stats_identical(direct, two_step):
    a = {r["term"]: (r["df"], round(r["idf"], 9)) for r in direct.term_stats.collect()}
    b = {r["term"]: (r["df"], round(r["idf"], 9)) for r in two_step.term_stats.collect()}
    assert a == b


def test_docs_cosharded(direct):
    rows = direct.docs.collect()
    assert len(rows) == N_DOCS
    assert all(r["shard"] == r["docno"] // direct.shard_size for r in rows)


def test_wand_queries_over_direct_index(spark, direct, two_step):
    queries = webgen.reference_queries()[:6]
    got = WandSearchEngine(spark, direct).search_batch(queries, top_k=10).collect()
    want = WandSearchEngine(spark, two_step).search_batch(queries, top_k=10).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got_t = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in sorted(got, key=key)]
    want_t = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in sorted(want, key=key)]
    assert got_t == want_t


def test_tiny_corpus_build_and_query(spark, tmp_path_factory):
    """Degenerate sizes: 3 docs across 4 shards (shard_size=1, some shards
    empty), single-block terms, queries with no hits."""
    path = str(tmp_path_factory.mktemp("tiny"))
    pages = spark.createDataFrame(webgen.generate_pandas(3))
    ix = shards.build_and_write_sharded(spark, pages, path, n_shards=4)
    assert ix.n_docs == 3 and ix.shard_size == 1
    assert ix.docs.count() == 3
    eng = WandSearchEngine(spark, ix)
    res = eng.search_batch([(0, "zzzzunseen tokens")], top_k=5)
    assert res is None or res.count() == 0
    res2 = eng.search_batch(webgen.reference_queries()[:3], top_k=5)
    assert res2 is None or res2.count() >= 0


def test_resumable_direct_build_identical_after_kill(spark, pages, tmp_path_factory, direct):
    """Kill the resumable production build mid-tokenize; resume; the final
    compressed index must be identical to the single-shot direct build."""
    from searchengine_spark.operators.checkpoint import SimulatedFailure
    from searchengine_spark.operators import checkpoint

    path = str(tmp_path_factory.mktemp("resume"))
    with pytest.raises(SimulatedFailure):
        checkpoint.checkpointed_tokenize(spark, pages, path, n_chunks=4, fail_after=2)
    resumed = shards.build_and_write_sharded(
        spark, pages, path, n_shards=N_SHARDS, resumable=True, n_chunks=4
    )
    pd.testing.assert_frame_equal(_decoded(resumed), _decoded(direct))
    assert resumed.n_docs == direct.n_docs
    assert resumed.avgdl == pytest.approx(direct.avgdl, abs=1e-9)


def test_fractional_boost_fails_loudly(monkeypatch):
    """The int32 tf cast is only sound for integral field boosts; a
    fractional boost config must fail before the cast can truncate."""
    import pytest as _pytest

    from searchengine_spark.operators import shards as _shards

    monkeypatch.setattr(_shards, "TITLE_BOOST", 2.5)
    with _pytest.raises(ValueError, match="integral field boosts"):
        _shards._assert_integral_boosts()


def test_head_term_skew_is_neutralized(spark, direct):
    """Doc-range sharding must spread every head term's postings across
    (almost) all shards with near-uniform per-shard lists — the explicit
    skew handling the north rule demands, measured from block metadata."""
    from searchengine_spark.operators import shards as _shards

    report = _shards.term_skew_report(direct, top_n=5).collect()
    assert report, "no terms in skew report"
    for r in report:
        # head terms (df >> n_shards) must appear in every shard...
        if r["df"] >= 4 * direct.n_shards:
            assert r["n_shards_present"] == direct.n_shards, r
            # ...with no shard holding a disproportionate slice
            assert r["skew"] <= 2.0, r
