"""Phase-1 sub-range splitting (plans/wand.py:_candidates): decoupling WAND
kernel parallelism from n_shards.

Round-4 measured ceiling (BASELINE.md §query-side scaling): phase-1 task
count == n_shards caps query-side scaling at 0.49 whenever shards ≤ cores.
The fix cuts each shard's docno range into S contiguous cells, ships every
block overlapping a cell to that cell's task, and masks decoded postings to
the cell — so parallelism is n_shards × S while every doc's full posting
set still lands in exactly one task (exactness precondition for raw BM25).

Properties pinned here:

* rank/score identity vs the exhaustive Catalyst engine at S = 3 and at the
  degenerate S ≫ shard_size (R = 1: one cell per docno) — the adversarial
  extreme where every rare-term block is shipped to every cell it spans;
* pruned ≡ unpruned under sub-splitting (θ seeding is per-cell);
* tombstone-masked queries stay identical under sub-splitting;
* θ-refined candidate volume stays flat in S (per-cell emission floors
  multiply raw volume by ~S; refinement must collapse it back — same
  argument as the shard-count-independence test);
* the auto policy: production shape (shards ≫ cores) resolves to S = 1
  (byte-identical legacy plan), serving shape (few fat shards, many cores)
  resolves to the task-factor target, and the min-cell-docs cap binds.

Reference semantics anchor: SearchIndexer.search (indexer.py:280-342) —
exact top-k must be preserved under any physical parallelism.
"""

import dataclasses
import math

import pytest

from searchengine_spark.operators import shards, tombstones
from searchengine_spark.plans.bm25 import BM25SearchEngine
from searchengine_spark.plans.wand import WandSearchEngine
from searchengine_spark.sources import webgen

N_DOCS = 400
N_SHARDS = 8  # shard_size = 50: S=3 → ~17-doc cells, plenty of boundaries
TOP_K = 5


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("subsplit_idx"))
    pages = spark.createDataFrame(webgen.generate_pandas(N_DOCS))
    return shards.build_and_write_sharded(
        spark, pages, path, n_shards=N_SHARDS, block_size=16
    )


@pytest.fixture(scope="module")
def logical(spark, index):
    return shards.export_index(spark, index)


def _results(df):
    return [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
        .collect()
    ]


@pytest.mark.parametrize("sub_split", [3, 1000])
def test_sub_split_matches_exhaustive(spark, index, logical, sub_split):
    """S=3 cuts every shard into thirds; S=1000 → R=1, one cell per docno —
    every block is replicated to every docno it spans, the most hostile
    masking geometry possible. Both must be rank- AND score-identical to
    the exhaustive engine."""
    queries = webgen.reference_queries()[:8]
    want = _results(
        BM25SearchEngine(spark, logical).search_batch(queries, top_k=TOP_K)
    )
    got = _results(
        WandSearchEngine(spark, index, sub_split=sub_split).search_batch(
            queries, top_k=TOP_K
        )
    )
    assert [(q, rk, d) for q, rk, d, _ in want] == [
        (q, rk, d) for q, rk, d, _ in got
    ]
    for (_, _, _, s1), (_, _, _, s2) in zip(want, got):
        assert math.isclose(s1, s2, rel_tol=1e-9, abs_tol=1e-12)


def test_sub_split_pruned_equals_unpruned(spark, index):
    queries = webgen.reference_queries()[:5]
    eng = WandSearchEngine(spark, index, sub_split=4)
    pruned = _results(eng.search_batch(queries, top_k=TOP_K, prune=True))
    unpruned = _results(eng.search_batch(queries, top_k=TOP_K, prune=False))
    assert pruned == unpruned


def test_sub_split_with_tombstone_mask(spark, index):
    """Masked queries under sub-splitting: the kill set is sliced to the
    cell's (not the shard's) docno window, and masked results must equal
    the un-split masked engine exactly."""
    kill = index.docs.limit(25).select("doc_id")
    mask = tombstones.build_mask(spark, index, kill)
    queries = webgen.reference_queries()[:5]
    want = _results(
        WandSearchEngine(spark, index, mask=mask).search_batch(
            queries, top_k=TOP_K
        )
    )
    got = _results(
        WandSearchEngine(spark, index, mask=mask, sub_split=3).search_batch(
            queries, top_k=TOP_K
        )
    )
    assert want == got


def test_refined_volume_is_sub_split_independent(spark, index):
    """Per-cell emission floors multiply raw phase-1 volume by ~S; the
    θ-refinement must collapse it back to the per-query global boost-margin
    set — the same property the shard-count-independence test pins."""
    from searchengine_spark.config import DEFAULT_STOPWORDS

    queries = webgen.reference_queries()[:4]

    def volumes(sub_split):
        eng = WandSearchEngine(spark, index, sub_split=sub_split)
        qinfo, term_list = eng._analyze(queries, DEFAULT_STOPWORDS)
        raw = eng._candidates(qinfo, term_list, TOP_K, prune=True)
        return raw.count(), eng._refine(raw, TOP_K).count(), len(qinfo)

    pre1, post1, n_q = volumes(1)
    pre6, post6, _ = volumes(6)
    assert pre6 >= pre1, (pre1, pre6)  # per-cell floors raise raw emission
    # …but refinement is global: volume stays flat (small slack — per-cell
    # θ seeds and emission filters differ slightly between groupings)
    assert post6 <= post1 * 1.2 + 2 * n_q, (post1, post6)
    assert post6 >= min(TOP_K, 1) * n_q


def test_auto_policy(spark, index):
    par = spark.sparkContext.defaultParallelism

    # production shape: shards ≫ cores → S = 1 (legacy plan, no explode)
    prod = dataclasses.replace(index, n_shards=64 * par, shard_size=4_000_000)
    assert WandSearchEngine(spark, prod)._sub_split() == 1

    # saturation boundary: shards == cores → S = 1 (round-5 2x2 measured
    # splitting at saturation regressing 10% — no idle cores to recruit)
    sat = dataclasses.replace(index, n_shards=par, shard_size=4_000_000)
    assert WandSearchEngine(spark, sat)._sub_split() == 1

    # just below saturation: splitting kicks in
    if par > 1:
        near = dataclasses.replace(index, n_shards=par - 1, shard_size=4_000_000)
        assert WandSearchEngine(spark, near)._sub_split() > 1

    # serving shape: one fat shard, many cores → task-factor target
    fat = dataclasses.replace(index, n_shards=1, shard_size=100_000_000)
    assert (
        WandSearchEngine(spark, fat)._sub_split()
        == WandSearchEngine.SUB_SPLIT_TASK_FACTOR * par
    )

    # min-cell-docs cap binds on small shards (this test index: 50-doc
    # shards can never be worth splitting in auto mode)
    assert WandSearchEngine(spark, index)._sub_split() == 1

    # explicit override always wins
    assert WandSearchEngine(spark, index, sub_split=7)._sub_split() == 7


def test_sig_sidecar_is_chunked_and_roundtrips(spark):
    """Round-5 measured finding: a shard-spanning signature row defeats
    sub-splitting — the explode ships it to EVERY cell and each cell
    varint-decodes the whole shard's signatures (the dominant sub-split
    cost; posting blocks duplicated only ×1.02). The sidecar must be
    chunked (shards.SIG_CHUNK_DOCS) so cells receive only overlapping
    chunks, and the chunked rows must concatenate back to the exact
    per-doc signatures."""
    import numpy as np
    from pyspark.sql import functions as F

    from searchengine_spark.functions import fieldsig
    from searchengine_spark.operators import codec

    n = 10_000
    rng = np.random.default_rng(7)
    words = rng.integers(0, 2**32, size=(n, fieldsig.SIG_WORDS), dtype=np.uint64)
    pdf_rows = [
        (0, int(i * 3), [int(w) for w in words[i]]) for i in range(n)
    ]  # docno stride 3: gaps ≠ 1, exercises the delta coding
    src = spark.createDataFrame(
        pdf_rows, "shard int, docno long, fieldsig array<long>"
    )
    rows = shards.fieldsig_block_rows(src).collect()

    expect_chunks = math.ceil(n / shards.SIG_CHUNK_DOCS)
    assert len(rows) == expect_chunks > 1
    assert sorted(r["block_no"] for r in rows) == list(range(expect_chunks))

    ds, ws = [], []
    prev_max = -1
    for r in sorted(rows, key=lambda r: r["block_no"]):
        d = np.cumsum(codec.varint_decode(r["gaps"]), dtype=np.uint64)
        w = codec.varint_decode(r["tfs"]).reshape(-1, fieldsig.SIG_WORDS)
        assert r["n"] == d.size and r["min_docno"] == d[0] and r["max_docno"] == d[-1]
        assert r["min_docno"] > prev_max  # chunks are docno-disjoint, ordered
        prev_max = r["max_docno"]
        ds.append(d)
        ws.append(w)
    dcat = np.concatenate(ds)
    wcat = np.concatenate(ws)
    assert np.array_equal(dcat, np.arange(n, dtype=np.uint64) * 3)
    assert np.array_equal(wcat, words)

    # routing: at cell width R each chunk overlaps ≤ chunk_span/R + 1
    # cells, so the exploded sig rows stay near n_chunks, never
    # n_chunks × n_cells (the shard-spanning row's behavior)
    blocks = spark.createDataFrame(
        [
            (r["shard"], r["term"], r["min_docno"], r["max_docno"])
            for r in rows
        ],
        "shard int, term string, min_docno long, max_docno long",
    )
    R = 2500
    exploded = blocks.withColumn(
        "_sub",
        F.explode(
            F.sequence(F.expr(f"min_docno div {R}"), F.expr(f"max_docno div {R}"))
        ),
    ).count()
    n_cells = math.ceil((n * 3) / R)
    max_per_chunk = math.ceil((shards.SIG_CHUNK_DOCS * 3) / R) + 1
    assert exploded <= expect_chunks * max_per_chunk < expect_chunks * n_cells
