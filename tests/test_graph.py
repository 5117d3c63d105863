"""Connected components / dedup clusters (plans/graph.py): exact labels on
handcrafted graphs vs a brute-force union-find, convergence on chains, and
the canonical-survivor contract (SURVEY.md training-pipeline ops)."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.plans import graph


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


CASES = {
    "two_triangles": [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)],
    "chain": [(i, i + 1) for i in range(1, 12)],  # diameter 11
    "star": [(5, i) for i in range(6, 30)],
    "bridge": [(1, 2), (2, 3), (3, 100), (100, 101)],
    "self_loop_and_pair": [(7, 7), (8, 9)],
    "reversed_ids": [(50, 1), (1, 30), (30, 2)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_components_match_union_find(spark, name):
    edges = CASES[name]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in graph.connected_components(df).collect()
    }
    assert got == _uf_components(edges)


def test_labels_independent_of_partitioning_and_order(spark):
    edges = CASES["bridge"] + CASES["chain"]
    a = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    b = spark.createDataFrame(list(reversed(edges)), "src long, dst long").coalesce(1)
    ra = sorted(map(tuple, graph.connected_components(a).collect()))
    rb = sorted(map(tuple, graph.connected_components(b).collect()))
    assert ra == rb


def test_max_iter_fails_loudly(spark):
    """The propagation-only contract keeps the round-2 loud failure."""
    df = spark.createDataFrame(CASES["chain"], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(df, max_iter=2, algorithm="propagation")


@pytest.mark.parametrize("name", sorted(CASES))
def test_star_algorithm_matches_union_find(spark, name):
    """Alternating large-star/small-star (Kiveris et al.) must produce the
    exact same labels as propagation/union-find on every handcrafted case —
    including self-loops (singletons) and reversed id orders."""
    edges = CASES[name]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in graph.connected_components(df, algorithm="star").collect()
    }
    assert got == _uf_components(edges)


def test_adversarial_chain_converges_via_star(spark):
    """THE round-3 verdict item: a long-chain pair graph (a mutated
    template family at 100 TB) must converge in O(log² n) star rounds, not
    O(diameter) propagation rounds. A 1000-node path with max_iter=3
    propagation rounds must fall back to the star algorithm under
    algorithm='auto' and still return exact labels (everything in
    component 0)."""
    n = 1000
    chain = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(chain, "src long, dst long")
    labels = graph.connected_components(df, max_iter=3).collect()
    assert len(labels) == n + 1
    assert all(r["label"] == 0 for r in labels), [
        r for r in labels if r["label"] != 0
    ][:5]
    # and star-from-round-one agrees on a shuffled, repartitioned copy
    import random

    rng = random.Random(7)
    shuffled = chain[:]
    rng.shuffle(shuffled)
    df2 = spark.createDataFrame(shuffled, "src long, dst long").repartition(9)
    labels2 = graph.connected_components(df2, algorithm="star").collect()
    assert all(r["label"] == 0 for r in labels2)


def test_drop_duplicates_by_cluster(spark):
    """The materialize operator: canonical members and unclustered rows
    survive; non-canonical members are dropped — on the id column of an
    arbitrary corpus frame."""
    pairs = spark.createDataFrame(
        [(4, 2), (2, 9), (30, 31)], "vec_a long, vec_b long"
    )
    clusters = graph.dedup_clusters(pairs)
    corpus = spark.range(0, 40).select(
        F.col("id").alias("doc_id"), (F.col("id") * 10).alias("payload")
    )
    kept = graph.drop_duplicates_by_cluster(corpus, clusters).collect()
    kept_ids = sorted(r["doc_id"] for r in kept)
    # dropped: 4, 9 (cluster min 2) and 31 (cluster min 30)
    assert kept_ids == [i for i in range(40) if i not in (4, 9, 31)]
    # payload columns pass through untouched
    assert all(r["payload"] == r["doc_id"] * 10 for r in kept)


def test_dedup_clusters_canonical_contract(spark):
    pairs = spark.createDataFrame(
        [(4, 2), (2, 9), (30, 31)], "vec_a long, vec_b long"
    )
    rows = {r["vec_id"]: r for r in graph.dedup_clusters(pairs).collect()}
    assert rows[2]["cluster_id"] == 2 and rows[2]["is_canonical"]
    assert rows[4]["cluster_id"] == 2 and not rows[4]["is_canonical"]
    assert rows[9]["cluster_id"] == 2 and not rows[9]["is_canonical"]
    assert rows[30]["is_canonical"] and not rows[31]["is_canonical"]
    # exactly one canonical per cluster — the dedup survivor
    canon = [r for r in rows.values() if r["is_canonical"]]
    assert sorted(r["cluster_id"] for r in canon) == [2, 30]
    # anti-join drop set = non-canonical members
    corpus = spark.range(0, 40).withColumnRenamed("id", "vec_id")
    keep = corpus.join(
        graph.dedup_clusters(pairs).filter(~F.col("is_canonical")),
        "vec_id",
        "left_anti",
    )
    assert keep.count() == 40 - 3


# ---------------------------------------------------------------- pagerank


def _pr_reference(edges, universe, iterations=5, d=0.85):
    """Pure-Python PageRank loop — the operator's documented contract."""
    E = sorted({(u, v) for u, v in edges if u != v
                and u in universe and v in universe})
    outd = {}
    for u, _ in E:
        outd[u] = outd.get(u, 0) + 1
    n = len(universe)
    r = {v: 1.0 / n for v in universe}
    for _ in range(iterations):
        dang = sum(r[v] for v in universe if v not in outd)
        new = {v: (1 - d) / n + d * (dang / n) for v in universe}
        for u, v in E:
            new[v] += d * r[u] / outd[u]
        r = new
    return r


PR_CASES = {
    "cycle_with_dangling": [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3)],
    "chain": [(i, i + 1) for i in range(8)],
    "star_hub": [(i, 0) for i in range(1, 12)] + [(0, 1)],
    "dup_edges_self_loops": [(0, 1), (0, 1), (1, 1), (1, 2), (2, 0)],
}


@pytest.mark.parametrize("name", sorted(PR_CASES))
def test_pagerank_matches_reference_loop(spark, name):
    edges = PR_CASES[name]
    universe = sorted({x for e in edges for x in e} | {99})  # 99 isolated
    nodes = spark.createDataFrame([(v,) for v in universe], "node long")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pr"]
           for r in graph.pagerank(e, nodes=nodes, iterations=5).collect()}
    want = _pr_reference(edges, universe)
    assert set(got) == set(want)
    for v in universe:
        assert abs(got[v] - want[v]) < 1e-12, (name, v, got[v], want[v])
    # stochastic completion: total rank mass is exactly 1
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_zero_iterations_is_uniform(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r["node"]: r["pr"] for r in graph.pagerank(e, iterations=0).collect()}
    assert got == {0: 0.5, 1: 0.5}


def test_pagerank_explicit_universe_restricts_edges(spark):
    # endpoint 7 is outside the universe: its edges must not leak mass
    e = spark.createDataFrame([(0, 1), (1, 7), (7, 0)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    got = {r["node"]: r["pr"]
           for r in graph.pagerank(e, nodes=nodes, iterations=4).collect()}
    want = _pr_reference([(0, 1)], [0, 1], iterations=4)
    assert set(got) == {0, 1}
    for v in (0, 1):
        assert abs(got[v] - want[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_validation(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        graph.pagerank(e, iterations=-1)
    with pytest.raises(ValueError, match="damping"):
        graph.pagerank(e, damping=1.5)


def test_pagerank_real_link_graph_end_to_end(spark):
    """The production chain: webgen pages → F5 outlinks (Arrow pass +
    JVM explode) → pagerank over URL nodes, checked value-for-value
    against the pure-Python loop on the same extracted edges."""
    from searchengine_spark.plans.classify import outlinks
    from searchengine_spark.sources import webgen

    pages = webgen.generate_spark(spark, 120, partitions=4).select(
        "url", "html"
    )
    urls = [r["url"] for r in pages.select("url").collect()]
    edges_df = outlinks(pages)
    edges = [(r["src_url"], r["out_url"]) for r in edges_df.collect()]
    assert edges, "webgen corpus must produce real <a href> links"
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(
            edges_df,
            src="src_url",
            dst="out_url",
            nodes=pages.select("url"),
            iterations=4,
        ).collect()
    }
    want = _pr_reference(edges, sorted(set(urls)), iterations=4)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_bucketed_matches_reference_loop(spark):
    edges = PR_CASES["cycle_with_dangling"]
    universe = sorted({x for e in edges for x in e})
    nodes = spark.createDataFrame([(v,) for v in universe], "node long")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(
            e, nodes=nodes, iterations=5,
            bucket_table="_test_pr_bucket", n_buckets=4,
        ).collect()
    }
    want = _pr_reference(edges, universe)
    for v in universe:
        assert abs(got[v] - want[v]) < 1e-12
    # operator drops its bucketed table on exit
    assert not spark.catalog.tableExists("_test_pr_bucket")


def test_pagerank_bucketed_join_has_no_edge_exchange(spark):
    """The reason bucket_table exists: the per-iteration contribution
    join must scan the bucketed edge table WITHOUT an Exchange on the
    edge side (a checkpointed frame loses partitioning for Catalyst and
    re-shuffles all edges every round)."""
    from pyspark.sql import functions as F

    ew = spark.range(5000).select(
        (F.col("id") % 101).alias("u"),
        (F.col("id") % 97).alias("v"),
        F.lit(2).alias("deg"),
    )
    bucketed = graph._pr_bucketize(ew, "_test_pr_bucket_plan", 4)
    try:
        # a rank frame too big to broadcast, so the join must co-locate
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ranks = spark.range(101).select(
            F.col("id").alias("node"), F.lit(0.01).alias("pr")
        )
        plan = (
            graph._pr_contribs(bucketed, ranks)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS _test_pr_bucket_plan")
    assert "Bucketed: true" in plan
    # exactly the dst-agg exchange and the ranks-side exchange may appear;
    # the bucketed scan itself must not sit under an Exchange. Walk the
    # plan: no Exchange line may have the bucketed FileScan beneath it
    # before another exchange-consuming operator — cheap proxy: the scan
    # line itself advertises its buckets were USED for the join
    assert "SelectedBucketsCount" in plan
    import re as _re
    assert len(_re.findall(r"Exchange hashpartitioning", plan)) <= 2


def test_pagerank_bucket_table_name_guard(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="identifier"):
        graph.pagerank(e, iterations=1, bucket_table="x; DROP TABLE y")


def _pr_weighted_reference(wedges, universe, iterations=5, d=0.85):
    """Pure-Python weighted PageRank loop (duplicate edges sum weights)."""
    agg = {}
    for u, v, w in wedges:
        if u != v and u in universe and v in universe:
            agg[(u, v)] = agg.get((u, v), 0.0) + w
    W = {}
    for (u, _), w in agg.items():
        W[u] = W.get(u, 0.0) + w
    n = len(universe)
    r = {x: 1.0 / n for x in universe}
    for _ in range(iterations):
        dang = sum(r[x] for x in universe if x not in W)
        new = {x: (1 - d) / n + d * (dang / n) for x in universe}
        for (u, v), w in agg.items():
            new[v] += d * r[u] * w / W[u]
        r = new
    return r


def test_pagerank_weighted_matches_reference_loop(spark):
    wedges = [
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.5), (2, 0, 1.0),
        (1, 3, 0.5), (0, 1, 1.0),  # duplicate (0,1): weights sum to 4.0
    ]
    universe = [0, 1, 2, 3, 9]  # 9 isolated, 3 dangling
    nodes = spark.createDataFrame([(v,) for v in universe], "node long")
    e = spark.createDataFrame(wedges, "src long, dst long, w double")
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(
            e, nodes=nodes, iterations=5, weight="w"
        ).collect()
    }
    want = _pr_weighted_reference(wedges, universe)
    for v in universe:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_weight_one_equals_unweighted(spark):
    edges = PR_CASES["cycle_with_dangling"]
    e = spark.createDataFrame(edges, "src long, dst long").withColumn(
        "w", F.lit(1.0)
    )
    plain = {r["node"]: r["pr"]
             for r in graph.pagerank(e, iterations=4).collect()}
    weighted = {r["node"]: r["pr"]
                for r in graph.pagerank(e, iterations=4, weight="w").collect()}
    for v in plain:
        assert abs(plain[v] - weighted[v]) < 1e-15


def test_pagerank_weighted_bucketed(spark):
    wedges = [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 4.0), (0, 2, 1.0)]
    universe = [0, 1, 2]
    nodes = spark.createDataFrame([(v,) for v in universe], "node long")
    e = spark.createDataFrame(wedges, "src long, dst long, w double")
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(
            e, nodes=nodes, iterations=4, weight="w",
            bucket_table="_test_pr_wbucket", n_buckets=2,
        ).collect()
    }
    want = _pr_weighted_reference(wedges, universe, iterations=4)
    for v in universe:
        assert abs(got[v] - want[v]) < 1e-12
    assert not spark.catalog.tableExists("_test_pr_wbucket")


def test_pagerank_bad_weight_fails_loudly(spark):
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    for bad in (0.0, -1.0, None):
        e = spark.createDataFrame(
            [(0, 1, bad)], "src long, dst long, w double"
        )
        with pytest.raises(Exception, match="must be positive"):
            graph.pagerank(e, nodes=nodes, iterations=1, weight="w").collect()


def test_pagerank_stats_observability(spark):
    e = spark.createDataFrame(PR_CASES["cycle_with_dangling"], "src long, dst long")
    stats = {}
    got = {r["node"]: r["pr"]
           for r in graph.pagerank(e, iterations=3, stats=stats).collect()}
    assert stats["rounds"] == 3
    # dangling_mass is the FINAL frame's mass on zero-out-degree nodes
    # (node 3 is the only dangling node in this graph)
    assert abs(stats["dangling_mass"] - got[3]) < 1e-12
