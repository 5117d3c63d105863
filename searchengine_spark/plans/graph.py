"""Connected components over an edge frame — the clustering step of
near-duplicate deduplication.

Pairwise near-dup detection (MinHash-LSH, SimHash, embedding-cosine —
plans/entry_queries.py, plans/ann.py) yields candidate PAIRS; an actual
dedup pass needs CLUSTERS: the transitive closure of the pair relation,
with one canonical survivor per cluster (conventionally the minimum id).
The reference engine never needs this (its corpus fits one pickle and
dedup is the crawler's visited-set, crawler.py:210-219); at 10^12 docs it
is the step between "pairs found" and "rows dropped".

Algorithm: iterative min-label propagation. Each node starts labeled with
itself; every round each node takes the minimum label in its closed
neighborhood (one hash join edge⋈label + one hash agg); fixpoint when no
label changes. Rounds = graph diameter — near-dup clusters are dense and
tiny (a duplicated page and its copies all pair with each other), so 2-3
rounds is typical and every round is a keyed shuffle, never a pairwise
scan. For adversarial long-chain graphs the large-star/small-star
decomposition (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) bounds rounds at O(log² n) using exactly this
propagation step as its primitive; ``max_iter`` fails loudly rather than
silently emitting an unconverged clustering.

Lineage per round is truncated with an eager ``localCheckpoint`` —
without it the plan doubles every iteration and the job dies on plan
bloat long before data size matters (the standard iterative-DataFrame
pitfall). On a cluster with HDFS-backed checkpointing, swap for
``checkpoint()`` to also survive executor loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Exact connected components of the undirected graph ``edges``.

    Returns one row per node appearing in any edge: ``(node, label)``
    where ``label`` is the minimum node id in the component — stable,
    deterministic cluster ids regardless of partitioning or edge order.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # min label over the closed neighborhood of each node
        prop = sym.join(
            labels.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), "label")
        new = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pathological graph diameter; raise max_iter or pre-contract with "
        "large-star/small-star"
    )


def dedup_clusters(
    pairs: DataFrame, id_a: str = "vec_a", id_b: str = "vec_b"
) -> DataFrame:
    """Near-dup pairs → clusters with a canonical survivor.

    ``(vec_id, cluster_id, is_canonical)`` for every id in a pair:
    ``cluster_id`` is the component minimum; the canonical row (the one a
    dedup pass KEEPS) is the member equal to it. Downstream: anti-join the
    corpus against the non-canonical ids to drop duplicates."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("node").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_canonical"),
    )
