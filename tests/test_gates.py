"""The shared join-strategy gate (operators/gates.py): one contract for
every "small build side" join — broadcast under a bounded count, pinned
shuffle_hash past it (round-4 verdict #7)."""

from pyspark.sql import functions as F

from searchengine_spark.operators.gates import gated_build_side


def _strategies(plan: str) -> str:
    return "".join(
        line for line in plan.splitlines()
        if "Join" in line or "Broadcast" in line
    )


def test_under_ceiling_broadcasts(spark):
    small = spark.range(10).select(F.col("id").alias("k"))
    big = spark.range(10_000).select((F.col("id") % 100).alias("k"), "id")
    gated, oversized = gated_build_side(small, 100)
    assert not oversized
    plan = big.join(gated, "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_past_ceiling_pins_shuffle_hash(spark):
    # a frame past the ceiling must NOT broadcast even though Catalyst
    # would happily auto-broadcast 500 rows — the pin is the contract
    notsmall = spark.range(500).select(F.col("id").alias("k"))
    big = spark.range(10_000).select((F.col("id") % 500).alias("k"), "id")
    gated, oversized = gated_build_side(notsmall, 100)
    assert oversized
    plan = big.join(gated, "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_count_frame_is_the_bound(spark):
    # raw precursor past the ceiling forces the shuffle arm even when the
    # gated (distinct) frame itself would fit — conservative by design
    raw = spark.range(1000).select((F.col("id") % 5).alias("k"))
    probe = raw.distinct()
    gated, oversized = gated_build_side(probe, 100, count_frame=raw)
    assert oversized
    # and the bounded count early-exits: ceiling+1 rows, never a full scan
    gated2, oversized2 = gated_build_side(probe, 100)
    assert not oversized2  # distinct has 5 rows
