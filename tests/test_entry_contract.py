"""Replicates the driver's correctness gate locally: run each
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf0.01 parquet; compare row count, column names, and
order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check (driver's weak mode)
        return
    res = ddb.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    got = _norm([r.asDict() for r in spark_rows], spark_cols)
    want = _norm(duck_rows, duck_cols)
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["query_id", "rank", "doc_id", "url", "content_snippet", "score"]
    assert all(0.05 < r["score"] <= 1.0 for r in rows)


def test_oracle_sql_fails_loudly_when_materializer_breaks(monkeypatch, tmp_path):
    """The degrade-to-rows-only convention covers EXACTLY one case: the
    sf0.01 testdata is absent. A materializer failure with the testdata
    present is a code bug and must raise — silently popping the stemmed /
    hybrid keys would remove the driver's hash gate on the very paths it
    exists to check."""
    from searchengine_spark.plans import entry_queries as eq

    def boom(sf_dir):
        raise RuntimeError("simulated materializer bug")

    monkeypatch.setattr(eq, "materialize_stemmed_oracle_table", boom)
    # testdata present (the real driver environment) → must raise
    with pytest.raises(RuntimeError, match="simulated materializer bug"):
        entrymod.oracle_sql()
    # testdata absent (bare checkout) → degrade: stemmed-path keys popped,
    # the rest of the gate intact
    monkeypatch.setattr(
        eq, "STEMMED_ORACLE_SF_DIR", str(tmp_path / "nope")
    )
    out = entrymod.oracle_sql()
    assert "bm25_stemmed_topk" not in out and "hybrid_topk" not in out
    assert "bm25_topk" in out and len(out) > 30
