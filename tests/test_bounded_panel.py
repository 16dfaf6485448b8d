"""bounded_panel (queries.py) — the fixed-size deterministic query-panel
selector that replaced the corpus-proportional `id % k` panels (r10
VERDICT #1). Contracts: exactly n rows at any corpus size, deterministic
across runs, engine-parity with the _duck_panel SQL mirror, and a
TakeOrderedAndProject plan (map-side partial top-n, never a global
sort)."""

from __future__ import annotations

import duckdb
import pytest

from graphsense_ethereum_etl_spark.queries import _duck_panel, bounded_panel


@pytest.fixture
def ids_df(spark):
    return spark.range(0, 5000).selectExpr("id as vec_id", "id * 2 as v")


def test_fixed_size_and_deterministic(spark, ids_df):
    p1 = {r.vec_id for r in bounded_panel(ids_df, "vec_id", ":t", 16).collect()}
    p2 = {r.vec_id for r in bounded_panel(ids_df, "vec_id", ":t", 16).collect()}
    assert len(p1) == 16 and p1 == p2
    # a different salt selects a different (still fixed-size) panel
    p3 = {r.vec_id for r in bounded_panel(ids_df, "vec_id", ":u", 16).collect()}
    assert len(p3) == 16 and p3 != p1
    # 10x the corpus: STILL exactly 16 rows — the property the %-panels lacked
    big = spark.range(0, 50000).selectExpr("id as vec_id", "id * 2 as v")
    assert bounded_panel(big, "vec_id", ":t", 16).count() == 16


def test_engine_parity_with_duck_mirror(spark, ids_df):
    got = sorted(r.vec_id for r in bounded_panel(ids_df, "vec_id", ":t", 16).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM range(5000) r(vec_id)")
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT vec_id FROM t {_duck_panel('vec_id', ':t', 16)}"
        ).fetchall()
    )
    assert got == want


def test_plans_as_top_n_not_global_sort(spark, ids_df):
    plan = (
        bounded_panel(ids_df, "vec_id", ":t", 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
