"""Join-operator tests: generic as-of join (union+window), skew-salted join
(result parity with the plain join), and bucketed co-located joins (the
exchange-free plan the 100-TB layout is designed around)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphsense_ethereum_etl_spark.operators.joins import asof_join, salted_join
from graphsense_ethereum_etl_spark.queries import load
from graphsense_ethereum_etl_spark.sinks import write_bucketed


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_asof_join_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")], "k int, ts int, name string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 150), (3, 1, 999)], "k int, ts int, v int"
    )
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="ts", right_cols=["v"])
    assert _rows(out, "name", "asof_v") == [("p1", 100), ("p2", 150), ("p3", None)]


def test_asof_join_exclusive(spark):
    left = spark.createDataFrame([(1, 10, "p1")], "k int, ts int, name string")
    right = spark.createDataFrame([(1, 10, 100), (1, 9, 90)], "k int, ts int, v int")
    out = asof_join(
        left, right, by="k", left_ts="ts", right_ts="ts", right_cols=["v"], inclusive=False
    )
    # ts=10 right row excluded under strict '<'
    assert _rows(out, "name", "asof_v") == [("p1", 90)]


def test_asof_join_fill_is_row_atomic(spark):
    """A right row holding NULL in one of right_cols must still supply ALL
    asof_* values (no stitching an older row's value into one column)."""
    left = spark.createDataFrame([(1, 20, "p1")], "k int, ts int, name string")
    right = spark.createDataFrame(
        [(1, 10, 100, 7), (1, 15, None, 8)], "k int, ts int, v int, w int"
    )
    out = asof_join(
        left, right, by="k", left_ts="ts", right_ts="ts", right_cols=["v", "w"]
    )
    # newest right row (ts=15) wins atomically: v=None, w=8 — NOT (100, 8)
    assert _rows(out, "name", "asof_v", "asof_w") == [("p1", None, 8)]


def test_salted_join_rejects_dim_preserving_how(spark):
    fact = spark.createDataFrame([(1, "a")], "k int, x string")
    dim = spark.createDataFrame([(1, "d")], "k int, y string")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="fact-preserving"):
            salted_join(fact, dim, on="k", how=how)
    # fact-preserving joins stay accepted
    assert salted_join(fact, dim, on="k", how="left_semi").count() == 1
    assert salted_join(fact, dim, on="k", how="left_anti").count() == 0


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    salted = salted_join(
        li, orders, on="l_orderkey", num_salts=4, fact_salt_cols=["l_orderkey", "l_linenumber"]
    )
    plain = li.join(orders, "l_orderkey")
    cols = ["l_orderkey", "l_linenumber", "o_orderpriority"]
    assert _rows(salted, *cols) == _rows(plain, *cols)


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path_factory):
    """Both sides bucketed on the join key with the same bucket count →
    the sort-merge join consumes the scans' bucket partitioning directly:
    no ShuffleExchange (and no Sort if sortBy matches) in the plan."""
    from graphsense_ethereum_etl_spark.plans.explain import executed_plan

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    write_bucketed(li, "bt_lineitem", "l_orderkey", 8, sort_cols=["l_orderkey"])
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bt_orders",
        "l_orderkey",
        8,
        sort_cols=["l_orderkey"],
    )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bt_lineitem").join(spark.table("bt_orders"), "l_orderkey")
            plan = executed_plan(joined)
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bt_orders")
