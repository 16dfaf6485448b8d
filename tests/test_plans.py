"""Physical-plan assertions (the 100 TB posture, SURVEY.md §4): filters reach
the parquet scan, projections prune the read schema, dim joins broadcast —
checked against the actual executed plans, not hoped for."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphsense_ethereum_etl_spark.plans import (
    has_broadcast_join,
    pushed_filters,
    scan_columns,
)
from graphsense_ethereum_etl_spark.queries import REGISTRY, load


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select("l_returnflag")
    )
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed


def test_column_pruning(spark, sf_dir):
    df = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    cols = scan_columns(df)
    assert cols and set(cols[0]) == {"l_returnflag", "l_quantity"}, cols


def test_enrich_join_is_broadcast(spark, sf_dir):
    df = REGISTRY["j1_enrich_orders"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_two_hop_join_is_broadcast(spark, sf_dir):
    df = REGISTRY["g2_two_hop"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_global_topk_avoids_full_sort(spark, sf_dir):
    from graphsense_ethereum_etl_spark.plans.explain import executed_plan

    df = REGISTRY["o1_global_topk"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in executed_plan(df)
