"""Connected-components unit tests (the oracle query cc1 covers the
integrated dedup-clustering path; these pin the operator's semantics)."""

from __future__ import annotations

from graphsense_ethereum_etl_spark.operators.graph import connected_components


def test_chain_and_island(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src bigint, dst bigint"
    )
    out = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_direction_independence(spark):
    edges = spark.createDataFrame([(5, 2), (2, 9)], "src bigint, dst bigint")
    out = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {2: 2, 5: 2, 9: 2}
