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


def test_asof_join_forward_directions(spark):
    """Forward as-of: each left row picks the EARLIEST right row at-or-after
    (inclusive) / strictly-after (exclusive) its timestamp."""
    from graphsense_ethereum_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 30), (2, 5)], "k bigint, ts bigint"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c")],
        "k bigint, ts bigint, v string",
    )
    inc = {
        (r["k"], r["ts"]): r["asof_v"]
        for r in asof_join(
            left, right, by="k", left_ts="ts", right_ts="ts",
            right_cols=["v"], direction="forward",
        ).collect()
    }
    assert inc == {(1, 10): "a", (1, 25): "c", (1, 30): "c", (2, 5): None}
    exc = {
        (r["k"], r["ts"]): r["asof_v"]
        for r in asof_join(
            left, right, by="k", left_ts="ts", right_ts="ts",
            right_cols=["v"], direction="forward", inclusive=False,
        ).collect()
    }
    assert exc == {(1, 10): "b", (1, 25): "c", (1, 30): None, (2, 5): None}


def test_asof_join_forward_matches_duckdb_oracle(spark, sf_dir):
    """Forward as-of over real data vs DuckDB's native ASOF JOIN with the
    >= comparison flipped (next event at-or-after each order date)."""
    import duckdb

    from graphsense_ethereum_etl_spark.operators.joins import asof_join
    from graphsense_ethereum_etl_spark.queries import load

    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select(
            F.col("o_orderkey"),
            (F.col("o_orderkey") % 50).alias("k"),
            F.col("o_totalprice").cast("double").alias("ts_val"),
        )
    )
    # right side: per-key price checkpoints
    right = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") % 7) == 0)
        .select(
            (F.col("o_orderkey") % 50).alias("k"),
            F.col("o_totalprice").cast("double").alias("ts_val"),
            F.col("o_orderkey").alias("ref_key"),
        )
        .groupBy("k", "ts_val")
        .agg(F.min("ref_key").alias("ref_key"))
    )
    got = {
        (r["o_orderkey"],): (r["asof_ref_key"],)
        for r in asof_join(
            orders, right, by="k", left_ts="ts_val", right_ts="ts_val",
            right_cols=["ref_key"], direction="forward",
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    want = {
        (r[0],): (r[1],)
        for r in con.execute(
            """
            WITH l AS (SELECT o_orderkey, o_orderkey % 50 AS k,
                              CAST(o_totalprice AS DOUBLE) AS ts_val
                       FROM orders WHERE o_orderkey < 500),
            r AS (SELECT k, ts_val, MIN(ref_key) AS ref_key FROM (
                    SELECT o_orderkey % 50 AS k,
                           CAST(o_totalprice AS DOUBLE) AS ts_val,
                           o_orderkey AS ref_key
                    FROM orders WHERE o_orderkey % 7 = 0)
                  GROUP BY k, ts_val)
            SELECT l.o_orderkey, r.ref_key
            FROM l ASOF LEFT JOIN r
              ON l.k = r.k AND l.ts_val <= r.ts_val
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_asof_join_property_vs_bruteforce(spark):
    """Both directions × both tie modes against a per-row brute force, on a
    deterministic grid of adversarial cases: duplicate left timestamps,
    left==right ties, keys with no right rows, empty prefix/suffix."""
    left_rows = [
        (k, ts) for k in (1, 2, 3) for ts in (0, 5, 5, 10, 17, 23)
    ]
    right_rows = [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 23, "z")]
    # key 3 has NO right rows at all
    left = spark.createDataFrame(left_rows, "k bigint, ts bigint")
    right = spark.createDataFrame(right_rows, "k bigint, ts bigint, v string")

    def brute(direction, inclusive):
        out = {}
        for i, (k, ts) in enumerate(left_rows):
            cands = [
                (rts, v)
                for rk, rts, v in right_rows
                if rk == k
                and (
                    (direction == "backward" and (rts <= ts if inclusive else rts < ts))
                    or (direction == "forward" and (rts >= ts if inclusive else rts > ts))
                )
            ]
            if not cands:
                out[i] = None
            elif direction == "backward":
                out[i] = max(cands)[1]
            else:
                out[i] = min(cands)[1]
        return out

    from graphsense_ethereum_etl_spark.operators.joins import asof_join

    for direction in ("backward", "forward"):
        for inclusive in (True, False):
            got_rows = asof_join(
                left, right, by="k", left_ts="ts", right_ts="ts",
                right_cols=["v"], inclusive=inclusive, direction=direction,
            ).collect()
            # left has duplicate (k, ts) rows; compare as multisets per key
            got = sorted((r["k"], r["ts"], r["asof_v"]) for r in got_rows)
            want_map = brute(direction, inclusive)
            want = sorted(
                (k, ts, want_map[i]) for i, (k, ts) in enumerate(left_rows)
            )
            assert got == want, (direction, inclusive, got, want)
