

def test_grouped_outliers_adversarial_and_approx(spark):
    """NULL values never flag; NULL groups form a stratum; exact and
    approx agree on a well-separated fixture; row conservation holds."""
    from graphsense_ethereum_etl_spark.operators.quality import grouped_outliers

    rows = (
        [(i, "a", 10.0 + (i % 3)) for i in range(30)]
        + [(90, "a", 9000.0), (91, "a", None), (92, None, 10.0), (93, None, 9000.0)]
    )
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    for exact in (True, False):
        out = grouped_outliers(df, "v", "g", k=5.0, exact=exact)
        got = {r.id: r.is_outlier for r in out.collect()}
        assert len(got) == len(rows)          # every row returns
        assert got[90] is True                # planted extreme flags
        assert got[91] is None                # NULL value -> no verdict
        assert all(got[i] is False for i in range(30))
        # NULL group: its own stratum of {10, 9000} -> mad over 2 values
        assert got[92] is not None and got[93] is not None


def test_grouped_outliers_broadcast_gate(spark):
    """The |groups|-sized med/mad attach is size-gated (r9 VERDICT #1):
    a measured bound under the cap broadcasts (zero fact shuffle); an
    unmeasured bound (None) resolves to the scale-safe shuffle regime —
    no broadcast exchange anywhere in the plan. Both regimes return
    identical rows."""
    from graphsense_ethereum_etl_spark.operators.quality import grouped_outliers

    df = spark.createDataFrame(
        [(i, chr(97 + i % 4), float(i % 7)) for i in range(40)],
        "id bigint, g string, v double",
    )
    fast = grouped_outliers(df, "v", "g", k=5.0, n_groups_bound=4)
    safe = grouped_outliers(df, "v", "g", k=5.0, n_groups_bound=None)
    fast_plan = fast._jdf.queryExecution().executedPlan().toString()
    safe_plan = safe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in fast_plan
    assert "Broadcast" not in safe_plan
    assert "ShuffledHashJoin" in safe_plan
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, safe.collect()))


def test_compact_retired_antijoin_gate(spark):
    """compact_minhash_index size-gates its retired-id anti-join build
    side: the hint flows through evolving_hint, so FORCE_SHUFFLE_ENV (the
    byte-audit regime pin) must flip the anti-join off broadcast while
    retirement semantics stay identical."""
    import os

    from graphsense_ethereum_etl_spark.operators.dedup import (
        build_minhash_index,
        compact_minhash_index,
    )
    from graphsense_ethereum_etl_spark.plans.hints import FORCE_SHUFFLE_ENV

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps over the lazy dog") for i in range(12)],
        "doc_id bigint, body string",
    )
    tbl = "mh_gate_idx"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    build_minhash_index(docs, tbl, text_col="body", id_col="doc_id", num_hashes=8, bands=4)
    retire = spark.createDataFrame([(3,), (7,)], "doc_id bigint")
    old = os.environ.get(FORCE_SHUFFLE_ENV)
    os.environ[FORCE_SHUFFLE_ENV] = "1"
    try:
        compact_minhash_index(spark, tbl, retire_ids=retire)
    finally:
        if old is None:
            os.environ.pop(FORCE_SHUFFLE_ENV, None)
        else:
            os.environ[FORCE_SHUFFLE_ENV] = old
    left = {r.doc_id for r in spark.table(tbl).select("doc_id").distinct().collect()}
    assert 3 not in left and 7 not in left
    assert left  # the other docs survived the forced-shuffle rewrite
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
