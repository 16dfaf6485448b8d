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


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime row-level filtering (the 100-TB shuffle-join lever when the
    dim side carries a selective filter but is too big to broadcast): Spark
    builds a bloom filter from the filtered build side and injects a
    might_contain predicate into the probe-side scan, cutting the fact
    shuffle before it happens. Thresholds are lowered to make the tiny test
    tables eligible — on a real cluster the defaults (10 MB creation side)
    gate it to genuinely selective dims."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load(spark, sf_dir, "lineitem")
        orders = load(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Dynamic partition pruning — the reference's manual block_id_group
    restriction (eth_cassandra_streaming.py:228-243) done by Catalyst at
    runtime: a fact table partitioned on the bucket column joined against a
    filtered dim gets the dim's keys pushed into the scan's
    PartitionFilters, so only matching bucket directories are read."""
    from graphsense_ethereum_etl_spark.functions.columns import block_bucket

    li = load(spark, sf_dir, "lineitem").withColumn(
        "bucket", block_bucket("l_orderkey")
    )
    li.write.partitionBy("bucket").parquet(str(tmp_path / "li"))
    fact = spark.read.parquet(str(tmp_path / "li"))
    dim = spark.range(0, 200).select(F.col("id").alias("bucket")).filter(
        F.col("bucket") < 3
    )
    j = fact.join(dim, "bucket").groupBy("bucket").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan or "PartitionFilters: [(bucket" in plan, plan[:2000]


def test_q3_topk_plan_shape(spark, sf_dir):
    """Q3's limit must plan as TakeOrderedAndProject (heap per partition +
    driver merge, no global sort), with both dim joins broadcast."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["q3_shipping_priority"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert has_broadcast_join(df)


def test_q18_topk_plan_shape(spark, sf_dir):
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["q18_large_volume_customer"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_smp3_broadcasts_counts_not_fact(spark, sf_dir):
    """Mix rebalancing must broadcast the tiny per-source counts onto the
    fact table — the only Exchange allowed is the counts aggregation; a
    shuffled fact join would be the scale-killer."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["smp3_mix_rebalance"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan
    shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(shuffles) == 1, shuffles  # the counts groupBy only


def test_q21_single_fact_shuffle(spark, sf_dir):
    """Q21's per-order aggregate must cost ONE exchange on l_orderkey.
    A countDistinct alongside collect_set would Expand-rewrite into a
    two-level aggregate with an extra hashpartitioning(l_orderkey,
    l_suppkey) exchange — the size(collect_set) form avoids it."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["q21_suppliers_kept_waiting"].fn(spark, sf_dir)
    plan = executed_plan(df)
    bad = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
        and "l_orderkey" in ln
        and "l_suppkey" in ln
    ]
    assert not bad, bad
    orderkey_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "l_orderkey" in ln
    ]
    assert len(orderkey_exchanges) == 1, orderkey_exchanges


def test_sim3_single_signature_exchange(spark, sf_dir):
    """The LSH candidate generation must evaluate the (expensive) signature
    subplan ONCE: exactly one exchange partitioned on the band/bucket key —
    a self-join regression would show two."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["sim3_lsh_ann"].fn(spark, sf_dir)
    plan = executed_plan(df)
    band_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "band" in ln
    ]
    assert len(band_exchanges) == 1, band_exchanges


def test_rj1_scan_prunes_to_value_column(spark, sf_dir):
    """Catalyst does not prune columns through the events loader's
    ts-normalizing projection under a BroadcastNestedLoopJoin, so rj1
    projects `value` explicitly before the range join — the scan must read
    exactly one column (all six = 3.4x slower at sf0.1, linearly worse at
    scale)."""
    import re

    from graphsense_ethereum_etl_spark.plans import executed_plan
    from graphsense_ethereum_etl_spark.queries import REGISTRY

    df = REGISTRY["rj1_range_join"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    event_scans = [s for s in schemas if "value" in s]
    assert event_scans and all(s == "value:double" for s in event_scans), schemas


def test_ctm1_eval_grams_broadcast_corpus_never_shuffled(spark, sf_dir):
    """Decontamination must broadcast the (tiny) eval-gram set: the corpus
    gram stream joins via BroadcastHashJoin, and the only hash exchange in
    the plan is the final per-doc count aggregation — a corpus-side
    exchange on `gram` would mean the whole corpus shuffles at 100 TB."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["ctm1_decontamination"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan
    # the only gram-keyed exchange allowed is the EVAL side's distinct
    # (tiny, feeds the BroadcastExchange); the corpus gram stream must not
    # hash-exchange
    gram_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(gram" in ln
    ]
    assert len(gram_exchanges) <= 1, gram_exchanges
    # no corpus-sized side is broadcast: the final join builds on `hits`
    # (contaminated docs only) — cheap proxy: exactly five
    # BroadcastExchanges, all bounded: the 16-row bounded_panel eval-id
    # relation ×3 (corpus anti-join ×2 consumers + eval semi-join — r11
    # panel rework), the eval gram set, and hits; never a sixth
    assert plan.count("BroadcastExchange") == 5, plan.count("BroadcastExchange")
    # the panel selection itself is a top-n, not a global sort
    assert "TakeOrderedAndProject(limit=16" in plan


def test_lm1_single_corpus_explode_via_exchange_reuse(spark, sf_dir):
    """lm1 (r6 pre-aggregated variant): the corpus pays exactly ONE
    explode + one map-side-combined (doc_id, w1, w2) exchange at runtime;
    the bigram-count and prefix-rollup branches land on ReusedExchange
    nodes instead of re-reading the corpus (this is what the explicit
    null-normalization filter in bigram_commonness buys — without it the
    branches' canonical subtrees differ and reuse is defeated). The model
    probe on the fact stays a broadcast join."""
    df = REGISTRY["lm1_bigram_commonness"].fn(spark, sf_dir)
    df.collect()  # a noop-sink write finalizes a SEPARATE QueryExecution
    plan = df._jdf.queryExecution().executedPlan().toString()
    # inspect only AQE's FINAL plan, not the appended Initial Plan section
    final = plan.split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final
    corpus_exchanges = [
        ln
        for ln in final.splitlines()
        if "Exchange hashpartitioning(doc_id" in ln
        and "w1" in ln
        and "ReusedExchange" not in ln
    ]
    assert len(corpus_exchanges) == 1, corpus_exchanges
    assert final.count("ReusedExchange") >= 2  # bc + uc branches
    assert "BroadcastHashJoin" in final  # the fact-side model probe


def test_smp5_salted_prefilter_plan(spark, sf_dir):
    """The salted domain cap (r7) is exactly TWO hash shuffles: the first
    on (source, _salt) — the mega-domain skew splitter — and the second,
    over the ≤ S·k-per-domain candidate set, on source alone for the
    exact final rank. No text column ever crosses the wire (pruned to the
    rank inputs before the first exchange)."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["smp5_domain_cap"].fn(spark, sf_dir)
    plan = executed_plan(df)
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 2, exchanges
    # plan strings print outermost-first: sort so the salted (inner,
    # stage-1) exchange is identified by content, not line position
    salted = [ln for ln in exchanges if "_salt" in ln]
    plain = [ln for ln in exchanges if "_salt" not in ln]
    assert len(salted) == 1 and "source" in salted[0], exchanges
    assert len(plain) == 1 and "source" in plain[0], exchanges
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all("text" not in s for s in schemas), schemas


def test_lat1_decorrelates_to_windowed_topk(spark, sf_dir):
    """Catalyst must decorrelate the LATERAL top-2 subquery into a join +
    per-group window (w2's shape), not re-execute it per outer row — no
    CartesianProduct, and a Window/rank appears in the executed plan."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["lat1_lateral_topn"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_dd8_pairs_shuffle_on_cluster_only(spark, sf_dir):
    """SemDeDup's pair join must shuffle on the cluster id (blk) — the
    embedding matrix itself is never exchanged on vec-pair keys, so the
    quadratic term stays per-cluster-bounded at any corpus size."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["dd8_semdedup"].fn(spark, sf_dir)
    plan = executed_plan(df)
    blk_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "blk" in ln
    ]
    assert blk_exchanges, "expected the pair join keyed on blk"


def test_scd1_shares_one_window_exchange(spark, sf_dir):
    """Both scd1 windows use the same (user_id | ts, event_id) spec, so the
    change-point filter between them must NOT introduce a second
    exchange."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["scd1_type2_history"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_t11_frequent_lines_broadcast_back(spark, sf_dir):
    """The >= min_count boilerplate set is Heaps-bounded and must come back
    as a BROADCAST join over the exploded lines — the corpus' only hash
    exchanges are the line-frequency build and the doc_id reassembly."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["t11_line_dedup"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 2, plan[:2000]


def test_h2_has_no_global_sort(spark, sf_dir):
    """Equi-depth assignment must use the broadcast-boundaries shape, not a
    global ntile: no range-partitioned exchange anywhere in the plan."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["h2_equidepth_deciles"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_smp8_join_sides_stay_narrow(spark, sf_dir):
    """Negative sampling must never move text/embeddings: every scan reads
    only doc_id + source."""
    import re

    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["smp8_negative_pairs"].fn(spark, sf_dir)
    plan = executed_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(
        "text" not in s and "embedding" not in s for s in schemas
    ), schemas


def test_ts1_partitions_on_user_only(spark, sf_dir):
    """ts1's anchor agg, span agg, and both fill windows all ride user_id
    partitioning: hash exchanges exist only on user_id (no composite-key
    repartition, no range partitioning) and every scan prunes to the four
    columns the query touches."""
    import re

    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["ts1_resample_interpolate"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "rangepartitioning" not in plan
    for m in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        cols = {c.strip().split("#")[0] for c in m.split(",")[:-1]}
        assert cols == {"user_id"}, m
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(
        set(re.findall(r"(\w+):", s))
        <= {"user_id", "ts", "value", "event_id"}
        for s in schemas
    ), schemas


def test_smp9_weighted_sample_plan(spark, sf_dir):
    """The A-ES weighted sample must select its k rows as
    TakeOrderedAndProject (per-partition heap + driver merge of k·P
    candidates), NEVER a global range sort — and the ticket expression is
    map-only: zero hash exchanges anywhere in the plan. The scan must
    prune to the two key inputs (doc_id, n_chars); text never leaves the
    parquet footer."""
    import re

    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["smp9_weighted_sample"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all("text" not in s for s in schemas), schemas


def test_smp10_grouped_split_is_map_only(spark, sf_dir):
    """The leakage-safe split is a scalar expression per row: the executed
    plan has NO exchange of any kind and no Python worker — 100% codegen
    over the scan."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["smp10_grouped_split"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_checkpoint_partitioned_survives_aqe(spark):
    """plans/checkpoint.py's reason to exist: a repartition+localCheckpoint
    compiled under AQE loses its hash partitioning (LogicalRDD captures an
    AdaptiveSparkPlanExec whose partitioning is unknown) and every consumer
    re-shuffles the checkpointed side; checkpoint_partitioned pins it. Both
    halves asserted — the naive form DOES re-shuffle (if Spark ever fixes
    the capture, this fails and the helper can be retired), the helper
    form does NOT."""
    from pyspark.sql import functions as F

    from graphsense_ethereum_etl_spark.plans import checkpoint_partitioned

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e = spark.range(0, 5000).selectExpr("id % 997 AS s", "id AS d")
        dist = spark.range(0, 50).selectExpr("id AS v")

        naive = e.repartition("s").localCheckpoint(eager=True)
        jn = naive.join(dist, naive["s"] == dist["v"])
        pn = jn._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(s#" in pn, (
            "naive checkpoint now PRESERVES partitioning — retire "
            "checkpoint_partitioned's AQE workaround")

        pinned = checkpoint_partitioned(e, "s", eager=True)
        jp = pinned.join(dist, pinned["s"] == dist["v"])
        pp = jp._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(s#" not in pp, pp
        # AQE must be back on for the rest of the session
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        # and the join is still correct
        assert jp.count() == dist.join(e, e["s"] == dist["v"]).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_checkpoint_partitioned_rejects_no_cols(spark):
    import pytest as _pytest

    from graphsense_ethereum_etl_spark.plans import checkpoint_partitioned

    with _pytest.raises(ValueError):
        checkpoint_partitioned(spark.range(3))


def test_g5_edges_never_broadcast_or_reshuffled(spark, sf_dir, monkeypatch):
    """The r8 shuffle-byte-audit contract for the iterative family, pinned
    on g5 in the FORCED scale regime (plans/hints.py FORCE_SHUFFLE_ENV —
    what the byte audit measures, and what the gate picks once the vertex
    bound exceeds BROADCAST_MAX_ROWS): (a) NO BroadcastExchange anywhere —
    left alone Catalyst broadcast the full edge relation once per
    relaxation round (the checkpointed leaf's size estimate is bogus),
    which OOMs at scale; (b) the edge set is a checkpointed Scan
    ExistingRDD (pinned partitioning) and every per-round join is the
    hinted ShuffledHashJoin with the FRONTIER as build side."""
    from graphsense_ethereum_etl_spark.plans import executed_plan
    from graphsense_ethereum_etl_spark.plans.hints import FORCE_SHUFFLE_ENV

    monkeypatch.setenv(FORCE_SHUFFLE_ENV, "1")
    df = REGISTRY["g5_sssp_bf3"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastExchange" not in plan, plan
    assert "Scan ExistingRDD" in plan
    # >=3 in TEXT: the un-checkpointed dist lineage nests, so round k's
    # plan repeats earlier rounds' joins (execution dedups via reuse)
    assert plan.count("ShuffledHashJoin") >= 3, plan
    # the checkpointed edge side must join WITHOUT its own exchange: each
    # round exchanges only the frontier (v#...) — no Exchange keyed on the
    # edge attr s#... may appear
    edge_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(s#" in ln and "ReusedExchange" not in ln
    ]
    assert edge_exchanges == [], edge_exchanges


def test_g5_gated_regime_broadcasts_frontier_only(spark, sf_dir):
    """The size-gated DEMO regime (r9: vertex bound under
    BROADCAST_MAX_ROWS): the frontier broadcasts — but the EDGE relation
    still never moves: no hashpartitioning Exchange keyed on the edge
    attr, and the checkpointed edge scan sits OUTSIDE every broadcast
    subtree (the OOM class the r8 audit caught was edges inside a
    per-round BroadcastExchange)."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["g5_sssp_bf3"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    edge_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(s#" in ln and "ReusedExchange" not in ln
    ]
    assert edge_exchanges == [], edge_exchanges
    # every BroadcastExchange must build the FRONTIER relation: its direct
    # child is keyed on the vertex attr v# (a Filter/HashAggregate over the
    # dist lineage), never the edge relation s#/d#/w# — the OOM class the
    # r8 audit caught was the edge set as the broadcast build side. (Later
    # rounds' frontier lineage textually NESTS earlier edge joins — that's
    # plan text of the already-computed frontier, not edges moving.)
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        child = lines[i + 1]
        assert "v#" in child and "Scan ExistingRDD[s#" not in child, (
            "broadcast build side is not the frontier:\n" + plan
        )


def test_label_propagation_round_uses_pinned_edges(spark, monkeypatch):
    """label_propagation's output plan (labels are NOT checkpointed at
    rounds<=3, so the round joins are visible) must not broadcast or
    re-shuffle the checkpointed symmetrized edge set. Forced regime: the
    label side is the hinted ShuffledHashJoin build. Gated regime (small
    vertex set): the label side broadcasts instead — and the edge scan
    never sits under a BroadcastExchange in either."""
    from graphsense_ethereum_etl_spark.operators.graph import label_propagation
    from graphsense_ethereum_etl_spark.plans import executed_plan
    from graphsense_ethereum_etl_spark.plans.hints import FORCE_SHUFFLE_ENV

    edges = spark.range(0, 2000).selectExpr("id AS src", "(id % 397) AS dst")

    monkeypatch.setenv(FORCE_SHUFFLE_ENV, "1")
    plan = executed_plan(label_propagation(edges, rounds=2))
    assert "BroadcastExchange" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "Scan ExistingRDD" in plan, plan

    monkeypatch.delenv(FORCE_SHUFFLE_ENV)
    plan = executed_plan(label_propagation(edges, rounds=2))
    assert "BroadcastHashJoin" in plan, plan
    assert "Scan ExistingRDD" in plan, plan


def test_checkpoint_partitioned_aqe_toggle_is_serialized(spark):
    """r8 ADVICE (medium): the AQE set/restore window flips session-global
    conf. Concurrent checkpoint_partitioned calls must serialize on the
    exported lock — interleaved windows would otherwise restore a stale
    value and leave the session planned without AQE. 16 threads hammer the
    toggle; afterwards the conf equals its original value, every result is
    pinned-partitioned, and the lock is importable for callers who compile
    their own queries concurrently with iterative-operator setup."""
    import threading

    from graphsense_ethereum_etl_spark.plans import (
        AQE_TOGGLE_LOCK,
        checkpoint_partitioned,
    )
    from graphsense_ethereum_etl_spark.plans.checkpoint import _AQE_TOGGLE_LOCK

    assert AQE_TOGGLE_LOCK is _AQE_TOGGLE_LOCK
    assert isinstance(_AQE_TOGGLE_LOCK, type(threading.Lock()))
    key = "spark.sql.adaptive.enabled"
    spark.conf.set(key, "true")
    results, errors = [], []

    def work(i):
        try:
            df = spark.range(200).selectExpr("id % 7 AS k", "id AS v")
            results.append(checkpoint_partitioned(df, "k", eager=True))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert spark.conf.get(key) == "true"
    assert len(results) == 16
    # each checkpoint kept its hash partitioning: an aggregation on the
    # key plans no Exchange above the checkpointed scan
    plan = (
        results[0].groupBy("k").count()._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_evolving_hint_gate(spark, monkeypatch):
    """Unit contract of the size gate: under threshold → broadcast hint,
    at/over threshold or unknown bound → shuffle_hash, env force wins."""
    from graphsense_ethereum_etl_spark.plans import (
        BROADCAST_MAX_ROWS,
        evolving_hint,
    )
    from graphsense_ethereum_etl_spark.plans.hints import FORCE_SHUFFLE_ENV

    small = spark.range(10).selectExpr("id AS k", "id AS x")
    big = spark.range(10).selectExpr("id AS k", "id AS y")

    def joined_plan(hinted):
        return (
            big.join(hinted, "k")._jdf.queryExecution().executedPlan().toString()
        )

    monkeypatch.delenv(FORCE_SHUFFLE_ENV, raising=False)
    assert "BroadcastHashJoin" in joined_plan(evolving_hint(small, 100))
    assert "ShuffledHashJoin" in joined_plan(
        evolving_hint(small, BROADCAST_MAX_ROWS + 1)
    )
    assert "ShuffledHashJoin" in joined_plan(evolving_hint(small, None))
    monkeypatch.setenv(FORCE_SHUFFLE_ENV, "1")
    assert "ShuffledHashJoin" in joined_plan(evolving_hint(small, 100))


def test_rj2_is_equi_join_not_bnlj(spark, sf_dir):
    """The bucketized range join must plan as a hash/sort-merge EQUI-join
    on the grid cell — no BroadcastNestedLoopJoin anywhere (rj1's shape is
    only right while the interval side broadcasts)."""
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = REGISTRY["rj2_bucketized_range_join"].fn(spark, sf_dir)
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "_cell" in plan  # the join key is the grid cell
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_bucketized_range_join_equals_bnlj(spark):
    """Property: grid form == direct inequality join on adversarial data
    (negative points, interval boundaries on/off the grid, empty
    intervals, points outside every interval)."""
    from pyspark.sql import functions as F

    from graphsense_ethereum_etl_spark.operators.joins import (
        bucketized_range_join,
    )

    pts = spark.createDataFrame(
        [(i, v) for i, v in enumerate(
            [-130.0, -64.0, -63.9, -1.0, 0.0, 0.5, 63.9, 64.0, 65.0,
             127.9, 128.0, 500.0, 1000.0]
        )],
        "pid bigint, v double",
    )
    iv = spark.createDataFrame(
        [(0, -128.0, -60.0), (1, -10.0, 10.0), (2, 0.0, 64.0),
         (3, 64.0, 64.0), (4, 60.0, 130.0), (5, 100.0, 90.0)],
        "iid bigint, lo double, hi double",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in bucketized_range_join(pts, iv, "v", "lo", "hi", 64.0).collect()
    )
    want = sorted(
        (r.pid, r.iid)
        for r in pts.crossJoin(iv)
        .filter((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .collect()
    )
    assert got == want and got

    import pytest as _pytest

    with _pytest.raises(ValueError, match="grid"):
        bucketized_range_join(pts, iv, "v", "lo", "hi", 0)
