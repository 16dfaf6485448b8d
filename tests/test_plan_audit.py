"""Registry-wide physical-plan audit: invariants that must hold for EVERY
registered query, not just the ones with bespoke plan asserts.

- No ``CartesianProduct``: every cross join in the codebase is a
  broadcast-of-scalar-aggregate (plans as BroadcastNestedLoopJoin); a true
  cartesian is always a bug at scale.
- No ``BatchEvalPython``: row-at-a-time Python UDFs are banned from the
  engine — Python appears only in Arrow-batched form (``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas``), per the §2.11 UDF policy.

Runs at sf0.001 — plan SHAPE is scale-independent and a handful of queries
do real work inside their builder (k5's versioned round-trip, cc1's
convergence loop), which stays cheap at the smoke scale.
"""

from __future__ import annotations

from graphsense_ethereum_etl_spark.queries import REGISTRY

SMOKE_SF = "/root/testdata/sf0.001"


# Queries whose plans legitimately contain BroadcastNestedLoopJoin: every
# one is the broadcast-of-a-SCALAR-AGGREGATE pattern (a 1-row stats/
# threshold/boundary relation crossJoined back over the fact — rj1's
# audited shape). A BNLJ whose build side can grow with the data is a
# scale bug; adding a query here is a conscious review decision, not a
# default.
BNLJ_WHITELIST = {
    "apx1_approx_distinct",
    "apx3_freq_items",
    "h2_equidepth_deciles",
    "h2b_approx_deciles",
    "prof1_key_skew",
    "q11_important_parts",
    "q22_global_sales_opportunity",
    "rj1_range_join",
    "sim1_topk_cosine",
    "sim4_ivf_ann",
    "sim5_lsh_recall",
    "smp6_temperature_sampling",
    "smp8_negative_pairs",
    "t9_bm25_scoring",
    "vq2_outlier_flags",
    "vq3_winsorize",
}


def test_no_cartesian_no_row_python_udfs(spark):
    offenders: dict[str, list[str]] = {}
    for name, q in REGISTRY.items():
        df = q.fn(spark, SMOKE_SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            flags.append("BatchEvalPython (row-at-a-time UDF)")
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in BNLJ_WHITELIST
        ):
            flags.append("BroadcastNestedLoopJoin (not whitelisted)")
        if flags:
            offenders[name] = flags
    assert not offenders, offenders
