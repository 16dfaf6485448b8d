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
    "dd10_bloom_ngram_gate",  # the Bloom filter collapses to a 1-row
    # word_idx->word map aggregate broadcast over the incoming grams —
    # ~16 KiB at any corpus size (m_bits/32 words), the map-only probe
    # that makes the gate incremental; the build side cannot grow with
    # the data by construction
    "h2_equidepth_deciles",
    "h2b_approx_deciles",
    "prof1_key_skew",
    "q11_important_parts",
    "q22_global_sales_opportunity",
    "rag1_chunk_retrieval",  # bounded query-panel broadcast (sim1's
    # shape): |docs|/50 rows of dim integers crossed over the map-only
    # chunk stream; the build side is panel-bounded by construction
    "rag2_diverse_retrieval",  # same bounded query-panel cross as
    # sim1/rag1; the corpus side stays map-only and the diversity argmax
    # aggregates before the only window
    "rj1_range_join",
    "sim1_topk_cosine",
    "sim4_ivf_ann",
    "sim5_lsh_recall",
    "sim6_pq_adc",  # bounded query-panel LUT broadcast (sim1's shape);
    # the codebook cross is a 1-row build side by construction
    "sim7_ivfpq_adc",  # coarse/codebook crosses are 1-row build sides;
    # the candidate x probe join is an equi-join on cluster (sim4's shape)
    "smp6_temperature_sampling",
    "smp8_negative_pairs",
    "t9_bm25_scoring",
    "vq2_outlier_flags",
    "vq3_winsorize",
}


# Queries whose plans legitimately contain a global sort (Exchange
# rangepartitioning): TPC-H analogs whose spec mandates ordered output
# with no LIMIT. Every one sorts a GROUPED AGGREGATE (nation counts,
# shipmode rows — cardinality bounded by the group domain, not the
# fact), so the range exchange moves k rows at any data scale. A global
# sort over fact-sized input is the scale bug this list exists to catch;
# top-k queries must keep planning as TakeOrderedAndProject instead.
RANGE_SORT_WHITELIST = {
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q20_potential_promotion",
    "q22_global_sales_opportunity",
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
        if (
            "Exchange rangepartitioning" in plan
            and name not in RANGE_SORT_WHITELIST
        ):
            flags.append("global sort / rangepartitioning (not whitelisted)")
        if flags:
            offenders[name] = flags
    assert not offenders, offenders
