"""Registry-wide physical-plan audit: invariants that must hold for EVERY
registered query, not just the ones with bespoke plan asserts.

- No ``CartesianProduct``: every cross join in the codebase is a
  broadcast-of-scalar-aggregate (plans as BroadcastNestedLoopJoin); a true
  cartesian is always a bug at scale.
- No ``BatchEvalPython``: row-at-a-time Python UDFs are banned from the
  engine — Python appears only in Arrow-batched form (``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas``), per the §2.11 UDF policy.
- No UNREVIEWED explicit broadcast hints: every ``F.broadcast``/
  ``.hint("broadcast")`` in a registered query's analyzed plan must be
  whitelisted with a per-entry justification (r9 VERDICT #1). Catalyst
  obeys an explicit hint UNCONDITIONALLY — no size estimate, no AQE
  demotion — so a hint on a data-cardinality-dependent relation is a
  latent executor OOM at 100 TB (the pre-gate g5 lesson). Catalyst's OWN
  broadcast decisions (file-size statistics, AQE runtime sizes) are out
  of scope: those ARE size gates, revisable at scale. The audit reads the
  ANALYZED plan, where hints survive as ``ResolvedHint
  (strategy=broadcast)`` nodes before the optimizer consumes them.

Runs at sf0.001 — plan SHAPE is scale-independent and a handful of queries
do real work inside their builder (k5's versioned round-trip, cc1's
convergence loop), which stays cheap at the smoke scale.
"""

from __future__ import annotations

import re

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
    "rag3_rrf_hybrid",  # dense retriever is sim1's bounded query-panel
    # cross; the lexical retriever and the rank fusion are equi-joins
    "sim8_filtered_ann",  # bounded query-panel cross over the
    # PRE-FILTERED candidate scan (sim1's shape behind a pushed predicate)
    "rj1_range_join",
    "sim1_topk_cosine",
    "sim4_ivf_ann",
    "sim5_lsh_recall",
    "sim6_pq_adc",  # bounded query-panel LUT broadcast (sim1's shape);
    # the codebook cross is a 1-row build side by construction
    "sim7_ivfpq_adc",  # coarse/codebook crosses are 1-row build sides;
    # the candidate x probe join is an equi-join on cluster (sim4's shape)
    "sim9_ivfpq_refine",  # stage 1 IS sim7's plan (same 1-row codebook
    # crosses); the refine stage itself adds only equi-joins on
    # query_id/cand_id over the bounded shortlist
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


# Queries whose analyzed plans legitimately carry an explicit broadcast
# hint. Three admissible categories — the justification names which:
#
# - BOUNDED: the build side cannot grow with the data by construction
#   (a scalar/1-row aggregate, a constant-cardinality dimension like
#   nation(25)/region(5), a FIXED-SIZE query panel — bounded_panel's
#   top-N-by-hash-order or a fixed id bound; NEVER an `id % k == c`
#   fraction-of-corpus sample, which grows linearly with the data and is
#   mechanically rejected below — a k-bounded codebook / centroid set, a
#   label-domain relation, a Heaps-law-bounded vocab).
# - GATED: the hint is emitted by ``plans.hints.evolving_hint`` under a
#   MEASURED row bound — broadcast < 4M rows, shuffle_hash at-or-over,
#   FORCE_SHUFFLE_ENV flips it for the byte audit. At this audit's smoke
#   scale the gate resolves to broadcast, which is why the query appears
#   here; the shuffle regime is pinned by its own plan tests.
# - SF-DIM: a TPC-H dimension (customer/supplier/part) or a
#   dimension-cardinality aggregate. These DO scale with SF (the one
#   consciously-accepted class): dimension:fact byte ratio is ≥ ~1:30
#   rows / ~1:4000 bytes-after-pruning at every SF, so the broadcast is
#   the right plan through sf~100 (customer ≈ 15M rows ≈ 1 GB); past
#   that the documented swap is DROPPING the hint — Catalyst's file-size
#   statistics and AQE runtime sizes then gate the join, demoting to SMJ
#   exactly when the dim outgrows the threshold. A new SF-DIM entry is a
#   conscious review decision, not a default.
#
# An explicit broadcast hint on a relation that is none of these —
# |groups|-sized stats, an unbounded id set, an evolving frontier — is
# the bug class this list exists to catch (grouped_outliers' med/mad and
# compact_minhash_index's retired set were exactly that before r10 gated
# them through evolving_hint).
BROADCAST_HINT_WHITELIST = {
    "an1_grouped_outliers": "GATED: med/mad attach via evolving_hint under a measured count_distinct(group) bound",
    "apx3_freq_items": "BOUNDED: scalar support threshold + top-k frequent-item aggregate",
    "ctm1_decontamination": "BOUNDED: eval-suite gram set from a bounded_panel eval set (16 docs — a real benchmark is human-curated and bounded; r11: was corpus/97)",
    "cur1_curation_pipeline": "BOUNDED: per-source funnel aggregates — source-label domain (smp3/smp6's class), broadcast onto the per-source raw counts",
    "dd10_bloom_ngram_gate": "BOUNDED: bit-position relation from one aggregate, m_bits/32 words (~16 KiB) at any corpus size",
    "dd8_semdedup": "BOUNDED: k-bounded k-means centroid relation",
    "flagship_enrichment": "SF-DIM: customer dimension onto the orders fact",
    "fx1_fiat_conversion": "BOUNDED: exchange-rate relation, one row per day (~11k rows per 30 years)",
    "g2_two_hop": "SF-DIM: supplier dimension; nation is BOUNDED(25)",
    "g4_pagerank_2iter": "GATED: rank relation via evolving_hint under the measured 2*|e| vertex bound",
    "g5_sssp_bf3": "GATED: frontier/dist relations via evolving_hint under the measured vertex bound",
    "g7_label_propagation": "GATED: label relation via evolving_hint under the measured vertex bound",
    "g14_truss_decomposition": "GATED: dead/survivor edge relations via evolving_hint under the measured 3*|triangles| incidence bound (levels peel, never re-enumerate)",
    "h2_equidepth_deciles": "BOUNDED: 1-row decile-boundary aggregate",
    "h2b_approx_deciles": "BOUNDED: 1-row approx-percentile aggregate",
    "j1_enrich_orders": "SF-DIM: customer dimension onto the orders fact",
    "km1_kmeans": "BOUNDED: k-bounded centroid relation per Lloyd round",
    "lm1_bigram_commonness": "BOUNDED: scalar corpus-total aggregate; the bigram LM join is gated by broadcast_model (corpus.py)",
    "prof1_key_skew": "BOUNDED: 1-row table-stats aggregate",
    "q2_min_cost_supplier": "SF-DIM: supplier + part-filtered side; nation/region BOUNDED(25/5); min-cost agg is part-bounded",
    "q3_shipping_priority": "SF-DIM: segment-filtered customer dimension",
    "q7_volume_shipping": "SF-DIM: supplier/customer; the two nation sides BOUNDED(25)",
    "q8_market_share": "SF-DIM: part-filtered + supplier; nation/region BOUNDED",
    "q9_product_profit": "SF-DIM: name-filtered part + supplier; nation BOUNDED(25)",
    "q10_returned_items": "SF-DIM: customer dimension; nation BOUNDED(25)",
    "q11_important_parts": "BOUNDED: 1-row value-fraction threshold crossJoined over the grouped aggregate",
    "q14_promo_revenue": "SF-DIM: part dimension onto lineitem",
    "q15_top_supplier": "BOUNDED: 1-row max-revenue aggregate; supplier side SF-DIM",
    "q16_supplier_part_counts": "SF-DIM: complaint-filtered supplier anti-join side + filtered part",
    "q17_small_quantity_revenue": "SF-DIM: brand/container-filtered part + per-part 0.2*avg(qty) aggregate (part-bounded)",
    "q18_large_volume_customer": "SF-DIM: customer dimension; the qty>300 semi-join side is order-bounded",
    "q19_discounted_revenue": "SF-DIM: brand-filtered part dimension",
    "q20_potential_promotion": "SF-DIM: color-filtered part semi-join side + supplier; nation BOUNDED(25)",
    "q21_suppliers_kept_waiting": "SF-DIM: single-nation supplier slice; nation BOUNDED(25)",
    "q22_global_sales_opportunity": "BOUNDED: 1-row avg-balance aggregate; phone-prefix customer slice SF-DIM",
    "rag1_chunk_retrieval": "BOUNDED: bounded_panel query panel — 16 rows by hash order at any corpus size (r11: was |docs|/50)",
    "rag2_diverse_retrieval": "BOUNDED: bounded_panel query panel (16 rows); corpus side stays map-only (r11: was corpus/100)",
    "rag3_rrf_hybrid": "BOUNDED: bounded_panel query panel (16 rows) on both retrievers — dense cross + lexical shingle probe (r11: was corpus/100)",
    "sim8_filtered_ann": "BOUNDED: bounded_panel query panel (16 rows); label re-attach broadcasts the panel*k RESULT side, never the corpus (r11: was corpus/50)",
    "rj1_range_join": "BOUNDED: 1-row boundary-stats aggregate",
    "sim1_topk_cosine": "BOUNDED: fixed id-bound query panel (vec_id < 5)",
    "sim4_ivf_ann": "BOUNDED: k-bounded IVF centroid relation + query panel",
    "sim6_pq_adc": "BOUNDED: PQ codebook (k-bounded) + per-query LUT panel",
    "sim7_ivfpq_adc": "BOUNDED: coarse centroids + PQ codebooks + query panel, all k-/panel-bounded",
    "sim9_ivfpq_refine": "BOUNDED: sim7's stage-1 relations + the (queries x k_adc) ADC shortlist and query-vector relations broadcast into the exact re-rank; one corpus scan fetches candidates",
    "smp3_mix_rebalance": "BOUNDED: per-source cut relation — source-label domain",
    "smp6_temperature_sampling": "BOUNDED: per-source weight relation — source-label domain; scalar total",
    "smp8_negative_pairs": "BOUNDED: 1-row corpus-count aggregate (LCG modulus)",
    "str2_listagg": "BOUNDED: nation dimension (25 rows)",
    "t8_quality_quantile_filter": "BOUNDED: per-language threshold relation — language domain (~200)",
    "t8b_approx_quantile_filter": "BOUNDED: per-language approx threshold — language domain",
    "t9_bm25_scoring": "BOUNDED: 1-row corpus-stats (N, avgdl) aggregate",
    "t11_line_dedup": "BOUNDED: Heaps-law-bounded common-line (boilerplate) set",
    # v3_bpe_merge2 needs no entry: its 1-row rule broadcasts run inside
    # eagerly-checkpointed sub-jobs (vocab-sized merge passes), so the
    # registered plan the audit analyzes contains no hint at all.
    "v4_bpe_tokenize": "BOUNDED: 1-row merge rules + the Heaps-bounded tokenized-vocabulary relation joined back onto per-doc word counts (lm1's model-broadcast convention)",
    "vq2_outlier_flags": "BOUNDED: 1-row mean/stddev aggregate",
    "vq3_winsorize": "BOUNDED: 1-row percentile-pair aggregate",
}


_HINT_LINE = "ResolvedHint (strategy=broadcast)"
# An id-column modulo-equality filter: `Filter ((vec_id#5L % cast(50 as
# bigint)) = cast(1 as bigint))` — the signature of a fraction-of-corpus
# "panel" whose cardinality grows linearly with the data. Only *_id
# columns are matched: a modulo on a VALUE column (sim8's `label % 2`
# candidate pre-filter) is a selectivity predicate, not a panel.
_PCT_PANEL = re.compile(r"Filter \(+[a-z_]*_?id#\d+L? % (?:cast\()?\d+")


def _tree_depth(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-"))


def _broadcast_subtrees(analyzed: str) -> list[list[str]]:
    """The plan lines UNDER each broadcast hint (children are the lines
    whose tree-prefix is strictly deeper until the next sibling)."""
    lines = analyzed.splitlines()
    subs = []
    for i, ln in enumerate(lines):
        if _HINT_LINE not in ln:
            continue
        depth = _tree_depth(ln)
        sub = []
        for nxt in lines[i + 1:]:
            if _tree_depth(nxt) <= depth:
                break
            sub.append(nxt)
        subs.append(sub)
    return subs


def _has_unbounded_pct_panel(sub: list[str]) -> bool:
    """True if the hint subtree contains an id-modulo filter NOT separated
    from the hint by an Aggregate. An Aggregate ancestor means the
    broadcast carries the aggregate's (bounded) output, not the filtered
    corpus slice — dd10's Bloom words are built FROM a doc_id % 2 half
    but broadcast as a 2048-word relation; that is fine. A % filter with
    no aggregating ancestor means the filtered rows themselves broadcast
    — the corpus-proportional panel this check exists to reject."""
    for i, ln in enumerate(sub):
        if not _PCT_PANEL.search(ln):
            continue
        depth = _tree_depth(ln)
        excused = False
        for prev in reversed(sub[:i]):  # walk ancestors up to the hint
            pd = _tree_depth(prev)
            if pd < depth:
                depth = pd
                if "Aggregate" in prev:
                    excused = True
                    break
        if not excused:
            return True
    return False


def test_no_cartesian_no_row_python_udfs(spark):
    offenders: dict[str, list[str]] = {}
    hinted: set[str] = set()
    for name, q in REGISTRY.items():
        df = q.fn(spark, SMOKE_SF)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        if _HINT_LINE in analyzed:
            hinted.add(name)
            if name not in BROADCAST_HINT_WHITELIST:
                offenders.setdefault(name, []).append(
                    "explicit broadcast hint (not whitelisted — justify "
                    "BOUNDED/GATED/SF-DIM in BROADCAST_HINT_WHITELIST)"
                )
            # r10 VERDICT #1 mechanized: no whitelist wording can bless a
            # %-sampled relation as a broadcast side — a `id % k == c`
            # filter under a hint is corpus-PROPORTIONAL by construction
            # (broadcast grows linearly with the data; at 100 TB the
            # panel alone is tens of GB). Fixed-size panels select via
            # bounded_panel (hash order + LIMIT) or a fixed id bound.
            for sub in _broadcast_subtrees(analyzed):
                if _has_unbounded_pct_panel(sub):
                    offenders.setdefault(name, []).append(
                        "%-sampled (id % k == c) relation under a "
                        "broadcast hint — corpus-proportional, use "
                        "bounded_panel or a fixed id bound"
                    )
                    break
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
            offenders.setdefault(name, []).extend(flags)
    assert not offenders, offenders
    # keep the whitelist honest: an entry whose query no longer hints is
    # stale — either the hint moved behind a gate that resolved to
    # shuffle (update the justification) or the query changed (drop it)
    stale = set(BROADCAST_HINT_WHITELIST) - hinted
    assert not stale, f"stale BROADCAST_HINT_WHITELIST entries: {sorted(stale)}"


def test_pct_panel_detector_shapes(spark):
    """The %-panel detector itself: the retired rag/sim panel shape (a
    raw id-modulo slice broadcast) is flagged; the dd10 shape (an
    Aggregate between the % filter and the hint — the broadcast carries
    the bounded aggregate output) is excused."""
    from pyspark.sql import functions as F

    base = spark.range(100).select(
        F.col("id").alias("vec_id"), (F.col("id") * 2).alias("v")
    )
    offender = base.crossJoin(
        F.broadcast(base.filter(F.col("vec_id") % 10 == 0))
    )
    subs = _broadcast_subtrees(
        offender._jdf.queryExecution().analyzed().toString()
    )
    assert any(_has_unbounded_pct_panel(s) for s in subs)

    excused = base.crossJoin(
        F.broadcast(
            base.filter(F.col("vec_id") % 2 == 0)
            .groupBy((F.col("v") % 8).alias("w"))
            .agg(F.count("*").alias("c"))
        )
    )
    subs = _broadcast_subtrees(
        excused._jdf.queryExecution().analyzed().toString()
    )
    assert not any(_has_unbounded_pct_panel(s) for s in subs)
