#!/usr/bin/env python
"""One-off sf~1 scale probe (r6 verdict stretch #8): the lm1 lesson was
that constant factors invisible at sf0.1 only surface one tier up, so this
script replicates the sf0.1 tables 10x — with deterministic DECORRELATING
perturbations, see below — into a scratch dir OUTSIDE /root/testdata (it is
a bench-only artifact, never an oracle input), then times the slowest
registry queries there vs sf0.1 in the same session and prints a markdown
table for SCALE.md.

Replication must not change the workload's SHAPE, only its size:

- ``documents``: doc_id shifted per replica; ~1/3 of tokens (chosen by
  xxhash64(token, rep)) get a per-replica suffix. Within-replica duplicate
  structure is preserved exactly (the same rewrite applies to byte-equal
  texts), while cross-replica shingle Jaccard drops to ~0.2 — below every
  pair threshold — so dedup pair counts scale ~10x, not ~45x as verbatim
  copies would (every verbatim copy pairs with every other).
- ``embeddings``: vec_id shifted; dimensions circularly rotated by a
  per-replica offset — norms and the per-replica cluster structure are
  untouched, while cross-replica cosine decorrelates, so ANN candidate
  sets scale linearly instead of exploding on 10-deep exact-dup buckets.
- ``orders`` / ``lineitem``: all join keys shifted by the same per-replica
  offset, so each replica is a disjoint, internally-consistent sub-relation
  (graph queries see 10x vertices with identical per-component structure;
  iteration counts stay comparable — noted in SCALE.md).

Usage: python scripts/sf1_scale_probe.py [n_queries] (default 15).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from graphsense_ethereum_etl_spark.queries import REGISTRY  # noqa: E402
from graphsense_ethereum_etl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF1_PROBE_DIR", "/tmp/sf1_probe")
REPS = 10
SHIFT = 10_000_000
EMB_DIM = 64

# per-table bigint key columns to shift per replica (disjoint id spaces,
# bucket distributions preserved)
KEY_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}


def _perturb(df, table, rep):
    out = df
    for c in KEY_COLS[table]:
        out = out.withColumn(c, F.col(c) + F.lit(rep * SHIFT))
    if rep == 0:
        return out
    if table == "documents":
        toks = F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+")
        renamed = F.array_join(
            F.transform(
                toks,
                lambda t: F.when(
                    F.pmod(F.xxhash64(t, F.lit(rep)), F.lit(3)) == 0,
                    F.concat(t, F.lit(f"_r{rep}")),
                ).otherwise(t),
            ),
            " ",
        )
        out = out.withColumn("text", renamed).withColumn(
            "n_chars", F.length("text").cast("bigint")
        )
    elif table == "embeddings":
        off = (rep * 7) % EMB_DIM
        out = out.withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
                lambda i: F.element_at(
                    "embedding", (F.pmod(i + F.lit(off), F.lit(EMB_DIM)) + 1).cast("int")
                ),
            ),
        )
    return out


def build(spark):
    os.makedirs(DST, exist_ok=True)
    for table in KEY_COLS:
        dst = f"{DST}/{table}.parquet"
        if os.path.exists(dst):
            continue
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = [_perturb(src, table, rep) for rep in range(REPS)]
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        full.repartition(32).write.mode("overwrite").parquet(dst + ".tmp")
        os.replace(dst + ".tmp", dst)
        print(f"built {table}: {spark.read.parquet(dst).count()} rows",
              file=sys.stderr)
    # remaining tables: symlink the sf0.1 originals so any query that loads
    # a dimension (nation etc.) still resolves
    for entry in os.listdir(SRC):
        link = f"{DST}/{entry}"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{entry}", link)


def time_query(spark, name, sf_dir):
    def _drop_persisted():
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd_id in list(jmap.keySet().toArray()):
            jmap.get(rdd_id).unpersist()

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
        _drop_persisted()
    return round(best, 3)


# Probed every round regardless of bench rank: the two Jaccard
# formulations ride together so the in-memory variant's candidate-growth
# trajectory and its bucketed swap-in stay side by side in SCALE.md
# (VERDICT r7 item 2).
ALWAYS_PROBE = [
    "dd2_ngram_jaccard",
    "dd2b_ngram_jaccard_bucketed",
    # r10-verdict #6: the r10 newcomers had byte rows (SHUFFLE_r10) but
    # no sf~1 wall ratios — seat them until displaced by rank
    "dd12_winnowing_pairs",
    "u2_uint256_grouped_stats",
    "sim8_filtered_ann",
    "rag3_rrf_hybrid",
    "g12_edge_support",
    # r10-verdict #1 done-criterion: the retrieval panels are now
    # bounded_panel (16 rows at any corpus size) — rag1/rag2's ratios
    # must come back to ~linear (the panel was the super-linear term)
    "rag1_chunk_retrieval",
    "rag2_diverse_retrieval",
    # r11 newcomers (r11-verdict #7: first readings g13 3.0x wall /
    # k11 1.5x bytes — keep on the board; dd12 7.6x is the closest-to-
    # linear wall in the dedup family: winnowing selection is map-only,
    # adjudicate if it crosses linear)
    "g13_ktruss_peel2",
    "ctm1_decontamination",
    "k11_asof_catalog_read",
    # r12 newcomers: first wall ratios
    "g14_truss_decomposition",
    "v3_bpe_merge2",
    "v4_bpe_tokenize",
    "k12_asof_timestamp_read",
    # r13 newcomers: the persisted-ANN lifecycle (build+add+search) and
    # its streaming drain — index build dominates both; adds are
    # batch-sized by design, so the ratio should track the build's
    "sim10_ivfpq_add_probe",
    "sim11_streaming_ann_ingest",
    "sim12_ivfpq_index_stats",
    "cur1_curation_pipeline",
]


def time_dd2b_reuse(spark, sf_dir: str, tag: str) -> float:
    """dd2b's AMORTIZED path (r8 VERDICT #4): build the bucketed prefix/
    sets index once UNTIMED, then time the query against the standing
    index (reuse_existing=True — zero index shuffle, the per-run cost at
    100 TB where the index is built once and every dedup run / incremental
    batch re-joins it)."""
    from graphsense_ethereum_etl_spark.operators.dedup import (
        ngram_jaccard_pairs_bucketed,
    )
    from graphsense_ethereum_etl_spark.queries import load

    docs = load(spark, sf_dir, "documents", spread=True)
    table = f"dd2b_reuse_{tag}"
    ngram_jaccard_pairs_bucketed(
        spark, docs, table=table, num_buckets=8, threshold=0.5
    ).write.mode("overwrite").format("noop").save()  # build, untimed
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        ngram_jaccard_pairs_bucketed(
            spark, docs, table=table, num_buckets=8, threshold=0.5,
            reuse_existing=True,
        ).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main():
    """Since r8 this is part of the per-round bench protocol, not a
    one-off (VERDICT r7 item 3): the run writes a round-stamped
    SCALE_r{N}.json next to BENCH_r{N}.json so superlinear constants are
    caught the round they appear. N = latest CORRECTNESS round + 1 (the
    round in progress)."""
    import glob
    import re

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    repo = Path(__file__).resolve().parent.parent
    base = json.load(open(repo / "BENCH_full_latest.json"))
    slow = [k for k, _ in sorted(base["queries"].items(),
                                 key=lambda kv: -kv[1])[:n]]
    for extra in ALWAYS_PROBE:
        if extra not in slow and extra in REGISTRY:
            slow.append(extra)
    spark = get_spark(app_name="sf1-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    build(spark)
    rows = []
    for name in slow:
        t01 = time_query(spark, name, SRC)
        t1 = time_query(spark, name, DST)
        rows.append((name, t01, t1, round(t1 / t01, 1)))
        print(f"{name:32s} sf0.1 {t01:7.2f}s   sf1 {t1:7.2f}s   x{t1/t01:5.1f}",
              file=sys.stderr)
    # dd2b's amortized second-run path rides every probe (r8 VERDICT #4)
    t01 = time_dd2b_reuse(spark, SRC, "p01")
    t1 = time_dd2b_reuse(spark, DST, "p1")
    rows.append(("dd2b_reuse", t01, t1, round(t1 / t01, 1)))
    print(f"{'dd2b_reuse':32s} sf0.1 {t01:7.2f}s   sf1 {t1:7.2f}s   x{t1/t01:5.1f}",
          file=sys.stderr)
    print("| query | sf0.1 s | sf~1 s | ratio |")
    print("|---|---|---|---|")
    for name, t01, t1, r in rows:
        print(f"| {name} | {t01:.2f} | {t1:.2f} | {r:.1f}x |")
    print(json.dumps({"rows": rows}))
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(str(repo / "CORRECTNESS_r*.json"))
    ]
    rnd = max(rounds, default=0) + 1
    stamp = {
        "round": rnd,
        "base_sf": 0.1,
        "replicas": REPS,
        "n_slowest": n,
        "always_probe": ALWAYS_PROBE,
        "queries": {
            name: {"sf0_1_sec": t01, "sf1_sec": t1, "ratio": r}
            for name, t01, t1, r in rows
        },
    }
    with open(repo / f"SCALE_r{rnd:02d}.json", "w") as f:
        json.dump(stamp, f, indent=1)
        f.write("\n")
    print(f"wrote SCALE_r{rnd:02d}.json", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
