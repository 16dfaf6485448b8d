#!/usr/bin/env python
"""Sentinel-paired interleaved A/B for the sim7/sim9 suspected regression
(r13 VERDICT item 3, g12/emb1 precedent).

Variant NEW = HEAD's ivfpq_topk (post-313080c helper split).
Variant OLD = r12's monolithic `_ivfpq_build_frames` body (commit a543642),
reproduced inline below, feeding the same `_ivfpq_query_side`.

Runs are interleaved OLD,NEW,OLD,NEW,... with a CPU sentinel probe between
pairs, so co-tenant drift hits both variants equally. Prints per-variant
best/median and the paired ratios; also writes both physical plans to
plans/r14/ for diffing.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from graphsense_ethereum_etl_spark.operators.similarity import (  # noqa: E402
    _ivfpq_query_side,
    _pq_prepared,
    ivfpq_topk,
)


# -- frozen r12 Column-based helpers (deleted from the operator module when
# -- the SQL-text builders landed; kept verbatim here so the OLD variant
# -- stays the exact r12 shape) ---------------------------------------------

def _pq_quantize(vec_col: str):
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(
            (x.cast("double") + F.lit(1.0)) * F.lit(float(1 << 20))
        ).cast("long"),
    )


def _pq_subs(m: int):
    return F.sequence(F.lit(0), F.lit(m - 1))


def _ivfpq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _ivfpq_coarse_dists(xq):
    return F.transform(
        F.col("coarse"),
        lambda e: F.struct(
            _ivfpq_l2(xq, e["cent"]).alias("dist"), e["c"].alias("c")
        ),
    )


def _ivfpq_cent_of(cluster_col):
    return F.element_at(
        F.filter(F.col("coarse"), lambda e: e["c"] == cluster_col), 1
    )["cent"]


def _ivfpq_res_sub_dists(res_col, s, w: int):
    sv = F.slice(res_col, s * w + 1, w)
    return F.transform(
        F.element_at(F.col("cbs"), s + 1),
        lambda e: F.struct(
            _ivfpq_l2(sv, e["cent"]).alias("dist"), e["c"].alias("c")
        ),
    )
from graphsense_ethereum_etl_spark.queries import load  # noqa: E402
from graphsense_ethereum_etl_spark.session import get_spark  # noqa: E402


def r12_build_frames(embeddings, dim, n_clusters, m, n_codes, id_col, vec_col):
    """Verbatim r12 (a543642) monolithic build-frames body."""
    w = dim // m
    xq = _pq_quantize(vec_col)
    valid = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)

    coarse = (
        embeddings.where(valid)
        .select(
            (F.col(id_col) % n_clusters).cast("int").alias("c"),
            F.posexplode(xq).alias("pos", "xv"),
        )
        .groupBy("c", "pos")
        .agg(F.expr("sum(xv) DIV count(*)").alias("cent_p"))
        .groupBy("c")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "cent_p"))),
                lambda s: s["cent_p"],
            ).alias("cent")
        )
    )
    coarse1 = coarse.agg(
        F.array_sort(F.collect_list(F.struct("c", "cent"))).alias("coarse")
    )
    cand_res = (
        embeddings.where(valid)
        .crossJoin(F.broadcast(coarse1))
        .select(
            F.col(id_col).cast("long").alias("cand_id"),
            F.array_min(_ivfpq_coarse_dists(xq))["c"].alias("cluster"),
            xq.alias("xqv"),
            F.col("coarse"),
        )
        .select(
            "cand_id",
            "cluster",
            F.zip_with(
                F.col("xqv"), _ivfpq_cent_of(F.col("cluster")), lambda a, b: a - b
            ).alias("res"),
        )
    )
    res_tagged = cand_res.select(
        (F.col("cand_id") % n_codes).cast("int").alias("c"),
        F.posexplode("res").alias("pos", "xv"),
    )
    cb = (
        res_tagged.select(
            "c",
            (F.col("pos") / w).cast("int").alias("sub"),
            (F.col("pos") % w).alias("j"),
            "xv",
        )
        .groupBy("sub", "c", "j")
        .agg(F.expr("sum(xv) DIV count(*)").alias("cent_j"))
        .groupBy("sub", "c")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("j", "cent_j"))),
                lambda s: s["cent_j"],
            ).alias("cent")
        )
    )
    cbs = _pq_prepared(cb, m)
    cand = cand_res.crossJoin(F.broadcast(cbs)).select(
        "cluster",
        "cand_id",
        F.transform(
            _pq_subs(m),
            lambda s: F.array_min(_ivfpq_res_sub_dists(F.col("res"), s, w))["c"],
        ).alias("codes"),
    )
    return coarse, cb, cand


def main() -> None:
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark(app_name="sim79_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def sentinel() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum(id * 3 % 7)", "count(distinct id % 1024)"
        ).collect()
        return time.perf_counter() - t0

    def build(variant: str):
        emb = load(spark, sf_dir, "embeddings", spread=True)
        queries = emb.filter(F.col("vec_id") < 5)
        if variant == "new":
            return ivfpq_topk(
                emb, queries, dim=64, n_clusters=8, nprobe=2, m=8,
                n_codes=16, k=10,
            )
        frames = r12_build_frames(emb, 64, 8, 8, 16, "vec_id", "embedding")
        return _ivfpq_query_side(
            queries, *frames, dim=64, m=8, nprobe=2, k=10,
            id_col="vec_id", vec_col="embedding",
        )

    # plan capture for the diff
    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    plans_dir.mkdir(parents=True, exist_ok=True)
    for v in ("old", "new"):
        df = build(v)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (plans_dir / f"sim7_ab_{v}.txt").write_text(plan)

    def run(variant: str) -> float:
        spark.sparkContext.setJobDescription(f"ab:{variant}")
        t0 = time.perf_counter()
        build(variant).write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        spark.catalog.clearCache()
        return el

    # warmup one of each
    run("old"), run("new")
    results = {"old": [], "new": [], "sentinel": []}
    for i in range(n_pairs):
        results["sentinel"].append(round(sentinel(), 4))
        # alternate order within pairs to cancel order effects
        order = ("old", "new") if i % 2 == 0 else ("new", "old")
        for v in order:
            results[v].append(round(run(v), 4))
    out = {
        "old_best": min(results["old"]),
        "new_best": min(results["new"]),
        "old_median": statistics.median(results["old"]),
        "new_median": statistics.median(results["new"]),
        "ratio_median_new_over_old": round(
            statistics.median(results["new"]) / statistics.median(results["old"]), 4
        ),
        "pairs": results,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
