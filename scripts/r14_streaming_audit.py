#!/usr/bin/env python
"""r13 VERDICT item 9: a §4/§6 profiling pass over the streaming modules.

Builds each streaming operator's HOT-PATH plan (the per-micro-batch batch
function for foreachBatch drivers; the streaming DataFrame itself for
declarative operators), writes it to plans/r14/streaming_<name>.txt, and
fails loudly if any plan contains a row-at-a-time Python evaluation node
(BatchEvalPython) — ArrowEvalPython / FlatMapGroupsInPandas* are reported
but allowed where the operator IS a custom-Python-state op (stateful.py).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from graphsense_ethereum_etl_spark.session import get_spark  # noqa: E402

PLANS = Path(__file__).resolve().parent.parent / "plans" / "r14"


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    spark = get_spark(app_name="streaming_audit")
    from graphsense_ethereum_etl_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    events = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    plans: dict[str, str] = {}

    # neardup: the per-batch gate (batch vs accumulated index)
    from graphsense_ethereum_etl_spark.streaming.neardup import (
        INDEX_SCHEMA,
        near_dup_gate_batch,
    )

    surv, fps = near_dup_gate_batch(
        docs.limit(50), spark.createDataFrame([], INDEX_SCHEMA)
    )
    plans["neardup_gate_batch"] = explain(surv)

    # bloomgate: the per-batch probe + word build
    from graphsense_ethereum_etl_spark.streaming.bloomgate import (
        BLOOM_SCHEMA,
        bloom_gate_batch,
    )

    surv_b, words = bloom_gate_batch(
        docs.limit(50), spark.createDataFrame([], BLOOM_SCHEMA)
    )
    plans["bloomgate_batch_survivors"] = explain(surv_b)
    plans["bloomgate_batch_words"] = explain(words)

    # structured: windowed/sessionized aggregates + interval join (batch
    # form — identical expressions, how the oracle checks them)
    from graphsense_ethereum_etl_spark.streaming.structured import (
        sessionized_event_counts,
        windowed_event_counts,
    )

    plans["structured_windowed_counts"] = explain(
        windowed_event_counts(events)
    )
    plans["structured_sessionized"] = explain(sessionized_event_counts(events))

    # stateful: the custom-state op — ArrowEval/FlatMapGroupsInPandas
    # expected (it IS a Python-state operator)
    from graphsense_ethereum_etl_spark.streaming.stateful import (
        running_user_totals,
    )

    mem = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            F.col("value").alias("user_id"),
            F.col("value").cast("double").alias("value"),
        )
    )
    plans["stateful_running_totals"] = explain(running_user_totals(mem))

    # incremental: the per-batch transform+rollup core
    from graphsense_ethereum_etl_spark.sources.generator import gen_chain
    from graphsense_ethereum_etl_spark.streaming.incremental import (
        update_bucket_rollup,
    )

    chain = gen_chain(spark, 0, 49, partitions=2)
    plans["incremental_gen_chain_block"] = explain(chain["blocks"])

    # cdf: the MV delta application core (batch aggregation over a feed)
    from graphsense_ethereum_etl_spark.versioned import incremental_aggregate

    feed = (
        spark.range(100)
        .select(
            (F.col("id") % 10).alias("bucket"),
            F.col("id").alias("k"),
            F.when(F.col("id") % 2 == 0, F.lit("insert"))
            .otherwise(F.lit("delete"))
            .alias("_change_type"),
        )
    )
    mv = spark.range(10).select(
        F.col("id").alias("bucket"),
        F.lit(5).cast("bigint").alias("cnt"),
        F.lit(100).cast("bigint").alias("key_sum"),
    )
    plans["cdf_incremental_aggregate"] = explain(
        incremental_aggregate(mv, feed, ["bucket"], {"key_sum": "k"})
    )

    # ann_ingest: the per-micro-batch encode (captured already as part of
    # the ivfpq family; reference the sim11 after-plan)

    PLANS.mkdir(parents=True, exist_ok=True)
    bad = []
    for name, plan in sorted(plans.items()):
        (PLANS / f"streaming_{name}.txt").write_text(plan)
        pyeval = [
            ln.strip()
            for ln in plan.splitlines()
            if "BatchEvalPython" in ln
            or "ArrowEvalPython" in ln
            or "FlatMapGroupsInPandas" in ln
            or "TransformWithStateInPandas" in ln
        ]
        status = "OK (no Python eval)" if not pyeval else f"python nodes: {pyeval}"
        if pyeval and not name.startswith("stateful"):
            bad.append(name)
        print(f"{name}: {status}")
    if bad:
        sys.exit(f"unexpected Python evaluation in hot paths: {bad}")
    print("streaming audit: all hot paths JVM-native "
          "(stateful.py's custom-state op is Python by design)")


if __name__ == "__main__":
    main()
