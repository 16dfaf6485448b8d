"""Stateful streaming operator test: state persists across micro-batches
(and across restarts via the checkpoint + state store)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphsense_ethereum_etl_spark.streaming.stateful import running_user_totals

SCHEMA = "user_id bigint, value double"


def _run(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).json(src)

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_running_user_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # run 1
    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], SCHEMA).write.json(src)
    _run(spark, src, ckpt, out)
    rows = spark.read.parquet(out).collect()
    state1 = {r["user_id"]: (r["n_events"], r["total_value"]) for r in rows}
    assert state1[1] == (2, 15.0)
    assert state1[2] == (1, 1.0)

    # run 2: new file lands; user 1 accumulates on state recovered from the
    # checkpointed state store — only updated keys are emitted (update mode)
    spark.createDataFrame([(1, 2.5), (3, 7.0)], SCHEMA).write.mode("append").json(src)
    _run(spark, src, ckpt, out)
    latest = spark.read.parquet(out)
    max_batch = latest.agg(F.max("batch_id")).collect()[0][0]
    state2 = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in latest.filter(F.col("batch_id") == max_batch).collect()
    }
    assert state2[1] == (3, 17.5)  # 2 prior events + 1 new, state carried over
    assert state2[3] == (1, 7.0)
    assert 2 not in state2  # unchanged key not re-emitted in update mode
