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


def test_streaming_first_seen_dedup_across_batches(spark, tmp_path):
    """transformWithStateInPandas operator: only the first occurrence of
    each fingerprint is ever emitted — including duplicates arriving in
    LATER micro-batches (state store carries the seen-set across runs)."""
    import pytest

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas needs protobuf on workers",
    )
    from graphsense_ethereum_etl_spark.streaming.stateful import (
        streaming_first_seen,
    )

    doc_schema = "doc_id bigint, fp string"
    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "docs_ckpt")
    out = str(tmp_path / "docs_out")

    # The operator requires (and verifies, without mutating) the RocksDB
    # state-store provider — session setup owns the conf.
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def run():
        stream = spark.readStream.schema(doc_schema).json(src)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            streaming_first_seen(stream, key_col="fp")
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: A twice (intra-batch dup) + B
    spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], doc_schema
    ).write.json(src)
    run()
    got1 = {(r["doc_id"], r["fp"]) for r in spark.read.parquet(out).collect()}
    assert {fp for _, fp in got1} == {"A", "B"}
    assert len(got1) == 2  # intra-batch duplicate suppressed

    # batch 2: cross-batch duplicate of A + new C → only C emitted
    spark.createDataFrame([(4, "A"), (5, "C")], doc_schema).write.mode(
        "append"
    ).json(src)
    run()
    got2 = {(r["doc_id"], r["fp"]) for r in spark.read.parquet(out).collect()}
    assert got2 - got1 == {(5, "C")}

    if prior is None:
        spark.conf.unset(conf_key)
    else:
        spark.conf.set(conf_key, prior)


def test_streaming_first_seen_gated_without_protobuf(spark, tmp_path):
    """In environments without protobuf the operator fails FAST with a clear
    message instead of dying inside a streaming query."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return  # environment has protobuf: the e2e test above covers it
    except ImportError:
        pass
    import pytest

    from graphsense_ethereum_etl_spark.streaming.stateful import (
        streaming_first_seen,
    )

    stream = spark.readStream.schema("doc_id bigint, fp string").json(str(tmp_path))
    with pytest.raises(NotImplementedError, match="protobuf"):
        streaming_first_seen(stream)


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: right rows match only inside the
    (left_ts - 1h, left_ts] window — the bounded-state correlation shape."""
    from graphsense_ethereum_etl_spark.streaming.structured import (
        stream_stream_interval_join,
    )

    lsrc = str(tmp_path / "l")
    rsrc = str(tmp_path / "r")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    lschema = "k bigint, ts timestamp, tx string"
    rschema = "k bigint, ts timestamp, rc string"
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "tx1"), (2, "2024-01-01 10:30:00", "tx2")],
        "k bigint, ts string, tx string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts", "tx").write.json(lsrc)
    spark.createDataFrame(
        [
            (1, "2024-01-01 09:30:00", "rc_in_window"),
            (2, "2024-01-01 08:00:00", "rc_too_old"),
            (1, "2024-01-01 10:05:00", "rc_after_left"),
        ],
        "k bigint, ts string, rc string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts", "rc").write.json(rsrc)

    joined = stream_stream_interval_join(
        spark.readStream.schema(lschema).json(lsrc),
        spark.readStream.schema(rschema).json(rsrc),
        key="k",
        max_lag="1 hour",
    ).selectExpr("l.tx AS tx", "r.rc AS rc")

    q = (
        joined.writeStream.foreachBatch(
            lambda df, _id: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["tx"], r["rc"]) for r in spark.read.parquet(out).collect()}
    assert rows == {("tx1", "rc_in_window")}
