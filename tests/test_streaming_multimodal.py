"""Structured Streaming (availableNow file stream → foreachBatch transform →
partitioned parquet) and multimodal mapInPandas plumbing tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphsense_ethereum_etl_spark.operators.multimodal import (
    attach_media_columns,
    extract_features,
)
from graphsense_ethereum_etl_spark.operators.pipelines import transform_blocks
from graphsense_ethereum_etl_spark.schemas import RAW_BLOCK
from graphsense_ethereum_etl_spark.sources.generator import gen_blocks
from graphsense_ethereum_etl_spark.streaming.structured import (
    run_stream_to_parquet,
    stream_raw_blocks,
    windowed_event_counts,
)


def test_stream_ingest_available_now(spark, tmp_path):
    raw_dir = str(tmp_path / "raw")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    gen_blocks(spark, 0, 99, partitions=4).write.parquet(raw_dir)

    q = run_stream_to_parquet(
        stream_raw_blocks(spark, raw_dir, RAW_BLOCK),
        sink,
        ckpt,
        transform=transform_blocks,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 100
    assert "block_id_group" in out.columns

    # second availableNow run with the same checkpoint: no new files → no dupes
    q2 = run_stream_to_parquet(
        stream_raw_blocks(spark, raw_dir, RAW_BLOCK), sink, ckpt, transform=transform_blocks
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 100


def test_windowed_event_counts_batch_equivalence(spark, sf_dir):
    from graphsense_ethereum_etl_spark.queries import load

    ev = load(spark, sf_dir, "events")
    streamed_expr = windowed_event_counts(ev, watermark="0 seconds")
    direct = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    a = {(r[0], r[1]): r[2] for r in streamed_expr.collect()}
    b = {(r[0], r[1]): r[2] for r in direct.collect()}
    assert a == b


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None)], "id bigint, txt string"
    )
    media = attach_media_columns(
        df.withColumn("payload", F.encode("txt", "utf-8")), "id", "payload", mime="text/plain"
    )
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "meta"]
    feats = {r["media_id"]: r for r in extract_features(media, "fake").collect()}
    assert feats[1]["n_bytes"] == 11
    assert feats[1]["width"] == 16 + 11 % 64
    assert feats[2]["n_bytes"] == 0
    assert feats[3]["n_bytes"] == 0  # null payload → empty bytes

    # real extractor over non-media payloads: per-row degradation to null
    # dims (never a stage failure) — real decode itself is covered in
    # tests/test_codecs.py
    real = {r["media_id"]: r for r in extract_features(media, "real").collect()}
    assert real[1]["n_bytes"] == 11
    assert real[1]["width"] is None and real[1]["n_frames"] is None


def test_resize_media_plumbing(spark, sf_dir):
    from graphsense_ethereum_etl_spark.operators.multimodal import (
        attach_media_columns,
        resize_media,
    )
    from graphsense_ethereum_etl_spark.queries import load

    docs = load(spark, sf_dir, "documents").limit(20)
    media = attach_media_columns(docs, "doc_id", "text")
    out = resize_media(media, width=8, height=4)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r["content"]) == 32 for r in rows)
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 4 for r in rows)


def test_sample_frames_expands_rows(spark, sf_dir):
    from graphsense_ethereum_etl_spark.operators.multimodal import (
        attach_media_columns,
        sample_frames,
    )
    from graphsense_ethereum_etl_spark.queries import load

    docs = load(spark, sf_dir, "documents").limit(10)
    media = attach_media_columns(docs, "doc_id", "text")
    out = sample_frames(media, every_n_bytes=16, max_frames=4)
    rows = out.collect()
    assert len(rows) >= 10  # expansion happened
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_index"])
    for idxs in by_id.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense, ordered
        assert len(idxs) <= 4


def test_ethrpc_stream_rate_limited_catchup(spark, tmp_path):
    """r2 verdict #9 — maxBlocksPerBatch: a stream facing N pending blocks
    drains them in ceil(N / cap) bounded micro-batches with checkpointed
    resume intact (each availableNow run is one micro-batch — Python
    sources fall back to single-batch execution — so the run loop IS the
    restart path: every batch after the first resumes from the checkpoint),
    never emitting duplicates, and keeps honoring the cap when the head
    advances later."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_sources_sinks import _make_fixture_node_post

    from graphsense_ethereum_etl_spark.sources.datasource import register_ethrpc

    register_ethrpc(spark, post=_make_fixture_node_post())
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(end):
        q = (
            spark.readStream.format("ethrpc")
            .option("start", "0")
            .option("end", str(end))
            .option("batch", "5")
            .option("maxBlocksPerBatch", "10")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        df = spark.read.parquet(out)
        return df.count(), df.select("number").distinct().count()

    # 25 pending blocks (0..24), cap 10 → exactly ceil(25/10) = 3 batches
    counts = [run(24) for _ in range(4)]
    assert counts[0] == (10, 10)   # batch 1: blocks 0..9
    assert counts[1] == (20, 20)   # batch 2 (resumed from checkpoint): 10..19
    assert counts[2] == (25, 25)   # batch 3: 20..24 (remainder < cap)
    assert counts[3] == (25, 25)   # caught up: empty batch, no duplicates

    # head advances by 15 → first catch-up batch is capped at 10 again
    assert run(39) == (35, 35)
    assert run(39) == (40, 40)

    # guard: a nonsensical cap fails fast
    import pytest

    with pytest.raises(Exception, match="maxBlocksPerBatch"):
        (
            spark.readStream.format("ethrpc")
            .option("start", "0")
            .option("end", "5")
            .option("maxBlocksPerBatch", "0")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )


def test_sliding_window_stream_matches_batch(spark, sf_dir, tmp_path):
    """SLIDING windows through a real stream: events replayed as a file
    stream (availableNow, complete-mode aggregation) must produce exactly
    the batch sliding aggregation (= win2's oracle shape)."""
    from graphsense_ethereum_etl_spark.queries import load

    ev = load(spark, sf_dir, "events").select("ts", "event_type")
    src = str(tmp_path / "events_src")
    ev.write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema).parquet(src)
    )
    agg = windowed_event_counts(
        stream, window="10 minutes", slide="5 minutes", watermark="0 seconds"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)

    batch = windowed_event_counts(
        ev, window="10 minutes", slide="5 minutes", watermark="0 seconds"
    )
    got = {
        (r["window_start"], r["event_type"]): r["cnt"]
        for r in spark.sql("select * from slide_agg").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["cnt"] for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_session_window_stream_matches_batch(spark, sf_dir, tmp_path):
    """SESSION windows through a real stream (append mode — the only mode
    that can finalize merging session state): events replayed as a file
    stream in two micro-batches, followed by a far-future sentinel event
    that drives the watermark past every real session so the no-data flush
    batch emits them all. The emitted set must EQUAL the batch
    session_window aggregation (= win3's oracle shape)."""
    from graphsense_ethereum_etl_spark.queries import load
    from graphsense_ethereum_etl_spark.streaming.structured import (
        sessionized_event_counts,
    )

    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    src = str(tmp_path / "events_src")
    ev.coalesce(1).write.parquet(src)
    # sentinel: one event a day past the stream's max ts; watermark(0s)
    # lands beyond every real session's end (last event + 10 min)
    sentinel = ev.agg(F.max("ts").alias("m")).select(
        F.lit(-1).cast("bigint").alias("user_id"),
        (F.col("m") + F.expr("INTERVAL 1 DAY")).alias("ts"),
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = sessionized_event_counts(stream, gap="10 minutes")
    sink = str(tmp_path / "sessions_out")
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.read.parquet(sink).filter("user_id >= 0").collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in sessionized_event_counts(ev, gap="10 minutes").collect()
    }
    assert len(got) > 0
    assert got == want


def test_drop_duplicates_within_watermark_stream(spark, tmp_path):
    """Native bounded-state streaming dedup: duplicates planted across two
    micro-batches inside the watermark window are dropped; the first
    occurrence of each key survives."""
    from graphsense_ethereum_etl_spark.streaming.structured import (
        dedup_stream_within_watermark,
    )

    src = str(tmp_path / "dup_src")
    schema = "k bigint, ts string, payload string"

    def frame(rows):
        return spark.createDataFrame(rows, schema).selectExpr(
            "k", "CAST(ts AS TIMESTAMP) AS ts", "payload"
        )

    b1 = frame(
        [
            (1, "2024-01-01 00:00:00", "first-1"),
            (2, "2024-01-01 00:00:10", "first-2"),
            (1, "2024-01-01 00:00:20", "dup-1-same-batch"),
        ]
    )
    b1.coalesce(1).write.parquet(src)
    b2 = frame(
        [
            (2, "2024-01-01 00:05:00", "dup-2-next-batch"),
            (3, "2024-01-01 00:05:10", "first-3"),
        ]
    )
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    deduped = dedup_stream_within_watermark(stream, ["k"], watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = {r["k"]: r["payload"] for r in spark.sql("select * from wm_dedup").collect()}
    assert rows == {1: "first-1", 2: "first-2", 3: "first-3"}
