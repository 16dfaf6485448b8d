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

    import pytest

    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        extract_features(media, "real")


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
