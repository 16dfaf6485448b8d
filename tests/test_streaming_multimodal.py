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
