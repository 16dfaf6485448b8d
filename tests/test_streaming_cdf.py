"""Streaming CDF: follow a versioned table's commits and consume each
version's row-level change feed (sources/vtchanges.py + streaming/cdf.py)
— the Delta "stream from a table" analog. The stream owns exactly-once
VERSION accounting via its checkpoint; the row-level feed per version is
the batch read_changes primitive, so correctness reduces to (a) the
version stream seeing each commit exactly once across restarts and (b)
feed contents equal to the direct batch call."""

from __future__ import annotations

import pytest

from graphsense_ethereum_etl_spark.streaming.cdf import run_streaming_cdf
from graphsense_ethereum_etl_spark.versioned import VersionedTable


def _frame(spark, lo, hi, tag):
    return spark.createDataFrame(
        [(i, i // 10, tag) for i in range(lo, hi)],
        "block_id bigint, block_id_group bigint, tag string",
    )


def _collect_feeds(feed_df, version, sink: dict):
    sink[version] = {
        (r["block_id"], r["tag"], r["_change_type"]) for r in feed_df.collect()
    }


def test_streaming_cdf_drains_history_and_matches_batch(spark, tmp_path):
    root = str(tmp_path / "vt")
    t = VersionedTable(spark, root)
    t.write_partitions(_frame(spark, 0, 20, "v1"))       # version 1
    t.write_partitions(_frame(spark, 10, 20, "v2"))      # version 2: bucket 1
    t.write_partitions(_frame(spark, 20, 30, "v3"))      # version 3: bucket 2 new

    feeds: dict[int, set] = {}
    run_streaming_cdf(
        spark, root, lambda df, v: _collect_feeds(df, v, feeds),
        checkpoint=str(tmp_path / "ckpt"), start_version=0,
    )
    v1, v2, v3 = VersionedTable(spark, root).history()
    assert set(feeds) == {v1, v2, v3}
    # v1: first surviving version → whole snapshot as inserts
    assert feeds[v1] == {(i, "v1", "insert") for i in range(20)}
    # v2 matches the direct batch read_changes call
    direct = {
        (r["block_id"], r["tag"], r["_change_type"])
        for r in t.read_changes(v1, v2).collect()
    }
    assert feeds[v2] == direct
    assert feeds[v2] == (
        {(i, "v1", "delete") for i in range(10, 20)}
        | {(i, "v2", "insert") for i in range(10, 20)}
    )
    # v3: a brand-new partition is pure inserts
    assert feeds[v3] == {(i, "v3", "insert") for i in range(20, 30)}


def test_streaming_cdf_checkpoint_resume_no_replay(spark, tmp_path):
    """A second invocation with the same checkpoint sees ONLY versions
    committed since the first drain — exactly-once version accounting."""
    root = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ckpt")
    t = VersionedTable(spark, root)
    t.write_partitions(_frame(spark, 0, 10, "a"))

    first: dict[int, set] = {}
    run_streaming_cdf(
        spark, root, lambda df, v: _collect_feeds(df, v, first),
        checkpoint=ckpt, start_version=0,
    )
    assert len(first) == 1

    t.write_partitions(_frame(spark, 0, 10, "b"))  # rewrite bucket 0
    second: dict[int, set] = {}
    run_streaming_cdf(
        spark, root, lambda df, v: _collect_feeds(df, v, second),
        checkpoint=ckpt, start_version=0,
    )
    assert set(second) == {t.history()[-1]}  # only the new version
    assert second[t.history()[-1]] == (
        {(i, "a", "delete") for i in range(10)}
        | {(i, "b", "insert") for i in range(10)}
    )


def test_streaming_cdf_tail_follow_skips_history(spark, tmp_path):
    """Default mode (no start_version): versions committed BEFORE the
    stream starts are not emitted — tail-follow semantics."""
    root = str(tmp_path / "vt")
    t = VersionedTable(spark, root)
    t.write_partitions(_frame(spark, 0, 10, "old"))

    feeds: dict[int, set] = {}
    run_streaming_cdf(
        spark, root, lambda df, v: _collect_feeds(df, v, feeds),
        checkpoint=str(tmp_path / "ckpt1"),
    )
    assert feeds == {}  # nothing new since stream start

    t.write_partitions(_frame(spark, 0, 10, "new"))
    run_streaming_cdf(
        spark, root, lambda df, v: _collect_feeds(df, v, feeds),
        checkpoint=str(tmp_path / "ckpt1"),
    )
    assert set(feeds) == {t.history()[-1]}


def test_streaming_cdf_across_merge_commit(spark, tmp_path):
    """The streamed feed across a merge_into commit reproduces the CDC
    batch (k7's scenario through the streaming path)."""
    root = str(tmp_path / "vt")
    t = VersionedTable(spark, root, partition_col="bucket")
    base = spark.createDataFrame(
        [(i, i // 10, "base") for i in range(30)],
        "k bigint, bucket bigint, tag string",
    )
    t.write_partitions(base)

    feeds: dict[int, set] = {}

    def grab(df, v):
        feeds[v] = {
            (r["k"], r["tag"], r["_change_type"]) for r in df.collect()
        }

    ckpt = str(tmp_path / "ckpt")
    run_streaming_cdf(
        spark, root, grab, checkpoint=ckpt, partition_col="bucket"
    )  # drains nothing (tail-follow)
    cdc = spark.createDataFrame(
        [(5, 0, "upd", False), (100, 0, "new", False), (7, 0, "x", True)],
        "k bigint, bucket bigint, tag string, is_delete boolean",
    )
    t.merge_into(cdc, key_cols=["k"], delete_col="is_delete")
    run_streaming_cdf(
        spark, root, grab, checkpoint=ckpt, partition_col="bucket"
    )
    (v,) = feeds.keys()
    assert feeds[v] == {
        (5, "base", "delete"), (5, "upd", "insert"),
        (100, "new", "insert"),
        (7, "base", "delete"),
    }


def test_vtchanges_requires_root(spark):
    from graphsense_ethereum_etl_spark.sources.vtchanges import (
        register_vtchanges,
    )

    register_vtchanges(spark)
    with pytest.raises(Exception, match="root"):
        spark.readStream.format("vtchanges").load().writeStream.format(
            "noop"
        ).trigger(availableNow=True).start().awaitTermination(60)
