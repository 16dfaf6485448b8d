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


# --------------------------------------------------------------------------
# run_streaming_mv: the k8 delta rule as a continuously-maintained view
# --------------------------------------------------------------------------


def _vframe(spark, rows):
    return spark.createDataFrame(
        rows, "block_id bigint, block_id_group bigint, v bigint"
    )


def _full_mv(df):
    from pyspark.sql import functions as F

    return df.groupBy("block_id_group").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("v").cast("bigint").alias("v"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_mv_tracks_commits_and_resumes(spark, tmp_path):
    """Drain several commits (snapshot + overwrite + merge-with-deletes)
    into a maintained view, check it equals the full recompute at each
    drain, then commit more and RESUME on the same checkpoint — versions
    are applied exactly once and the view stays equal to the recompute."""
    from pyspark.sql import functions as F

    from graphsense_ethereum_etl_spark.streaming.cdf import (
        read_streaming_mv,
        run_streaming_mv,
    )

    root = str(tmp_path / "vt")
    mv_root = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    t = VersionedTable(spark, root)
    t.write_partitions(_vframe(spark, [(i, i // 10, i) for i in range(30)]))
    t.write_partitions(_vframe(spark, [(i, 1, 100 + i) for i in range(10, 20)]))

    run_streaming_mv(
        spark, root, mv_root, ["block_id_group"], ["v"], checkpoint=ckpt
    )
    assert _rows(read_streaming_mv(spark, mv_root)) == _rows(_full_mv(t.read()))

    # more commits: delete every row of group 0, update half of group 2
    cdc = (
        t.read()
        .filter(F.col("block_id_group") == 0)
        .select("block_id", "block_id_group", "v", F.lit(True).alias("d"))
        .unionByName(
            t.read()
            .filter((F.col("block_id_group") == 2) & (F.col("block_id") % 2 == 0))
            .select(
                "block_id",
                "block_id_group",
                (F.col("v") + 1000).alias("v"),
                F.lit(False).alias("d"),
            )
        )
    )
    t.merge_into(cdc, key_cols=["block_id"], delete_col="d")
    run_streaming_mv(
        spark, root, mv_root, ["block_id_group"], ["v"], checkpoint=ckpt
    )
    out = read_streaming_mv(spark, mv_root)
    assert _rows(out) == _rows(_full_mv(t.read()))
    assert not [r for r in out.collect() if r["block_id_group"] == 0]


def test_streaming_mv_replay_is_idempotent(spark, tmp_path):
    """A fresh checkpoint re-delivers EVERY version (worst-case replay);
    the pointer discipline must skip them all and leave the view
    byte-identical — the same hook-before-marker idempotence contract the
    ingest rollups carry."""
    from graphsense_ethereum_etl_spark.streaming.cdf import (
        read_streaming_mv,
        run_streaming_mv,
    )

    root = str(tmp_path / "vt")
    mv_root = str(tmp_path / "mv")
    t = VersionedTable(spark, root)
    t.write_partitions(_vframe(spark, [(i, i // 10, i) for i in range(20)]))
    t.write_partitions(_vframe(spark, [(i, 0, 7) for i in range(5)]))

    run_streaming_mv(
        spark, root, mv_root, ["block_id_group"], ["v"],
        checkpoint=str(tmp_path / "ckpt1"),
    )
    before = _rows(read_streaming_mv(spark, mv_root))
    run_streaming_mv(
        spark, root, mv_root, ["block_id_group"], ["v"],
        checkpoint=str(tmp_path / "ckpt2"),  # fresh: replays all versions
    )
    assert _rows(read_streaming_mv(spark, mv_root)) == before
    assert before == _rows(_full_mv(t.read()))


def test_streaming_mv_survives_noop_commit(spark, tmp_path):
    """A commit whose partition map is identical to its predecessor (e.g.
    an invalidate past the last partition) yields an EMPTY change feed —
    which, pre-fix, carried only (partition_col, _change_type) and
    crashed the maintainer resolving its sum columns. The MV must roll
    through it as the identity."""
    from graphsense_ethereum_etl_spark.streaming.cdf import (
        read_streaming_mv,
        run_streaming_mv,
    )

    root = str(tmp_path / "vt")
    mv_root = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    t = VersionedTable(spark, root)
    t.write_partitions(_vframe(spark, [(i, i // 10, i) for i in range(20)]))
    t.invalidate_from(99)  # no-op commit: version 2, same partitions
    assert t.history() == [1, 2]
    run_streaming_mv(
        spark, root, mv_root, ["block_id_group"], ["v"], checkpoint=ckpt
    )
    assert _rows(read_streaming_mv(spark, mv_root)) == _rows(_full_mv(t.read()))


# --------------------------------------------------------------------------
# r9 concurrency hardening (r8 VERDICT #5): interleaved MV instances and
# readers racing writers must never corrupt silently
# --------------------------------------------------------------------------


def _mv_feed(t, prev, cur):
    """The exact feed run_streaming_cdf would hand the MV for (prev, cur)."""
    from pyspark.sql import functions as F

    if prev < 0:
        return t.read_version(cur).withColumn("_change_type", F.lit("insert"))
    return t.read_changes(prev, cur)


def test_apply_mv_delta_rejects_gap_and_regression(spark, tmp_path):
    """Deterministic replay of the r8-suspected race: with the view at v1,
    applying v3's delta (prev=2) must RAISE, not silently gap the view —
    and a later replay of an older version must be a no-op skip, never a
    pointer regression."""
    from graphsense_ethereum_etl_spark.streaming.cdf import (
        apply_mv_delta,
        mv_applied_version,
        read_streaming_mv,
    )

    root, mv_root = str(tmp_path / "vt"), str(tmp_path / "mv")
    t = VersionedTable(spark, root)
    t.write_partitions(_vframe(spark, [(i, i // 10, i) for i in range(30)]))
    t.write_partitions(_vframe(spark, [(i, 1, 100 + i) for i in range(10, 20)]))
    t.write_partitions(_vframe(spark, [(i, 2, 7) for i in range(20, 25)]))
    args = dict(group_cols=["block_id_group"], sum_cols={"v": "v"})

    assert apply_mv_delta(
        spark, mv_root, _mv_feed(t, -1, 1), 1, -1, **args
    )
    with pytest.raises(RuntimeError, match="gap or double-count"):
        apply_mv_delta(spark, mv_root, _mv_feed(t, 2, 3), 3, 2, **args)
    assert mv_applied_version(mv_root) == 1  # pointer untouched by the raise

    assert apply_mv_delta(spark, mv_root, _mv_feed(t, 1, 2), 2, 1, **args)
    assert apply_mv_delta(spark, mv_root, _mv_feed(t, 2, 3), 3, 2, **args)
    # replay of an older version: skipped, pointer NEVER regresses
    assert not apply_mv_delta(spark, mv_root, _mv_feed(t, 1, 2), 2, 1, **args)
    assert mv_applied_version(mv_root) == 3
    assert _rows(read_streaming_mv(spark, mv_root)) == _rows(_full_mv(t.read()))


def test_apply_mv_delta_refuses_delta_init(spark, tmp_path):
    """A FRESH view may only initialize from a full-snapshot feed: seeding
    it with a mid-history delta would silently drop all earlier rows."""
    from graphsense_ethereum_etl_spark.streaming.cdf import apply_mv_delta

    root, mv_root = str(tmp_path / "vt"), str(tmp_path / "mv")
    t = VersionedTable(spark, root)
    t.write_partitions(_vframe(spark, [(i, i // 10, i) for i in range(20)]))
    t.write_partitions(_vframe(spark, [(i, 0, 99) for i in range(5)]))
    with pytest.raises(RuntimeError, match="uninitialized.*DELTA"):
        apply_mv_delta(
            spark, mv_root, _mv_feed(t, 1, 2), 2, 1,
            group_cols=["block_id_group"], sum_cols={"v": "v"},
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_streaming_mv_two_interleaved_instances(spark, tmp_path, seed):
    """Two run_streaming_mv instances with SEPARATE checkpoints drain the
    same table into the same mv_root concurrently (the r8 verdict's named
    race). The file lock + continuity guard make the interleaving safe:
    afterwards the view equals the full recompute and the pointer sits at
    the last version — whichever instance applied each delta."""
    import random
    import threading

    from graphsense_ethereum_etl_spark.streaming.cdf import (
        mv_applied_version,
        read_streaming_mv,
        run_streaming_mv,
    )

    rng = random.Random(7000 + seed)
    root, mv_root = str(tmp_path / "vt"), str(tmp_path / "mv")
    t = VersionedTable(spark, root)
    n_commits = rng.randint(3, 5)
    for c in range(n_commits):
        parts = rng.sample(range(3), rng.randint(1, 2))
        t.write_partitions(
            _vframe(
                spark,
                [
                    (p * 10 + i, p, rng.randint(0, 100))
                    for p in parts
                    for i in rng.sample(range(10), rng.randint(1, 5))
                ],
            )
        )

    errs = []

    def drain(tag):
        try:
            run_streaming_mv(
                spark, root, mv_root, ["block_id_group"], ["v"],
                checkpoint=str(tmp_path / f"ckpt_{tag}"), start_version=0,
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [threading.Thread(target=drain, args=(i,)) for i in range(2)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    assert mv_applied_version(mv_root) == t.history()[-1]
    assert _rows(read_streaming_mv(spark, mv_root)) == _rows(_full_mv(t.read()))


def test_vacuum_mv_keeps_published_and_drops_debris(spark, tmp_path):
    """vacuum_mv removes old generations AND crash debris newer than the
    pointer, never the published dir; the stream keeps advancing after."""
    from graphsense_ethereum_etl_spark.streaming.cdf import (
        mv_applied_version,
        read_streaming_mv,
        run_streaming_mv,
        vacuum_mv,
    )

    root, mv_root = str(tmp_path / "vt"), str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    t = VersionedTable(spark, root)
    for c in range(4):
        t.write_partitions(
            _vframe(spark, [(c * 10 + i, c % 2, i) for i in range(5)])
        )
    run_streaming_mv(
        spark, root, mv_root, ["block_id_group"], ["v"], checkpoint=ckpt,
        start_version=0,
    )
    import os

    assert mv_applied_version(mv_root) == 4
    # plant crash debris newer than the pointer
    os.makedirs(f"{mv_root}/mv-00000099")
    removed = vacuum_mv(mv_root, keep=2)
    assert sorted(removed) == ["mv-00000001", "mv-00000002", "mv-00000099"]
    left = sorted(n for n in os.listdir(mv_root) if n.startswith("mv-"))
    assert left == ["mv-00000003", "mv-00000004"]
    # the view still reads, and new commits still apply
    assert read_streaming_mv(spark, mv_root).count() > 0
    t.write_partitions(_vframe(spark, [(900 + i, 0, 1) for i in range(3)]))
    run_streaming_mv(
        spark, root, mv_root, ["block_id_group"], ["v"], checkpoint=ckpt,
    )
    assert mv_applied_version(mv_root) == 5
    assert _rows(read_streaming_mv(spark, mv_root)) == _rows(_full_mv(t.read()))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep"):
        vacuum_mv(mv_root, keep=0)


def test_vacuum_mv_noops_when_mv_root_never_created(tmp_path):
    """A drain that applied zero versions never creates mv_root —
    vacuuming it is a no-op returning [], not FileNotFoundError
    (r9 ADVICE: the old code opened {mv_root}/_MV_LOCK unconditionally)."""
    from graphsense_ethereum_etl_spark.streaming.cdf import vacuum_mv

    missing = str(tmp_path / "never-created-mv")
    assert vacuum_mv(missing, keep=2) == []
    import os

    assert not os.path.exists(missing)  # the no-op does not create it either


def test_cdf_vacuum_outrunning_the_stream_resyncs_or_raises(spark, tmp_path):
    """Grace-window violation semantics, pinned: when vacuum drops
    versions the stream has not consumed, the source emits the oldest
    SURVIVING version as a FULL-SNAPSHOT feed (prev=-1) — the vacuumed
    deltas are unrecoverable by construction, so a raw CDF consumer gets
    an explicit full resync rather than a silent gap — and the MV
    maintainer, whose view cannot absorb a snapshot as a delta, RAISES
    via its continuity guard instead of double-counting."""
    from graphsense_ethereum_etl_spark.streaming.cdf import (
        apply_mv_delta,
        run_streaming_cdf,
        run_streaming_mv,
    )

    root = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ckpt")
    mv_root = str(tmp_path / "mv")
    t = VersionedTable(spark, root)
    t.write_partitions(_vframe(spark, [(i, i // 10, i) for i in range(10)]))
    seen: dict = {}

    def h(df, v, prev):
        seen[v] = (prev, df.count())

    run_streaming_cdf(spark, root, h, checkpoint=ckpt, start_version=0)
    run_streaming_mv(
        spark, root, mv_root, ["block_id_group"], ["v"],
        checkpoint=str(tmp_path / "mvckpt"), start_version=0,
    )
    assert seen == {1: (-1, 10)}
    t.write_partitions(_vframe(spark, [(i, 0, 99) for i in range(5)]))
    t.write_partitions(_vframe(spark, [(i, 1, 7) for i in range(10, 14)]))
    t.vacuum(keep_manifests=1)  # outruns both streams' cursors
    # raw CDF: explicit full resync as the oldest surviving version
    run_streaming_cdf(spark, root, h, checkpoint=ckpt)
    assert 2 not in seen and seen[3][0] == -1
    assert seen[3][1] == t.read().count()
    # MV: the snapshot-as-delta is refused loudly (continuity guard) —
    # driven directly since foreachBatch swallows handler stacks into
    # StreamingQueryException wrappers
    from pyspark.sql import functions as F

    snap = t.read_version(3).withColumn("_change_type", F.lit("insert"))
    with pytest.raises(RuntimeError, match="gap or double-count"):
        apply_mv_delta(
            spark, mv_root, snap, 3, -1,
            group_cols=["block_id_group"], sum_cols={"v": "v"},
        )
