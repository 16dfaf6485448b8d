"""Streaming change-data-feed consumption: follow a versioned table's
commits and hand each new version's ROW-LEVEL feed to a handler.

Composition (the repo's standard streaming shape — the stream owns
progress, ``foreachBatch`` reuses the batch operator):

  - ``sources/vtchanges.py`` emits one row per newly COMMITTED version,
    with the checkpointed offset giving exactly-once version accounting
    across restarts;
  - per micro-batch, each version's row-level feed comes from
    ``VersionedTable.read_changes(prev, cur)`` — the proven batch
    primitive, with its dir-identity pruning (cost = O(changed
    partitions), never O(table));
  - the handler receives (feed DataFrame, version) per version, in
    commit order. A crash mid-batch replays the whole batch on resume
    (standard foreachBatch at-least-once), so handlers must be
    idempotent per version — e.g. write to ``<out>/v=<version>`` with
    overwrite, or MERGE on a key. ``read_changes`` itself is
    deterministic for a given version pair, so replays hand the handler
    bit-identical input.

Operational contract: versions must survive until their batch commits —
``vacuum(keep_manifests=K)`` must keep K larger than the stream's worst
lag, the same grace-window rule time travel already imposes. When the
window IS violated, the failure is explicit, never a silent gap: the
source emits the oldest SURVIVING version as a full-snapshot feed
(``prev_version = -1`` — the vacuumed deltas are unrecoverable by
construction, so raw consumers get a resync they can see), and the MV
maintainer's continuity guard RAISES on it rather than double-counting
a snapshot into an initialized view (pinned by
tests/test_streaming_cdf.py::test_cdf_vacuum_outrunning_the_stream_...).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def run_streaming_cdf(
    spark: SparkSession,
    root: str,
    handler: Callable[[DataFrame, int], None],
    checkpoint: str,
    partition_col: str = "block_id_group",
    start_version: int | None = None,
    available_now: bool = True,
    timeout_s: float = 300.0,
):
    """Follow ``root``'s commits; call ``handler(feed_df, version)`` for
    each new version's row-level change feed, in commit order.

    ``start_version``: replay history from this version on (None = only
    versions committed after the stream starts — the tail-follow mode).
    ``available_now=True`` drains everything pending and stops (the
    batch-drain trigger every test and backfill uses); False runs a
    continuous micro-batch stream and returns the query handle."""
    from ..sources.vtchanges import register_vtchanges
    from ..versioned import VersionedTable

    register_vtchanges(spark)
    reader = spark.readStream.format("vtchanges").option("root", root)
    if start_version is not None:
        reader = reader.option("startVersion", str(start_version))
    events = reader.load()
    table = VersionedTable(spark, root, partition_col=partition_col)

    import inspect

    # handlers may take (feed, version) or (feed, version, prev_version):
    # prev < 0 marks a full-snapshot feed, and handlers that maintain
    # derived state (the MV apply) need that distinction to refuse
    # mid-history starts instead of silently materializing a delta-only
    # view (r9 concurrent-writer hardening).
    wants_prev = len(inspect.signature(handler).parameters) >= 3

    def on_batch(df: DataFrame, epoch_id: int) -> None:
        for r in sorted(df.collect(), key=lambda r: r["version"]):
            prev = int(r["prev_version"])
            if prev < 0:
                # first surviving version: the whole snapshot is the feed
                import pyspark.sql.functions as F

                feed = table.read_version(int(r["version"])).withColumn(
                    "_change_type", F.lit("insert")
                )
            else:
                feed = table.read_changes(prev, int(r["version"]))
            if wants_prev:
                handler(feed, int(r["version"]), prev)
            else:
                handler(feed, int(r["version"]))

    writer = (
        events.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(timeout_s)
        return q
    return writer.start()


def run_streaming_mv(
    spark: SparkSession,
    root: str,
    mv_root: str,
    group_cols: list[str],
    sum_cols: list[str] | dict[str, str],
    checkpoint: str,
    count_col: str = "cnt",
    partition_col: str = "block_id_group",
    start_version: int = 0,
    available_now: bool = True,
    timeout_s: float = 300.0,
):
    """Continuously-maintained aggregate view: follow ``root``'s commits
    and roll a COUNT/SUM materialization forward per version via
    ``versioned.incremental_aggregate`` — the streaming form of the k8
    delta rule, never rescanning the base table (each version costs one
    CDC-sized delta aggregation against the current view).

    The view lives at ``mv_root``: one immutable parquet dir per applied
    version (``mv-<version>``) plus an atomically-swapped ``_CURRENT``
    pointer (the versioned table's own tmp-file + rename discipline).
    foreachBatch is at-least-once, so the handler is made idempotent the
    same way the ingest loop's rollup hook is: a version ≤ the pointer is
    a replay and is skipped; a crash after the data write but before the
    pointer swap replays the version, which rebuilds the same dir from
    the same pointer state — the pointer only ever advances with a fully
    written view behind it.  The FIRST version needs no special case: the
    snapshot feed arrives as all-inserts and the delta rule applied to an
    empty view IS the full aggregation.

    Concurrency (r9, the r8 verdict's named race): two interleaved
    instances against one ``mv_root`` used to be able to apply version
    N+1 onto the view at N-1 and then REGRESS the pointer — silently
    losing a delta. ``apply_mv_delta`` now (a) serializes the whole
    read-pointer → aggregate → write → swap step on an advisory file
    lock inside ``mv_root`` (fcntl.flock: serializes threads AND
    processes on one host — the driver-side foreachBatch execution
    model), and (b) enforces version CONTINUITY: a feed whose
    predecessor is not exactly the applied pointer raises instead of
    applying a gapped or overlapping delta, and a fresh view refuses a
    mid-history delta feed (only a full-snapshot feed may initialize).

    Returns the streaming query handle (drained when available_now)."""
    sums = sum_cols if isinstance(sum_cols, dict) else {c: c for c in sum_cols}

    def handler(feed: DataFrame, version: int, prev_version: int) -> None:
        apply_mv_delta(
            spark,
            mv_root,
            feed,
            version,
            prev_version,
            group_cols=group_cols,
            sum_cols=sums,
            count_col=count_col,
        )

    return run_streaming_cdf(
        spark,
        root,
        handler,
        checkpoint=checkpoint,
        partition_col=partition_col,
        start_version=start_version,
        available_now=available_now,
        timeout_s=timeout_s,
    )


def mv_applied_version(mv_root: str) -> int | None:
    """Version the ``mv_root`` pointer currently publishes (None = fresh)."""
    import json as _json
    import os

    pointer = f"{mv_root}/_CURRENT"
    if not os.path.exists(pointer):
        return None
    with open(pointer) as fh:
        return int(_json.load(fh)["version"])


def apply_mv_delta(
    spark: SparkSession,
    mv_root: str,
    feed: DataFrame,
    version: int,
    prev_version: int,
    group_cols: list[str],
    sum_cols: dict[str, str],
    count_col: str = "cnt",
) -> bool:
    """Apply ONE version's change feed to the materialized view at
    ``mv_root``; returns True if applied, False if skipped as a replay.
    The unit run_streaming_mv loops — exposed module-level so the race
    tests can drive interleavings deterministically.

    The whole step (read pointer → delta-aggregate → write dir → swap
    pointer) holds an advisory lock (``_MV_LOCK`` in ``mv_root``), so
    concurrent instances serialize instead of double-applying or
    regressing the pointer; inside the lock, continuity is enforced:

    - ``version <= applied``                  → replay, skipped;
    - fresh view (``applied is None``)        → only a FULL-SNAPSHOT feed
      (``prev_version < 0``) may initialize — a delta feed would
      silently materialize a partial view;
    - ``prev_version != applied`` otherwise   → gap/overlap, raises
      (the caller replays the missing versions or rebuilds the view).
    """
    import json as _json
    import os

    from ..versioned import incremental_aggregate

    os.makedirs(mv_root, exist_ok=True)
    pointer = f"{mv_root}/_CURRENT"
    lock_path = f"{mv_root}/_MV_LOCK"
    lock_fh = open(lock_path, "a")
    try:
        try:
            import fcntl

            fcntl.flock(lock_fh, fcntl.LOCK_EX)
        except ImportError:  # non-POSIX: single-instance contract applies
            pass
        applied = mv_applied_version(mv_root)
        if applied is not None and version <= applied:
            return False  # replayed batch — the view already contains it
        if applied is None:
            if prev_version >= 0:
                raise RuntimeError(
                    f"materialized view at {mv_root} is uninitialized but "
                    f"the feed for v{version} is a DELTA (prev="
                    f"{prev_version}); initializing from it would silently "
                    "drop all earlier rows — start the stream at a version "
                    "whose feed is the full snapshot (start_version=0 or "
                    "the oldest surviving version)"
                )
            gtypes = dict(
                (f.name, f.dataType.simpleString()) for f in feed.schema.fields
            )
            schema = ", ".join(
                [f"`{g}` {gtypes[g]}" for g in group_cols]
                + [f"`{count_col}` bigint"]
                + [f"`{c}` bigint" for c in sum_cols]
            )
            prev = spark.createDataFrame([], schema)
        else:
            if prev_version != applied:
                raise RuntimeError(
                    f"materialized view at {mv_root} is at v{applied} but "
                    f"the feed for v{version} follows v{prev_version} — "
                    "applying it would gap or double-count the view; "
                    "replay the missing versions (start_version="
                    f"{applied}) or rebuild"
                )
            prev = spark.read.parquet(f"{mv_root}/mv-{applied:08d}")
        out = incremental_aggregate(
            prev, feed, group_cols=group_cols, sum_cols=sum_cols,
            count_col=count_col,
        )
        out.write.mode("overwrite").parquet(f"{mv_root}/mv-{version:08d}")
        tmp = f"{pointer}.tmp"
        with open(tmp, "w") as fh:
            _json.dump({"version": version}, fh)
        os.replace(tmp, pointer)
        return True
    finally:
        lock_fh.close()  # closing releases any flock held


def read_streaming_mv(spark: SparkSession, mv_root: str) -> DataFrame:
    """Read the current materialization written by ``run_streaming_mv``
    (raises FileNotFoundError before the first version lands)."""
    import json as _json

    with open(f"{mv_root}/_CURRENT") as fh:
        version = int(_json.load(fh)["version"])
    return spark.read.parquet(f"{mv_root}/mv-{version:08d}")


def vacuum_mv(mv_root: str, keep: int = 2) -> list[str]:
    """Delete materialization dirs older than the newest ``keep``
    generations at-or-below the published pointer — the MV's vacuum
    (every applied version leaves an immutable ``mv-<version>`` dir; a
    long-lived view accretes one per base-table commit). ``keep`` must be
    >= 1: the pointer's own dir is never removable. Dirs NEWER than the
    pointer are crash debris (a write that died before its swap) and are
    removed too — the replay rebuilds them. Holds the same advisory lock
    as apply_mv_delta so a vacuum never races an in-flight apply.
    Returns removed dir names."""
    import os
    import shutil

    if keep < 1:
        raise ValueError("keep must be >= 1: the published view dir stays")
    if not os.path.isdir(mv_root):
        # A drain that applied zero versions never creates mv_root —
        # vacuuming nothing is a no-op, not a crash (r9 ADVICE).
        return []
    lock_fh = open(f"{mv_root}/_MV_LOCK", "a")
    try:
        try:
            import fcntl

            fcntl.flock(lock_fh, fcntl.LOCK_EX)
        except ImportError:  # non-POSIX: single-instance contract
            pass
        applied = mv_applied_version(mv_root)
        if applied is None:
            return []
        removed = []
        versions = sorted(
            int(n[3:]) for n in os.listdir(mv_root)
            if n.startswith("mv-") and n[3:].isdigit()
        )
        retained = [v for v in versions if v <= applied][-keep:]
        for v in versions:
            if v in retained:
                continue
            shutil.rmtree(f"{mv_root}/mv-{v:08d}")
            removed.append(f"mv-{v:08d}")
        return removed
    finally:
        lock_fh.close()
