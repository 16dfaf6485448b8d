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
lag, the same grace-window rule time travel already imposes.
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

    Returns the streaming query handle (drained when available_now)."""
    import json as _json
    import os

    from ..versioned import incremental_aggregate

    os.makedirs(mv_root, exist_ok=True)
    pointer = f"{mv_root}/_CURRENT"
    sums = sum_cols if isinstance(sum_cols, dict) else {c: c for c in sum_cols}

    def _applied() -> int | None:
        if not os.path.exists(pointer):
            return None
        with open(pointer) as fh:
            return int(_json.load(fh)["version"])

    def handler(feed: DataFrame, version: int) -> None:
        applied = _applied()
        if applied is not None and version <= applied:
            return  # replayed batch — the view already contains it
        if applied is None:
            gtypes = dict(
                (f.name, f.dataType.simpleString()) for f in feed.schema.fields
            )
            schema = ", ".join(
                [f"`{g}` {gtypes[g]}" for g in group_cols]
                + [f"`{count_col}` bigint"]
                + [f"`{c}` bigint" for c in sums]
            )
            prev = spark.createDataFrame([], schema)
        else:
            prev = spark.read.parquet(f"{mv_root}/mv-{applied:08d}")
        out = incremental_aggregate(
            prev, feed, group_cols=group_cols, sum_cols=sums, count_col=count_col
        )
        out.write.mode("overwrite").parquet(f"{mv_root}/mv-{version:08d}")
        tmp = f"{pointer}.tmp"
        with open(tmp, "w") as fh:
            _json.dump({"version": version}, fh)
        os.replace(tmp, pointer)

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


def read_streaming_mv(spark: SparkSession, mv_root: str) -> DataFrame:
    """Read the current materialization written by ``run_streaming_mv``
    (raises FileNotFoundError before the first version lands)."""
    import json as _json

    with open(f"{mv_root}/_CURRENT") as fh:
        version = int(_json.load(fh)["version"])
    return spark.read.parquet(f"{mv_root}/mv-{version:08d}")
