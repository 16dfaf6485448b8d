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
