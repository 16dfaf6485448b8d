"""Partitioning-preserving checkpoint for iterative algorithms.

Every iterative operator in the engine (connected components, label
propagation, PageRank, k-core, bounded SSSP) has the same hot loop: a
STATIC relation (the edge set) joined each round against a small evolving
one (labels / ranks / distances). The static side is localCheckpointed
once to truncate lineage — but the join key partitioning must survive the
checkpoint, or every round re-shuffles the full edge set: the r8
shuffle-byte audit measured g5's unpartitioned form at 49x shuffle bytes
for 10x data (three rounds x full edge re-shuffle once the frontier
outgrew AQE's broadcast threshold), where the partitioned form ships the
edges across the wire exactly once no matter the round count.

The trap (measured on Spark 4.1.2, tests/test_plans.py pins it): a
``Dataset.localCheckpoint`` wraps the CURRENT physical plan in a
LogicalRDD carrying that plan's ``outputPartitioning`` — but when the
plan is compiled under AQE, the capture point sees an
AdaptiveSparkPlanExec whose partitioning reports UNKNOWN, so
``repartition(col).localCheckpoint()`` silently drops the very property
it exists to pin, and EnsureRequirements re-shuffles at every consumer.
``checkpoint_partitioned`` therefore compiles the repartition+checkpoint
with AQE disabled FOR THAT ONE SUBPLAN (the session conf is restored
immediately; consumers still plan under AQE — the matrix test shows only
the CREATION side matters). Losing AQE for the checkpointed subplan is
free: it is a single user-specified repartition, which AQE would refuse
to coalesce anyway.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

# The AQE set/restore window below mutates SESSION-global conf. This lock
# serializes concurrent checkpoint_partitioned calls (each other's windows
# can't interleave into a lost-restore), and the window is held only for
# the one repartition+checkpoint compile. Residual caveat, documented for
# callers: an UNRELATED query compiled on another thread of the same
# SparkSession during that brief window still plans with AQE off — Spark
# has no per-thread SQLConf, so a caller that compiles queries from
# multiple threads concurrently with iterative-operator setup should
# serialize against AQE_TOGGLE_LOCK too — the public alias below is
# re-exported from plans/__init__.py for exactly that reason (r9 ADVICE).
_AQE_TOGGLE_LOCK = threading.Lock()
AQE_TOGGLE_LOCK = _AQE_TOGGLE_LOCK


def checkpoint_partitioned(
    df: DataFrame,
    *cols: str,
    num_partitions: int | None = None,
    eager: bool = True,
) -> DataFrame:
    """``df.repartition([n,] *cols).localCheckpoint(eager)`` such that the
    hash partitioning on ``cols`` SURVIVES the checkpoint: downstream
    joins/aggregations keyed on ``cols`` find the data already clustered
    and plan no Exchange for this side (pinned by test_plans.py).

    Use for the static side of an iterative join loop; the checkpoint
    truncates lineage (the quadratic-planning trap) and the preserved
    partitioning makes the loop shuffle the static relation exactly once.

    ``eager`` defaults to True, and opting out is only safe when the
    FIRST consumer is a sequential action (a per-round convergence probe,
    like connected_components' loop). In a single unrolled plan — g5's
    three relaxations, g4's two PageRank rounds — Spark submits each
    round's broadcast-future job CONCURRENTLY at kickoff, and concurrent
    first access to a lazily-persisted RDD races: every future computes
    the FULL checkpoint lineage itself before any result is cached
    (measured on g5 at the sf~1 tier: the 1 GB edge-prep scan ran once
    per round plus once per broadcast future — ~7 full rescans — while
    the shuffle meter read near-zero because broadcast exchanges never
    write shuffle files). Eager materialization runs the lineage exactly
    once, synchronously, before any consumer exists."""
    if not cols:
        raise ValueError("checkpoint_partitioned needs at least one key column")
    spark = df.sparkSession
    key = "spark.sql.adaptive.enabled"
    rep = (
        df.repartition(num_partitions, *cols)
        if num_partitions is not None
        else df.repartition(*cols)
    )
    with _AQE_TOGGLE_LOCK:
        prev = spark.conf.get(key)
        try:
            spark.conf.set(key, "false")
            # plan compilation (queryExecution.toRdd) happens INSIDE the
            # checkpoint call even for eager=False, so the AQE-off window
            # only needs to cover this statement.
            return rep.localCheckpoint(eager=eager)
        finally:
            spark.conf.set(key, prev)
