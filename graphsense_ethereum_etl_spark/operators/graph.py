"""Graph operators over edge-list DataFrames.

The reference stores the address graph implicitly as edge lists
(transaction/trace from_address → to_address, schema.cql:36-38,60-62) and
leaves analytics to downstream consumers; this engine operates on them
directly. Degree and k-hop are plain joins/aggs (queries g1/g2); this module
adds the iterative operator those can't express: connected components —
which is also the missing last step of every pairwise-dedup pipeline
(duplicate PAIRS → duplicate CLUSTERS → pick one canonical doc per cluster).

Implementation: minimum-label propagation. label(v) starts as v; each round
every vertex takes the min of its own and its neighbors' labels; fixpoint
after O(component diameter) rounds. Each round is one shuffle join + one
aggregation — no driver-side graph state, the only driver traffic is a
1-row convergence probe per round. ``localCheckpoint`` truncates the plan
lineage every iteration (without it, round N's plan contains N copies of
the join tree and planning time grows quadratically — the standard trap of
iterative DataFrame algorithms).

Dedup-cluster diameters are tiny (near-cliques), so rounds ≈ 2-3 in
practice; for adversarial long-chain graphs the same loop converges in
O(log n) rounds if you alternate large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce"), which this operator intentionally
skips — the simple variant is what the workload needs and is
oracle-checkable against a DuckDB recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every vertex in ``edges``; component = the
    minimum vertex id reachable from it. Isolated vertices don't appear
    (no edge rows) — union them in upstream if needed."""
    e = edges.select(
        F.col(src).cast("bigint").alias("s"), F.col(dst).cast("bigint").alias("d")
    )
    sym = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    sym = sym.localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("s").alias("v")).distinct().withColumn("label", F.col("v"))
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["d"] == labels["v"])
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["v"] == nbr_min["s"], "left")
            .select(
                labels["v"],
                F.least(
                    labels["label"], F.coalesce(F.col("nbr_label"), labels["label"])
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("v").alias("id"), F.col("label").alias("component"))
