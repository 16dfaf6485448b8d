"""Join operators beyond plain equi-joins (SURVEY.md §2.4 "absent in
reference → engine provides"): a generic as-of join and a skew-salted join.

Both are DataFrame-level compositions — no custom Catalyst rules — chosen for
their 100-TB plan shapes:

  - ``asof_join`` uses the union+window formulation: ONE shuffle on the `by`
    key, linear in |left| + |right|. The naive range-join formulation
    (l.ts >= r.ts, take max) explodes to Σ per-key |L|·|R| pair rows before
    pruning; at stream scale that is the difference between a sort and a
    cross product. Reference analog: the date→block-range lookup
    (eth_cassandra_streaming.py:199-216) is a 1-key instance of this.
  - ``salted_join`` is the standard skew mitigation when one join key is hot
    (e.g. a contract address holding 10% of all traces): the fact side gets
    a deterministic salt in [0, S), the dim side is replicated S ways, and
    the join key becomes (key, salt) — each hot key's rows spread over S
    tasks instead of one straggler. AQE's skew-join split handles moderate
    skew automatically; explicit salting is for the pathological keys AQE
    can't split (single-key partitions beyond advisory size). Results are
    exactly those of the unsalted join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    inclusive: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """As-of join. ``direction="backward"`` (default): for every left row,
    attach ``right_cols`` from the right row with the greatest
    ``right_ts`` <= (or < when ``inclusive=False``) the left row's
    ``left_ts``, matching on ``by``. ``direction="forward"``: the right
    row with the SMALLEST ``right_ts`` >= (or >) the left ts — the
    next-event lookup (next block after a timestamp, next maintenance
    window). Left rows with no matching right row keep nulls (left-join
    semantics).

    Implementation: tag and union both sides, then ONE window fill —
    ``last(struct(right_cols), ignorenulls=True)`` over
    ``partitionBy(by).orderBy(ts, tag)`` with an unbounded-preceding frame.
    Right rows get tag 0 and left rows tag 1, so at equal timestamps the
    right row is inside the frame iff ``inclusive``. One hash exchange on
    ``by``, one sort — the plan a range-join strategy would need anyway,
    without the candidate-pair blowup.

    The right columns travel as a single struct so every ``asof_*`` value
    comes from the SAME right row even when that row holds NULLs in some of
    ``right_cols`` (per-column fills could stitch values from different
    rows — the DuckDB ASOF-join oracle semantics require row-atomic fill).

    Ties inside the right table (same (by, ts)) are the caller's contract to
    resolve (pre-aggregate); the operator itself is deterministic given
    distinct right (by, ts) pairs.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward: {direction!r}")
    # Tie handling is pure tag ordering: the right row lands inside the
    # left row's frame at equal timestamps iff the join is inclusive.
    # backward looks over (unboundedPreceding, current) with last();
    # forward mirrors it over (current, unboundedFollowing) with first() —
    # which also flips which tag order means "included at a tie".
    if direction == "backward":
        rtag, ltag = (0, 1) if inclusive else (1, 0)
    else:
        rtag, ltag = (1, 0) if inclusive else (0, 1)
    r_struct_type = T.StructType([right.schema[c] for c in right_cols])
    lhs = left.select(
        F.col(by).alias("_by"),
        F.col(left_ts).alias("_ts"),
        F.lit(ltag).alias("_tag"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    rhs = right.select(
        F.col(by).alias("_by"),
        F.col(right_ts).alias("_ts"),
        F.lit(rtag).alias("_tag"),
        F.lit(None).cast(lhs.schema["_l"].dataType).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    w = W.partitionBy("_by").orderBy("_ts", "_tag")
    if direction == "backward":
        w = w.rowsBetween(W.unboundedPreceding, W.currentRow)
        fill = F.last("_r", ignorenulls=True)
    else:
        w = w.rowsBetween(W.currentRow, W.unboundedFollowing)
        fill = F.first("_r", ignorenulls=True)
    filled = lhs.unionByName(rhs).select(
        "_l",
        "_tag",
        fill.over(w).alias("_r"),
    )
    # Only left rows survive; right rows were carriers for the window state.
    out = filled.filter(F.col("_tag") == ltag).select(
        "_l.*", *[F.col(f"_r.{c}").alias(f"asof_{c}") for c in right_cols]
    )
    return out


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 8,
    fact_salt_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with the fact side salted S ways.

    The salt is ``pmod(xxhash64(fact_salt_cols), S)`` (deterministic — no
    ``rand()``, so retried tasks and the DuckDB oracle see the same rows);
    the dim side is exploded S ways via ``sequence(0, S-1)``. Equivalent to
    the plain join for any key distribution; worth the S× dim replication
    exactly when a key is hot enough to pin a whole task. Returns the fact
    columns plus the dim columns (join key deduplicated).

    Only fact-preserving join types are allowed: because the dim side is
    exploded S ways BEFORE the join, 'right'/'full' would emit unmatched dim
    rows S times — equivalence to the unsalted join holds exactly for joins
    whose output rows all originate on the fact side.
    """
    allowed = {
        "inner",
        "left",
        "left_outer",
        "leftouter",
        "left_semi",
        "leftsemi",
        "left_anti",
        "leftanti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins {sorted(allowed)}, "
            f"got how={how!r}: the exploded dim side would replicate "
            f"unmatched dim rows {num_salts}x for right/full joins"
        )
    salt_cols = list(fact_salt_cols) if fact_salt_cols else list(fact.columns)
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(num_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_fact.join(salted_dim, on=[on, "_salt"], how=how).drop("_salt")


def bucketized_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    grid: float,
) -> DataFrame:
    """Range join (point ∈ [lo, hi)) as an EQUI-join — the scale path when
    the interval side outgrows broadcast (rj1's BroadcastNestedLoopJoin
    evaluates |points|·|intervals| predicates; fine for a 10-row band dim,
    quadratic death for an interval TABLE). Each interval explodes into
    the ``grid``-width cells it overlaps; each point maps to its ONE cell;
    the join equi-matches on the cell and a residual predicate restores
    exact [lo, hi) semantics. A (point, interval) pair can only meet in
    the point's single cell, so no dedup step is needed.

    Cost: the interval side replicates by ~(interval_width / grid + 1);
    the point side never replicates. Pick ``grid`` near the TYPICAL
    interval width — too small replicates intervals, too large piles
    unrelated points into each cell's residual check (the classic
    bucketized interval-join trade, cf. Spark's own range-join hints in
    the Databricks runtime; this is the open-source expression of it).
    Both sides shuffle on the cell key — at 100 TB that is one
    co-partitioned exchange each, with AQE free to broadcast the exploded
    interval side when it measures small."""
    if grid <= 0:
        raise ValueError(f"grid must be positive, got {grid}")
    cells = intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / grid).cast("bigint"),
                F.floor(F.col(hi_col) / grid).cast("bigint"),
            )
        ),
    )
    pts = points.withColumn(
        "_cell", F.floor(F.col(point_col) / grid).cast("bigint")
    )
    return (
        pts.join(cells, "_cell")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_cell")
    )
