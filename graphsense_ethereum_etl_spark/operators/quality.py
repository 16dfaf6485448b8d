"""Declarative data-quality constraint checking (the Deequ/dbt-test role,
engine-side): a rule set compiles into ONE aggregation pass over the table —
every rule becomes a conditional-count column, so checking N rules costs one
map-side-combined scan regardless of N, and the report is a tiny
rules-sized relation.

Rule forms (all pure Catalyst expressions):
  {"rule": "not_null",  "col": c}
  {"rule": "unique",    "col": c}              # needs one extra distinct agg
  {"rule": "in_range",  "col": c, "lo": x, "hi": y}   # inclusive
  {"rule": "in_set",    "col": c, "values": [...]}
  {"rule": "matches",   "col": c, "pattern": regex}

Scale: the single pass is the floor for exact checking; `unique` adds a
count_distinct (HLL `approx_count_distinct` is the documented swap when an
approximate uniqueness signal suffices). No shuffle carries row data — only
the per-rule counters move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation_expr(rule: dict) -> Column:
    kind = rule["rule"]
    c = F.col(rule["col"])
    if kind == "not_null":
        return c.isNull()
    if kind == "in_range":
        return c.isNull() | (c < rule["lo"]) | (c > rule["hi"])
    if kind == "in_set":
        return c.isNull() | ~c.isin(list(rule["values"]))
    if kind == "matches":
        return c.isNull() | ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown rule kind: {kind}")


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """One row per rule: (rule, col, n_rows, n_violations, passed).

    All non-`unique` rules fold into a single aggregation; `unique` rules
    ride the same pass as count_distinct columns (violations = n_rows −
    n_distinct − n_nulls... uniqueness here counts NULLs as violations,
    matching SQL UNIQUE + NOT NULL expectations for key columns).
    """
    if not rules:
        # An empty rule set is a valid (vacuously passing) gate: return an
        # empty report with the full schema rather than IndexError-ing —
        # the CLI validate path hits this with an empty rules.json.
        return df.sparkSession.createDataFrame(
            [],
            "rule string, col string, n_rows bigint, "
            "n_violations bigint, passed boolean",
        )
    aggs = [F.count("*").cast("bigint").alias("_n")]
    names: list[tuple[str, str]] = []
    for i, rule in enumerate(rules):
        if rule["rule"] == "unique":
            aggs.append(
                F.count_distinct(F.col(rule["col"]))
                .cast("bigint")
                .alias(f"_d{i}")
            )
        else:
            aggs.append(
                F.sum(F.when(_violation_expr(rule), 1).otherwise(0))
                .cast("bigint")
                .alias(f"_v{i}")
            )
        names.append((rule["rule"], rule["col"]))
    row = df.agg(*aggs)
    reports = []
    for i, (kind, col) in enumerate(names):
        if kind == "unique":
            # violations = n − count_distinct: every occurrence of a value
            # beyond its first, PLUS every null row (count_distinct skips
            # nulls, so null rows all land in the difference) — SQL
            # UNIQUE + NOT NULL key expectations in one number.
            viol = F.col("_n") - F.col(f"_d{i}")
        else:
            # SUM over zero rows is NULL, not 0 — without the coalesce an
            # EMPTY table reports n_violations=NULL / passed=NULL, and a
            # gate keyed on `passed` treats a vacuously-clean table as
            # failing (or, worse, NULL-propagates the whole report).
            viol = F.coalesce(F.col(f"_v{i}"), F.lit(0).cast("bigint"))
        reports.append(
            row.select(
                F.lit(kind).alias("rule"),
                F.lit(col).alias("col"),
                F.col("_n").alias("n_rows"),
                viol.cast("bigint").alias("n_violations"),
                (viol == 0).alias("passed"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One-pass column profiler (the Deequ ColumnProfiler / dbt source-
    freshness role): per column, row count, NULL count, distinct count,
    and — for string columns — mean length. Output is one row per column:
    (column, n_rows, n_nulls, n_distinct, avg_len), the summary a pipeline
    inspects before trusting a new drop of data.

    ALL columns profile in ONE aggregation over ONE scan: every statistic
    is an agg expression on the same pass, and the per-column rows are
    unpacked from the single wide result row driver-side (an inline
    explode of a literal-sized struct array — no second job, no shuffle
    of row data; only the counter values move).

    ``exact_distinct=True`` uses COUNT(DISTINCT col) — with several
    columns Catalyst plans the multi-distinct via Expand (the scan's rows
    replicated once per distinct column). That is the exact-answer floor;
    at 100-TB scale pass ``exact_distinct=False`` to swap in
    ``approx_count_distinct`` (HLL): the Expand disappears and the whole
    profile is one map-side-combinable pass with constant-size state.
    NULL handling follows SQL aggregate semantics everywhere: COUNT(col)
    skips NULLs (n_nulls = n_rows − that), DISTINCT ignores NULLs, and
    AVG(LENGTH(col)) averages over non-NULL values only (NULL when the
    column is entirely NULL or the table is empty)."""
    from pyspark.sql.types import StringType

    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    is_str = {
        c: isinstance(df.schema[c].dataType, StringType) for c in cols
    }
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"_nn_{i}"))
        aggs.append(distinct(F.col(c)).cast("bigint").alias(f"_nd_{i}"))
        if is_str[c]:
            aggs.append(
                F.round(F.avg(F.length(F.col(c))), 6).alias(f"_al_{i}")
            )
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{i}")).cast("bigint").alias("n_nulls"),
            F.col(f"_nd_{i}").alias("n_distinct"),
            (
                F.col(f"_al_{i}")
                if is_str[c]
                else F.lit(None).cast("double")
            ).alias("avg_len"),
        )
        for i, c in enumerate(cols)
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def grouped_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 5.0,
    exact: bool = True,
    accuracy: int = 10000,
    n_groups_bound: int | None = None,
) -> DataFrame:
    """Robust per-group outlier flags — median/MAD, the z-score that
    doesn't break on the outliers it hunts (an1's operator form): every
    input row comes back with its group's ``med`` and ``mad`` attached
    and ``is_outlier = |x − med| > k·mad``. NULL values are never
    outliers (no evidence either way); NULL groups form their own
    stratum.

    ``exact=True`` uses Spark's exact ``percentile`` (group values buffer
    in the aggregation state — right up to millions of rows per group);
    ``exact=False`` swaps in ``approx_percentile`` at ``accuracy`` (rank
    error ≤ 1/accuracy) — the 100-TB form, same plan shape.

    The med/mad relations are |groups|-sized, so attaching them back is
    SIZE-GATED exactly like the iterative-graph family
    (``plans.hints.evolving_hint``): pass ``n_groups_bound`` — an upper
    bound on the number of distinct groups, measured once by the caller
    (e.g. ``df.agg(F.count_distinct(group_col))``) — and under the 4M-row
    cap both percentile aggregates broadcast back onto the fact with zero
    fact shuffle; at-or-over the cap (group_col = domain/host on a
    web-scale corpus can reach 10⁷–10⁸ groups — an unconditional
    broadcast OOMs the executors, the r9-audit g5 lesson) the gate
    resolves to ``shuffle_hash`` and the fact exchanges once per join on
    the group key. ``None`` (the default) means "unmeasured" and resolves
    to the scale-safe shuffle regime by omission."""
    from ..plans.hints import evolving_hint

    fn = "percentile" if exact else "approx_percentile"
    extra = "" if exact else f", {accuracy}"
    base = df.withColumn("_gx", F.col(value_col).cast("double"))
    # null-SAFE group joins: a NULL group is a real stratum (a NULL crawl
    # domain is still a domain) — a plain equi-join would orphan its rows
    # from their own med/mad
    med = base.groupBy(group_col).agg(
        F.expr(f"{fn}(_gx, 0.5D{extra})").alias("med")
    ).withColumnRenamed(group_col, "_g_med")
    dev = base.join(
        evolving_hint(med, n_groups_bound),
        base[group_col].eqNullSafe(F.col("_g_med")),
        "left",
    ).drop("_g_med").withColumn(
        "_ad", F.abs(F.col("_gx") - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.expr(f"{fn}(_ad, 0.5D{extra})").alias("mad")
    ).withColumnRenamed(group_col, "_g_mad")
    return (
        dev.join(
            evolving_hint(mad, n_groups_bound),
            dev[group_col].eqNullSafe(F.col("_g_mad")),
            "left",
        )
        .drop("_g_mad")
        .withColumn(
            "is_outlier",
            F.when(
                F.col("_gx").isNotNull(),
                F.abs(F.col("_gx") - F.col("med")) > F.lit(k) * F.col("mad"),
            ),
        )
        .drop("_gx", "_ad")
    )
