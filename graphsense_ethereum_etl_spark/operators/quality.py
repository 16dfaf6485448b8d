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
