"""Catalyst plan introspection — the feedback loop the scale posture depends
on (is the filter pushed to the scan? did the dim join go broadcast? how wide
is the scan schema?). Used by tests/test_plans.py to pin the physical plans
we want, not just the answers.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-AQE where applicable)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = executed_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists of every parquet scan (column-pruning check)."""
    plan = executed_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return [
        [c.split(":")[0].strip() for c in s.split(",") if c.strip()] for s in schemas
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def shuffle_count(df: DataFrame) -> int:
    return executed_plan(df).count("Exchange hashpartitioning") + executed_plan(
        df
    ).count("Exchange rangepartitioning")
