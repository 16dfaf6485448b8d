"""Plan inspection helpers (Catalyst introspection for perf assertions)."""

from .explain import executed_plan, has_broadcast_join, pushed_filters, scan_columns

__all__ = ["executed_plan", "has_broadcast_join", "pushed_filters", "scan_columns"]
