"""Plan inspection helpers (Catalyst introspection for perf assertions)."""

from .checkpoint import checkpoint_partitioned
from .explain import executed_plan, has_broadcast_join, pushed_filters, scan_columns

__all__ = [
    "checkpoint_partitioned",
    "executed_plan",
    "has_broadcast_join",
    "pushed_filters",
    "scan_columns",
]
