"""Plan inspection helpers (Catalyst introspection for perf assertions)."""

from .checkpoint import AQE_TOGGLE_LOCK, checkpoint_partitioned
from .explain import executed_plan, has_broadcast_join, pushed_filters, scan_columns
from .hints import BROADCAST_MAX_ROWS, evolving_hint

__all__ = [
    "AQE_TOGGLE_LOCK",
    "BROADCAST_MAX_ROWS",
    "checkpoint_partitioned",
    "evolving_hint",
    "executed_plan",
    "has_broadcast_join",
    "pushed_filters",
    "scan_columns",
]
