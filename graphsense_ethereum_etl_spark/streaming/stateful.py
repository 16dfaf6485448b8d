"""Custom stateful streaming operator via ``applyInPandasWithState``
(engine extension; SURVEY.md §2.10 notes the reference has no stateful ops
beyond the resume offset).

``running_user_totals`` keeps per-user running (event count, value sum)
state across micro-batches — the canonical shape for any accumulator the
built-in windowed aggregates can't express (e.g. per-address running balance
maintained incrementally over an unbounded stream).

State is a tuple of primitives (bounded per key); at scale the operator
shuffles by the grouping key once per micro-batch and state lives in the
state store (RocksDB on a real cluster).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user running totals over an unbounded event stream. Emits the
    updated state for every user seen in the micro-batch (update mode)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
