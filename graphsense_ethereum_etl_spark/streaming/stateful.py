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



def streaming_first_seen(docs_stream: DataFrame, key_col: str = "fp") -> DataFrame:
    """Cross-batch streaming EXACT DEDUP on ``key_col`` — the streaming
    analog of the batch fingerprint dedup (t4): only the FIRST row ever seen
    for each key is emitted; later occurrences (same batch or any later
    micro-batch) are dropped against the keyed state store.

    Built on Spark 4's ``transformWithStateInPandas`` (the arbitrary-state
    successor to ``applyInPandasWithState``): a ``StatefulProcessor`` holding
    one boolean ValueState per key. Unlike ``dropDuplicates`` (whose state
    can only be bounded with a watermark column), the processor owns its
    state lifecycle — TTL/timers can bound it without a watermark, and the
    state store must be RocksDB (required by the API). THE CALLER sets
    ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB provider
    in session setup — this operator verifies the conf and raises instead of
    mutating it, because a conf set here as a side effect would silently
    switch the provider for every OTHER streaming query started later in
    the same session.

    At 100 TB: one shuffle on the key per micro-batch; state is one boolean
    per distinct key in RocksDB, the minimal possible dedup footprint.

    Environment gate: transformWithStateInPandas serializes state through
    protobuf on the Python workers; this container ships no usable
    ``google.protobuf`` (same class of gate as the Cassandra connector), so
    the operator raises a clear error here and runs on any standard Spark 4
    deployment (protobuf is a stock pyspark dependency).
    """
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package on the "
            "Python workers (a stock pyspark dependency, absent in this "
            "environment); use running_user_totals/applyInPandasWithState "
            "or batch exact_duplicates instead"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    schema = docs_stream.schema
    cols = [f.name for f in schema.fields]

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", "seen boolean")

        def handleInputRows(self, key, rows, timer_values):
            if self._seen.exists():
                return
            emitted = False
            for pdf in rows:
                if not emitted and len(pdf):
                    yield pdf.iloc[[0]][cols]
                    emitted = True
            if emitted:
                self._seen.update((True,))

        def close(self) -> None:
            pass

    spark = docs_stream.sparkSession
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    if not provider.endswith("RocksDBStateStoreProvider"):
        raise ValueError(
            "transformWithStateInPandas requires the RocksDB state store; "
            f'set spark.conf.set("spark.sql.streaming.stateStore.providerClass", "{rocksdb}") '
            "in session setup before building this operator (not set here: a "
            "session-wide conf mutation would leak into unrelated streaming queries)"
        )
    return docs_stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=FirstSeen(),
        outputStructType=schema,
        outputMode="Append",
        timeMode="None",
    )
