"""Structured Streaming surface (engine extension; SURVEY.md §2.10).

The reference's incremental loop maps onto Structured Streaming as a
file-source stream over the raw landing zone with ``foreachBatch`` writing
children-before-marker, checkpointing replacing the query-the-sink resume.
Event-time operators (watermarked tumbling windows, stateful sessionization)
are pure engine extensions — the reference has no event-time handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def stream_raw_blocks(
    spark: SparkSession, raw_dir: str, schema: T.StructType
) -> DataFrame:
    """File-source stream over a raw landing zone (the 100 TB ingestion shape:
    extraction lands raw parquet continuously; this picks it up incrementally
    with exactly-once file tracking in the checkpoint)."""
    return spark.readStream.schema(schema).parquet(raw_dir)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked windowed counts — the canonical late-data-tolerant
    streaming aggregate. ``slide`` < ``window`` makes the windows SLIDING
    (each event lands in window/slide rows — Spark replicates it into every
    overlapping window before the aggregation); the default is tumbling.
    Works identically on a batch DataFrame (F.window is a plain grouping
    expression), which is how the oracle checks it (win1 tumbling, win2
    sliding).

    NULL event times are DROPPED, in batch and streaming alike: a row
    without an event time belongs to no window (Spark's window generator
    emits nothing for NULL, matching watermark semantics). Callers that
    must surface such rows filter ``ts IS NULL`` into their own branch
    BEFORE windowing — silently mixing them in here would make the batch
    and streaming paths diverge."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "cnt",
        )
    )


def sessionized_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "10 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Watermarked SESSION-window aggregation (`F.session_window` — dynamic
    windows that grow with activity and close after ``gap`` of silence, the
    streaming-native form of win3/sess1). Unlike tumbling/sliding windows,
    session state MERGES: a new event can fuse two open sessions, so the
    engine keeps per-key open-session state and only the watermark passing
    a session's end (last event + gap) finalizes and emits it — append
    mode's contract. Works identically on a batch DataFrame (session_window
    is a plain grouping expression there), which is how the equivalence
    test and win3's oracle check it."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 hours",
    max_lag: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join (§2.10 — the hardest streaming
    shape: BOTH sides buffer state): match left rows to right rows with the
    same key whose timestamp lies in (left_ts - max_lag, left_ts]. The
    watermarks plus the time-range predicate are what let Spark EVICT
    buffered rows — an unbounded-state join is rejected by the engine.

    The classic use: correlate a transaction stream with its receipt stream
    arriving up to ``max_lag`` later. Works identically on batch frames
    (same predicate, no state), which is how the oracle would check it.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return lw.join(
        rw,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts <= lts)
        & (rts > lts - F.expr(f"INTERVAL {max_lag}")),
    )


def dedup_stream_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Engine-native bounded-state streaming deduplication
    (`dropDuplicatesWithinWatermark`): keeps the FIRST row per key and
    drops any duplicate arriving within the watermark delay of it; the
    per-key state is EVICTED once the watermark passes, so state size
    tracks the duplicate-arrival window, not the stream's lifetime — the
    property that makes exact streaming dedup viable at 100 TB (the
    unbounded-retention variant is `streaming_first_seen` in
    stateful.py, and plain `dropDuplicates` on a stream would grow state
    forever). A duplicate arriving AFTER eviction is re-emitted — the
    documented contract: at-least-once dedup with a bounded window,
    exactly what ingest retries produce.

    On a BATCH frame the engine rejects dropDuplicatesWithinWatermark, so
    this degrades to plain ``dropDuplicates`` — the correct batch analog:
    with the whole input present the watermark never evicts mid-run, so
    "first per key within the window" collapses to "one per key"."""
    if not events.isStreaming:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def run_stream_merge(
    stream_df: DataFrame,
    table,
    key_cols: list[str],
    checkpoint_path: str,
    delete_col: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """CDC stream → versioned-table MERGE: every micro-batch is applied as
    an upsert/delete batch through ``VersionedTable.merge_into`` (the
    reference's Cassandra INSERT-is-upsert semantics, continuously). This
    is the streaming sink shape that plain file appends cannot give:

      - replay safety WITHOUT exactly-once plumbing — MERGE is idempotent
        (re-upserting the same rows and re-deleting the same keys
        converge), so a micro-batch replayed after a crash between
        merge_into's manifest swap and the checkpoint commit leaves the
        table unchanged;
      - each batch rewrites only its touched partitions (merge_into's
        manifest-pruned copy-on-write), so steady-state cost tracks the
        CDC rate, not table size;
      - readers racing the stream see whole-snapshot isolation per batch
        (the atomic manifest swap).
    """

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.merge_into(batch_df, key_cols=key_cols, delete_col=delete_col)

    writer = stream_df.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_to_parquet(
    stream_df: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    transform=None,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch writer: apply the entity transform per micro-batch and
    append to partitioned parquet. ``availableNow`` drains the backlog then
    stops — the reference's catch-up-to-head semantics
    (eth_cassandra_streaming.py:595-599)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform is not None else batch_df
        writer = out.write.mode("append")
        if "block_id_group" in out.columns:
            writer = writer.partitionBy("block_id_group")
        writer.parquet(sink_path)

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
