"""Exchange-rates ingest + fiat conversion — the reference's 7th table.

The reference creates ``exchange_rates (date text PRIMARY KEY, fiat_values
map<text, float>)`` (scripts/schema.cql:79-82, still emitted by
create_keyspace.py even though the ingest itself moved out per
README.md:83-87), and its ``-p/--previous_day`` ingest flag exists solely
because "currency exchange rates might not be available for the current day"
(eth_cassandra_streaming.py:509-515) — i.e. the intended consumer is a
date-keyed value → fiat conversion. This module supplies that end-to-end:

  - ``rates_long_to_map``: ingest shape. Rate providers ship long CSV rows
    (date, currency, rate); one map-side-combinable groupBy folds them into
    the reference's map<text,float> row per date.
  - ``convert_to_fiat``: the conversion operator. Rates are sparse (weekends,
    provider gaps), so each value row needs the most recent rate at or
    before its date — an as-of join. Because the rates table is TINY (one
    row per calendar day at most — ~20k rows for Ethereum's whole history)
    while the value side is the 100 TB fact table, the generic union+window
    ``asof_join`` (one shuffle of the FACT side) is the wrong plan shape.
    Instead: densify the dim — explode each rate's validity interval
    [date, next_date) into one row per calendar day (driver-free, stays
    lazy, ~2 small Spark jobs on a dim of thousands of rows) — then
    broadcast equi-join on the exact day. The fact side is never shuffled,
    never sorted: scan → broadcast hash join → project, the cheapest
    possible 100 TB plan for a small-dim enrichment.
  - ``latest_rate_date``: the ``-p`` guard analog — the newest date with a
    published rate; ingest loops cap their head at it so no value row can
    outrun the rates table (1-row probe, same class as the resume max).

Determinism: the conversion is value × rate with rate stored as float32
(the reference's map<text,float>); float → double widening is exact and
double multiplication is IEEE-identical across engines, so query-level
aggregates stay bit-reproducible with the usual per-row DECIMAL cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def rates_long_to_map(
    long_df: DataFrame,
    date_col: str = "date",
    currency_col: str = "currency",
    rate_col: str = "rate",
) -> DataFrame:
    """(date, currency, rate) long rows → one ``exchange_rates`` row per
    date with ``fiat_values: map<string, float>`` (schema.cql:79-82 shape).
    ``sort_array`` before ``map_from_entries`` makes the map's entry order
    — and thus any downstream serialization — input-order-independent."""
    return long_df.groupBy(F.col(date_col).alias("date")).agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(currency_col).alias("key"),
                        F.col(rate_col).cast("float").alias("value"),
                    )
                )
            )
        ).alias("fiat_values")
    )


def densify_rates(
    rates: DataFrame, end_date, currency: str, date_col: str = "date"
) -> DataFrame:
    """Sparse (date, fiat_values) → one (day, rate) row per CALENDAR day:
    each rate is valid over [its date, next rate's date), the final rate
    through ``end_date`` inclusive. The lead() window runs on the rates dim
    only — thousands of rows, a single-partition sort is the point, the
    fact table never sees this plan."""
    w = W.orderBy(F.col(date_col).cast("date"))
    iv = rates.select(
        F.col(date_col).cast("date").alias("_start"),
        # Intersect every interval with (-inf, end_date]: when end_date
        # falls BEFORE the last rate's date (rates table updated past the
        # caller's ingest head), the unclamped last interval would have
        # _start > _end — and date sequence() silently generates a
        # DESCENDING range there, emitting duplicate day rows that
        # double-join (and mis-convert) every fact row on those days.
        F.least(
            F.coalesce(
                F.date_sub(F.lead(F.col(date_col).cast("date")).over(w), 1),
                F.lit(end_date).cast("date"),
            ),
            F.lit(end_date).cast("date"),
        ).alias("_end"),
        F.col("fiat_values").getItem(currency).alias("rate"),
    )
    return iv.filter(F.col("_start") <= F.col("_end")).select(
        F.explode(F.sequence("_start", "_end")).alias("day"), "rate"
    )


def convert_to_fiat(
    values: DataFrame,
    rates: DataFrame,
    value_col: str,
    date_col: str,
    currency: str,
    end_date,
    out_col: str = "fiat_value",
) -> DataFrame:
    """Attach the as-of exchange rate and the converted fiat amount to every
    row of ``values``: rate = most recent ``rates.fiat_values[currency]``
    with rate-date <= the row's ``date_col`` (day granularity),
    ``out_col`` = value × rate. Rows dated before the first published rate
    keep NULLs (left-join semantics — the reference's previous-day flag
    exists precisely because such rows must stay visible, not silently
    drop). ``end_date`` bounds the last rate's validity (callers pass their
    ingest head; see ``latest_rate_date``).

    Plan shape: broadcast hash join on the exact day against the densified
    dim — zero shuffle, zero sort on the fact side."""
    dense = densify_rates(rates, end_date, currency)
    return (
        values.join(
            F.broadcast(dense),
            F.to_date(F.col(date_col)) == F.col("day"),
            "left",
        )
        .drop("day")
        .withColumn(out_col, F.col(value_col) * F.col("rate"))
    )


def latest_rate_date(rates: DataFrame, date_col: str = "date"):
    """Newest date with a published rate — the ``-p/--previous_day`` guard
    (eth_cassandra_streaming.py:509-515): ingest heads cap here so no value
    row is ever written without a convertible rate. One-row driver probe,
    same sanctioned class as the resume max scan."""
    row = rates.agg(F.max(F.col(date_col).cast("date")).alias("d")).collect()[0]
    return row["d"]
