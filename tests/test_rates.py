"""Exchange-rates operator units: the long→map ingest shape, the densified
broadcast conversion agreeing with the generic as-of join, and the
previous-day guard probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphsense_ethereum_etl_spark.operators.rates import (
    convert_to_fiat,
    densify_rates,
    latest_rate_date,
    rates_long_to_map,
)

LONG = [
    ("2020-01-01", "USD", 1.0),
    ("2020-01-01", "EUR", 0.9),
    ("2020-01-04", "USD", 2.0),
    ("2020-01-04", "EUR", 1.8),
    ("2020-01-10", "USD", 3.0),
]


def _rates(spark):
    return rates_long_to_map(
        spark.createDataFrame(LONG, "date string, currency string, rate double")
    )


def test_rates_long_to_map_shape(spark):
    import pytest

    rows = {r["date"]: r["fiat_values"] for r in _rates(spark).collect()}
    # values went through the reference's map<text,float> (float32) shape
    assert rows["2020-01-01"] == {"USD": 1.0, "EUR": pytest.approx(0.9)}
    assert set(rows["2020-01-04"]) == {"USD", "EUR"}
    assert rows["2020-01-10"] == {"USD": 3.0}  # missing currency stays absent


def test_densify_covers_every_day_and_end_bound(spark):
    dense = {
        str(r["day"]): r["rate"]
        for r in densify_rates(_rates(spark), "2020-01-12", "USD").collect()
    }
    assert len(dense) == 12  # 01..12 inclusive
    assert dense["2020-01-01"] == 1.0 and dense["2020-01-03"] == 1.0
    assert dense["2020-01-04"] == 2.0 and dense["2020-01-09"] == 2.0
    assert dense["2020-01-10"] == 3.0 and dense["2020-01-12"] == 3.0


def test_convert_matches_generic_asof_join(spark):
    """The dense-dim broadcast equi-join must agree with true as-of
    semantics — cross-checked against the engine's generic asof_join."""
    from graphsense_ethereum_etl_spark.operators.joins import asof_join

    vals = spark.createDataFrame(
        [(i, f"2020-01-{d:02d}", 100.0 * i) for i, d in enumerate([1, 2, 3, 4, 9, 10, 12], 1)]
        + [(99, "2019-12-31", 7.0)],  # before the first rate → NULL
        "id bigint, d string, v double",
    )
    got = {
        r["id"]: (r["rate"], r["fiat"])
        for r in convert_to_fiat(
            vals, _rates(spark), "v", "d", "USD", "2020-01-12", out_col="fiat"
        ).collect()
    }
    rates_flat = _rates(spark).select(
        F.to_date("date").alias("rd"), F.col("fiat_values")["USD"].alias("rate")
    )
    ref = asof_join(
        vals.withColumn("_k", F.lit(1)).withColumn("vd", F.to_date("d")),
        rates_flat.withColumn("_k", F.lit(1)),
        by="_k",
        left_ts="vd",
        right_ts="rd",
        right_cols=["rate"],
    )
    want = {r["id"]: r["asof_rate"] for r in ref.collect()}
    assert {k: v[0] for k, v in got.items()} == want
    assert got[99] == (None, None)
    assert got[1] == (1.0, 100.0)
    assert got[5] == (2.0, 1000.0)  # 2020-01-09 holds the 01-04 rate


def test_latest_rate_date_guard(spark):
    assert str(latest_rate_date(_rates(spark))) == "2020-01-10"


def test_densify_clamps_to_end_date_no_duplicate_days(spark):
    """r6: with end_date BEFORE the last rate's date (rates table updated
    past the caller's ingest head), date sequence() on the inverted last
    interval generated a DESCENDING range — duplicate day rows that
    double-joined every fact row on those days. Intervals must intersect
    with (-inf, end_date]."""
    from pyspark.sql import functions as F

    from graphsense_ethereum_etl_spark.operators.rates import (
        convert_to_fiat,
        densify_rates,
        rates_long_to_map,
    )

    long = spark.createDataFrame(
        [
            ("2024-01-01", "USD", 100.0),
            ("2024-01-05", "USD", 200.0),
            ("2024-01-20", "USD", 300.0),
        ],
        "date string, currency string, rate double",
    )
    rates = rates_long_to_map(long)
    dense = densify_rates(rates, "2024-01-10", "USD")
    rows = {r["day"].isoformat(): r["rate"] for r in dense.collect()}
    assert dense.count() == dense.select("day").distinct().count() == 10
    assert min(rows) == "2024-01-01" and max(rows) == "2024-01-10"
    assert rows["2024-01-07"] == 200.0
    # a fact row inside the formerly-duplicated range converts exactly once
    vals = spark.createDataFrame([("2024-01-09", 10.0)], "d string, v double")
    out = convert_to_fiat(vals, rates, "v", "d", "USD", "2024-01-10").collect()
    assert len(out) == 1 and out[0]["fiat_value"] == 2000.0
