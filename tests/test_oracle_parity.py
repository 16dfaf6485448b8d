"""Local replica of the driver's correctness gate: run every registered Spark
query and its DuckDB oracle at sf0.01, compare row count, column names, and
an order-insensitive value comparison.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pytest

from graphsense_ethereum_etl_spark.queries import REGISTRY, TABLES


def _normalize(v):
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"f:{v!r}"
    if isinstance(v, datetime.datetime):
        return "ts:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "b:" + bytes(v).hex()
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if v is None:
        return "null"
    return f"s:{v}"


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_normalize(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, sf_dir, ddb):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s, d = _rowset(spark_cols, spark_rows), _rowset(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_smoke(name, spark, sf_dir):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_registry_contract():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0


def test_events_load_sets_nanos_conf_itself(spark, sf_dir):
    """The driver contract passes a CALLER-owned SparkSession into
    queries(); load() must not depend on our session factory having set
    nanosAsLong (events is TIMESTAMP(NANOS) parquet, rejected without it)."""
    from graphsense_ethereum_etl_spark.queries import load

    key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    try:
        assert load(spark, sf_dir, "events").limit(3).count() == 3
        assert spark.conf.get(key) == "true"
    finally:
        spark.conf.set(key, "true")
