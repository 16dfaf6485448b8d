"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All query definitions live in ``graphsense_ethereum_etl_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphsense_ethereum_etl_spark.queries import REGISTRY, load
from graphsense_ethereum_etl_spark.functions.columns import block_bucket, hex_prefix


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7.2): the
    transaction-enrichment pipeline analog — source → derive (P5 bucket,
    P6 prefix) → broadcast join (J1) → grouped agg (A1 two-phase max).
    Since r9 the slice is the registered (and oracle-certified) query
    ``flagship_enrichment``, also runnable via ``gse-spark flagship``."""
    return REGISTRY["flagship_enrichment"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
