"""DDL / catalog path (SURVEY.md §2.1 S7, S9; §3.3).

The reference's ``create_keyspace.py`` applies a CQL template with keyspace
substitution and an existence check (create_keyspace.py:40-69). Spark-native:
``CREATE DATABASE/TABLE ... USING PARQUET`` through ``spark.sql`` with
schemas from the central registry, idempotence via catalog probes, and
schema introspection through ``spark.catalog`` (replacing the reference's
system_schema.columns scan that builds inserts dynamically,
eth_cassandra_streaming.py:248-260).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .schemas import TABLES

PARTITION_COLUMNS: dict[str, list[str]] = {
    "block": ["block_id_group"],
    "trace": ["block_id_group"],
    "log": ["block_id_group"],
    "transaction": ["block_id_group"],
}


def _ddl_columns(schema: T.StructType) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)


def setup_database(
    spark: SparkSession,
    database: str,
    location_root: str,
    tables: dict[str, T.StructType] | None = None,
) -> list[str]:
    """Create the database + entity tables (idempotent). Returns the list of
    tables newly created. The keyspace-name substitution of the reference
    (create_keyspace.py:63) is the parameterized ``database`` here."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{database}`")
    created = []
    tables = tables if tables is not None else TABLES
    for name, schema in tables.items():
        if spark.catalog.tableExists(f"`{database}`.`{name}`"):
            continue
        partition_cols = [
            c for c in PARTITION_COLUMNS.get(name, []) if c in schema.fieldNames()
        ]
        # Partition columns must be at the end for USING PARQUET tables —
        # express the DDL with PARTITIONED BY and keep schema order intact.
        part = (
            "PARTITIONED BY (" + ", ".join(f"`{c}`" for c in partition_cols) + ")"
            if partition_cols
            else ""
        )
        spark.sql(
            f"CREATE TABLE `{database}`.`{name}` ({_ddl_columns(schema)}) "
            f"USING PARQUET {part} "
            f"LOCATION '{location_root}/{name}'"
        )
        created.append(name)
    return created


def table_columns(spark: SparkSession, database: str, table: str) -> list[str]:
    """S7 — schema introspection: the column list the reference reads from
    system_schema.columns to build inserts dynamically."""
    return [c.name for c in spark.catalog.listColumns(table, dbName=database)]


def database_exists(spark: SparkSession, database: str) -> bool:
    """F4 — keyspace existence predicate (create_keyspace.py:40-52)."""
    return spark.catalog.databaseExists(database)
