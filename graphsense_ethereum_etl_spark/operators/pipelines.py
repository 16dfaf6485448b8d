"""Entity transform pipelines — Spark-native equivalents of the reference's
``ingest_*`` / ``format_*`` row loops (SURVEY.md §2.2 P1-P13).

Each pipeline is a declarative select/withColumn chain, so Catalyst gets
column pruning, predicate pushdown, and whole-stage codegen for free — the
reference's row-at-a-time Python loops (eth_cassandra_streaming.py:390-399
etc.) become vectorized JVM expressions.

Sink-divergent semantics are an explicit ``dialect`` parameter
(SURVEY.md §7.4.2):
  - ``cassandra``: topic0 defaults to "0x" (eth_cassandra_streaming.py:351-355),
    trace_address joined with "," (:456-460), hex columns decoded to binary.
  - ``csv``: topic0 stays null (eth_csv_export.py:339-340), trace_address
    joined with "|" (:311-315), hex columns stay 0x-strings, topics serialized
    to a JSON-ish quoted string (:342-344).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import (
    array_join_sep,
    block_bucket,
    hex_prefix,
    hex_to_bin,
    topic0_with_default,
    topics_to_json,
    topics_unhex,
)

CASSANDRA = "cassandra"
CSV = "csv"

# blob column lists per entity (schema.cql; hex_to_bytearray application
# lists at eth_cassandra_streaming.py:378-389,414-422,448,331-337).
BLOCK_HEX_COLS = [
    "block_hash",
    "parent_hash",
    "nonce",
    "sha3_uncles",
    "logs_bloom",
    "transactions_root",
    "state_root",
    "receipts_root",
    "miner",
    "extra_data",
]
TX_HEX_COLS = [
    "tx_hash",
    "block_hash",
    "from_address",
    "to_address",
    "input",
    "receipt_contract_address",
    "receipt_root",
]
TRACE_HEX_COLS = ["tx_hash", "from_address", "to_address", "input", "output"]
LOG_HEX_COLS = ["tx_hash", "block_hash", "address", "data", "topic0"]


def _decode_hex(df: DataFrame, cols: list[str]) -> DataFrame:
    exprs = []
    for f in df.schema.fields:
        if f.name in cols:
            exprs.append(hex_to_bin(F.col(f.name)).alias(f.name))
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs)


def transform_blocks(
    raw: DataFrame, dialect: str = CASSANDRA, bucket_size: int = 1000
) -> DataFrame:
    """Block pipeline: rename number→block_id, hash→block_hash
    (eth_cassandra_streaming.py:394-396), derive block_id_group (:395),
    decode hex blobs (:398-399)."""
    df = (
        raw.withColumnRenamed("number", "block_id")
        .withColumnRenamed("hash", "block_hash")
        .withColumn("block_id_group", block_bucket("block_id", bucket_size))
    )
    if dialect == CASSANDRA:
        df = _decode_hex(df, BLOCK_HEX_COLS)
    return df


def transform_transactions(
    raw_joined: DataFrame, dialect: str = CASSANDRA, prefix_len: int = 5
) -> DataFrame:
    """Transaction pipeline over the receipt-enriched frame: rename
    hash→tx_hash, block_number→block_id (eth_cassandra_streaming.py:427,430),
    derive tx_hash_prefix from the hex string *before* unhex (:428-429),
    decode hex blobs (:432-433)."""
    df = (
        raw_joined.withColumnRenamed("hash", "tx_hash")
        .withColumnRenamed("block_number", "block_id")
        .withColumn("tx_hash_prefix", hex_prefix("tx_hash", prefix_len))
    )
    if dialect == CASSANDRA:
        df = _decode_hex(df, TX_HEX_COLS)
    return df


def transform_traces(
    raw: DataFrame, dialect: str = CASSANDRA, bucket_size: int = 1000
) -> DataFrame:
    """Trace pipeline: renames (:453-454), bucket (:455), trace_address
    list→string with sink-specific separator (:456-460 vs
    eth_csv_export.py:311-315), hex decode (:462-463)."""
    sep = "," if dialect == CASSANDRA else "|"
    df = (
        raw.withColumnRenamed("transaction_hash", "tx_hash")
        .withColumnRenamed("block_number", "block_id")
        .withColumn("block_id_group", block_bucket("block_id", bucket_size))
        .withColumn("trace_address", array_join_sep("trace_address", sep))
    )
    if dialect == CASSANDRA:
        df = _decode_hex(df, TRACE_HEX_COLS)
    return df


def transform_logs(
    raw: DataFrame, dialect: str = CASSANDRA, bucket_size: int = 1000
) -> DataFrame:
    """Log pipeline: renames (:342-343), bucket (:344), topic0 extraction with
    sink-dependent default (:346-355 vs eth_csv_export.py:339-340), topics
    element-wise decode (:357) or JSON-ish serialization
    (eth_csv_export.py:342-344)."""
    df = (
        raw.withColumnRenamed("transaction_hash", "tx_hash")
        .withColumnRenamed("block_number", "block_id")
        .withColumn("block_id_group", block_bucket("block_id", bucket_size))
    )
    if dialect == CASSANDRA:
        df = df.withColumn("topic0", topic0_with_default("topics", "0x"))
        df = df.withColumn("topics", topics_unhex("topics"))
        df = _decode_hex(df, LOG_HEX_COLS)
    else:
        df = df.withColumn("topic0", topic0_with_default("topics", None))
        df = df.withColumn("topics", topics_to_json("topics"))
    return df


def enrich_transactions(txs: DataFrame, receipts: DataFrame) -> DataFrame:
    """J1 — tx ⋈ receipt enrichment (call site
    eth_cassandra_streaming.py:628, semantics from ethereumetl.streaming.enrich):
    inner equi-join on tx hash, receipt fields flattened to ``receipt_*``
    columns (result shape: schema.cql:46-51).

    Scale posture: per micro-batch both sides are block-local and same-sized —
    Catalyst/AQE picks broadcast when one side is small. For a 100 TB backfill
    both sides should be bucketed/co-partitioned on the hash so this becomes a
    shuffle-free sort-merge join.
    """
    r = receipts.select(
        F.col("transaction_hash").alias("__rhash"),
        F.col("cumulative_gas_used").alias("receipt_cumulative_gas_used"),
        F.col("gas_used").alias("receipt_gas_used"),
        F.col("contract_address").alias("receipt_contract_address"),
        F.col("root").alias("receipt_root"),
        F.col("status").alias("receipt_status"),
        F.col("effective_gas_price").alias("receipt_effective_gas_price"),
    )
    return txs.join(r, txs["hash"] == r["__rhash"], "inner").drop("__rhash")


def latest_block(blocks: DataFrame) -> DataFrame:
    """S4/A1 — resume point: two-phase max over block_id.

    The reference's CQL dance (PER PARTITION LIMIT 1, then client max, then
    MAX within the winning partition — eth_cassandra_streaming.py:225-245) is
    exactly Spark's partial+final aggregation; over Parquet the scan is
    metadata-only (row-group stats)."""
    return blocks.agg(F.max("block_id").alias("max_block_id"))
