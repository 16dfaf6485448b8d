"""Schema registry.

StructType equivalents of the reference's Cassandra data model
(/root/reference/scripts/schema.cql:1-102) plus the raw (pre-transform)
ethereum-etl item schemas the transform pipelines consume
(field names per eth_cassandra_streaming.py:342-343,394-396,427-430,453-454).

Type mapping (SURVEY.md §1.2): CQL int→Integer, smallint→Short, bigint→Long,
varint→Decimal(38,0) (+ lossless 32-byte binary companion where adversarial
uint256 values matter — see ``WEI_DECIMAL`` note), blob→Binary, text→String,
list<blob>→Array(Binary), map<text,float>→Map(String,Float).
"""

from __future__ import annotations

from pyspark.sql import types as T

# varint columns (value, gas_price, difficulty …) are arbitrary-precision in
# CQL (schema.cql:17-18,38,40,46-47). Spark Decimal caps at 38 digits; uint256
# needs 78. Decimal(38,0) covers every realistic wei amount (total ETH supply
# ≈ 1.2e26 ≪ 1e38); pipelines can optionally carry a raw 32-byte big-endian
# BinaryType companion column for adversarial values.
WEI_DECIMAL = T.DecimalType(38, 0)

BLOCK_BUCKET_SIZE = 1000  # eth_cassandra_streaming.py:34
TX_HASH_PREFIX_LEN = 5  # eth_cassandra_streaming.py:35 (call site :634)

# ---------------------------------------------------------------------------
# Raw (pre-transform) entity schemas — ethereum-etl item dicts as DataFrames.
# ---------------------------------------------------------------------------

RAW_BLOCK = T.StructType(
    [
        T.StructField("number", T.LongType()),
        T.StructField("hash", T.StringType()),
        T.StructField("parent_hash", T.StringType()),
        T.StructField("nonce", T.StringType()),
        T.StructField("sha3_uncles", T.StringType()),
        T.StructField("logs_bloom", T.StringType()),
        T.StructField("transactions_root", T.StringType()),
        T.StructField("state_root", T.StringType()),
        T.StructField("receipts_root", T.StringType()),
        T.StructField("miner", T.StringType()),
        T.StructField("difficulty", WEI_DECIMAL),
        T.StructField("total_difficulty", WEI_DECIMAL),
        T.StructField("size", T.IntegerType()),
        T.StructField("extra_data", T.StringType()),
        T.StructField("gas_limit", T.IntegerType()),
        T.StructField("gas_used", T.IntegerType()),
        T.StructField("base_fee_per_gas", T.LongType()),
        T.StructField("timestamp", T.IntegerType()),
        T.StructField("transaction_count", T.ShortType()),
    ]
)

RAW_TRANSACTION = T.StructType(
    [
        T.StructField("hash", T.StringType()),
        T.StructField("nonce", T.IntegerType()),
        T.StructField("block_hash", T.StringType()),
        T.StructField("block_number", T.LongType()),
        T.StructField("transaction_index", T.ShortType()),
        T.StructField("from_address", T.StringType()),
        T.StructField("to_address", T.StringType()),
        T.StructField("value", WEI_DECIMAL),
        T.StructField("gas", T.IntegerType()),
        T.StructField("gas_price", WEI_DECIMAL),
        T.StructField("input", T.StringType()),
        T.StructField("block_timestamp", T.IntegerType()),
        T.StructField("max_fee_per_gas", T.LongType()),
        T.StructField("max_priority_fee_per_gas", T.LongType()),
        T.StructField("transaction_type", T.LongType()),
    ]
)

RAW_RECEIPT = T.StructType(
    [
        T.StructField("transaction_hash", T.StringType()),
        T.StructField("cumulative_gas_used", WEI_DECIMAL),
        T.StructField("gas_used", WEI_DECIMAL),
        T.StructField("contract_address", T.StringType()),
        T.StructField("root", T.StringType()),
        T.StructField("status", T.LongType()),
        T.StructField("effective_gas_price", T.LongType()),
    ]
)

RAW_TRACE = T.StructType(
    [
        T.StructField("transaction_hash", T.StringType()),
        T.StructField("block_number", T.LongType()),
        T.StructField("transaction_index", T.ShortType()),
        T.StructField("from_address", T.StringType()),
        T.StructField("to_address", T.StringType()),
        T.StructField("value", WEI_DECIMAL),
        T.StructField("input", T.StringType()),
        T.StructField("output", T.StringType()),
        T.StructField("trace_type", T.StringType()),
        T.StructField("call_type", T.StringType()),
        T.StructField("reward_type", T.StringType()),
        T.StructField("gas", T.IntegerType()),
        T.StructField("gas_used", T.LongType()),
        T.StructField("subtraces", T.IntegerType()),
        T.StructField("trace_address", T.ArrayType(T.IntegerType())),
        T.StructField("error", T.StringType()),
        T.StructField("status", T.ShortType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("trace_index", T.IntegerType()),
    ]
)

RAW_LOG = T.StructType(
    [
        T.StructField("transaction_hash", T.StringType()),
        T.StructField("block_number", T.LongType()),
        T.StructField("block_hash", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("data", T.StringType()),
        T.StructField("topics", T.ArrayType(T.StringType())),
        T.StructField("log_index", T.IntegerType()),
        T.StructField("transaction_index", T.ShortType()),
    ]
)

# ---------------------------------------------------------------------------
# Transformed (at-rest) schemas — mirror schema.cql tables.
# ---------------------------------------------------------------------------

BLOCK = T.StructType(
    [
        T.StructField("block_id_group", T.LongType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("block_hash", T.BinaryType()),
        T.StructField("parent_hash", T.BinaryType()),
        T.StructField("nonce", T.BinaryType()),
        T.StructField("sha3_uncles", T.BinaryType()),
        T.StructField("logs_bloom", T.BinaryType()),
        T.StructField("transactions_root", T.BinaryType()),
        T.StructField("state_root", T.BinaryType()),
        T.StructField("receipts_root", T.BinaryType()),
        T.StructField("miner", T.BinaryType()),
        T.StructField("difficulty", WEI_DECIMAL),
        T.StructField("total_difficulty", WEI_DECIMAL),
        T.StructField("size", T.IntegerType()),
        T.StructField("extra_data", T.BinaryType()),
        T.StructField("gas_limit", T.IntegerType()),
        T.StructField("gas_used", T.IntegerType()),
        T.StructField("base_fee_per_gas", T.LongType()),
        T.StructField("timestamp", T.IntegerType()),
        T.StructField("transaction_count", T.ShortType()),
    ]
)

TRANSACTION = T.StructType(
    [
        T.StructField("tx_hash_prefix", T.StringType(), False),
        T.StructField("tx_hash", T.BinaryType(), False),
        T.StructField("nonce", T.IntegerType()),
        T.StructField("block_hash", T.BinaryType()),
        T.StructField("block_id", T.LongType()),
        T.StructField("transaction_index", T.ShortType()),
        T.StructField("from_address", T.BinaryType()),
        T.StructField("to_address", T.BinaryType()),
        T.StructField("value", WEI_DECIMAL),
        T.StructField("gas", T.IntegerType()),
        T.StructField("gas_price", WEI_DECIMAL),
        T.StructField("input", T.BinaryType()),
        T.StructField("block_timestamp", T.IntegerType()),
        T.StructField("max_fee_per_gas", T.LongType()),
        T.StructField("max_priority_fee_per_gas", T.LongType()),
        T.StructField("transaction_type", T.LongType()),
        T.StructField("receipt_cumulative_gas_used", WEI_DECIMAL),
        T.StructField("receipt_gas_used", WEI_DECIMAL),
        T.StructField("receipt_contract_address", T.BinaryType()),
        T.StructField("receipt_root", T.BinaryType()),
        T.StructField("receipt_status", T.LongType()),
        T.StructField("receipt_effective_gas_price", T.LongType()),
    ]
)

TRACE = T.StructType(
    [
        T.StructField("block_id_group", T.LongType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("trace_index", T.IntegerType()),
        T.StructField("tx_hash", T.BinaryType()),
        T.StructField("transaction_index", T.ShortType()),
        T.StructField("from_address", T.BinaryType()),
        T.StructField("to_address", T.BinaryType()),
        T.StructField("value", WEI_DECIMAL),
        T.StructField("input", T.BinaryType()),
        T.StructField("output", T.BinaryType()),
        T.StructField("trace_type", T.StringType()),
        T.StructField("call_type", T.StringType()),
        T.StructField("reward_type", T.StringType()),
        T.StructField("gas", T.IntegerType()),
        T.StructField("gas_used", T.LongType()),
        T.StructField("subtraces", T.IntegerType()),
        T.StructField("trace_address", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("status", T.ShortType()),
        T.StructField("trace_id", T.StringType()),
    ]
)

LOG = T.StructType(
    [
        T.StructField("block_id_group", T.LongType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("log_index", T.IntegerType()),
        T.StructField("transaction_index", T.ShortType()),
        T.StructField("tx_hash", T.BinaryType()),
        T.StructField("block_hash", T.BinaryType()),
        T.StructField("address", T.BinaryType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("topics", T.ArrayType(T.BinaryType())),
        T.StructField("topic0", T.BinaryType()),
    ]
)

EXCHANGE_RATES = T.StructType(
    [
        T.StructField("date", T.StringType(), False),
        T.StructField("fiat_values", T.MapType(T.StringType(), T.FloatType())),
    ]
)

CONFIGURATION = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("block_bucket_size", T.IntegerType()),
        T.StructField("tx_prefix_length", T.IntegerType()),
    ]
)

TABLES = {
    "block": BLOCK,
    "transaction": TRANSACTION,
    "trace": TRACE,
    "log": LOG,
    "exchange_rates": EXCHANGE_RATES,
    "configuration": CONFIGURATION,
}

RAW_TABLES = {
    "raw_blocks": RAW_BLOCK,
    "raw_transactions": RAW_TRANSACTION,
    "raw_receipts": RAW_RECEIPT,
    "raw_traces": RAW_TRACE,
    "raw_logs": RAW_LOG,
}
