"""Golden tests for the entity transform pipelines (SURVEY.md §5.2):
hand-computed expected outputs over edge-case fixtures mirroring FIXTURES.md
§A, including the sink-divergent behaviors (topic0 "0x" vs null,
trace_address "," vs "|").
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Row

from graphsense_ethereum_etl_spark.operators.pipelines import (
    CASSANDRA,
    CSV,
    enrich_transactions,
    latest_block,
    transform_blocks,
    transform_logs,
    transform_traces,
    transform_transactions,
)
from graphsense_ethereum_etl_spark.schemas import (
    RAW_BLOCK,
    RAW_LOG,
    RAW_RECEIPT,
    RAW_TRACE,
    RAW_TRANSACTION,
)


def _blocks(spark):
    rows = [
        # genesis-style block 0: many nulls
        {"number": 0, "hash": "0xaa" + "00" * 31, "parent_hash": None,
         "difficulty": Decimal(17179869184), "timestamp": 1438269973,
         "transaction_count": 0},
        # bucket boundary: 999 → group 0, 1000 → group 1
        {"number": 999, "hash": "0xbb" + "11" * 31, "timestamp": 1438280000,
         "transaction_count": 2},
        {"number": 1000, "hash": "0xcc" + "22" * 31, "timestamp": 1438290000,
         "base_fee_per_gas": 7, "transaction_count": 3},
    ]
    full = [{f.name: r.get(f.name) for f in RAW_BLOCK.fields} for r in rows]
    return spark.createDataFrame([Row(**r) for r in full], RAW_BLOCK)


def test_transform_blocks_buckets_and_hex(spark):
    out = transform_blocks(_blocks(spark), CASSANDRA)
    rows = {r["block_id"]: r for r in out.collect()}
    assert rows[0]["block_id_group"] == 0
    assert rows[999]["block_id_group"] == 0
    assert rows[1000]["block_id_group"] == 1
    # hex decode: 0xaa… → bytes, None stays None
    assert rows[0]["block_hash"][:1] == b"\xaa"
    assert rows[0]["parent_hash"] is None
    # csv dialect keeps hex strings
    out_csv = transform_csv = transform_blocks(_blocks(spark), CSV)
    r0 = {r["block_id"]: r for r in out_csv.collect()}[0]
    assert r0["block_hash"].startswith("0xaa")


def test_enrich_and_transform_transactions(spark):
    txs = spark.createDataFrame(
        [Row(**{f.name: r.get(f.name) for f in RAW_TRANSACTION.fields}) for r in [
            {"hash": "0x" + "ab" * 32, "block_number": 42, "value": Decimal(10) ** 37,
             "to_address": None},  # contract creation + 38-digit value
            {"hash": "0x" + "cd" * 32, "block_number": 42, "value": Decimal(0),
             "to_address": "0x" + "11" * 20},
        ]],
        RAW_TRANSACTION,
    )
    receipts = spark.createDataFrame(
        [Row(**{f.name: r.get(f.name) for f in RAW_RECEIPT.fields}) for r in [
            {"transaction_hash": "0x" + "ab" * 32, "status": 1,
             "contract_address": "0x" + "99" * 20, "gas_used": Decimal(21000)},
            {"transaction_hash": "0x" + "cd" * 32, "status": 0,
             "gas_used": Decimal(40000)},
        ]],
        RAW_RECEIPT,
    )
    out = transform_transactions(enrich_transactions(txs, receipts), CASSANDRA)
    rows = {bytes(r["tx_hash"]).hex(): r for r in out.collect()}
    ab = rows["ab" * 32]
    # prefix = 5 hex chars after 0x, from the *string* form
    assert ab["tx_hash_prefix"] == "ababa"
    assert ab["receipt_status"] == 1
    assert bytes(ab["receipt_contract_address"]) == b"\x99" * 20
    assert ab["value"] == Decimal(10) ** 37
    cd = rows["cd" * 32]
    assert cd["receipt_status"] == 0
    assert cd["receipt_gas_used"] == Decimal(40000)


def test_transform_traces_dialects(spark):
    traces = spark.createDataFrame(
        [Row(**{f.name: r.get(f.name) for f in RAW_TRACE.fields}) for r in [
            {"transaction_hash": "0x" + "aa" * 32, "block_number": 1,
             "trace_address": [0, 2, 1], "trace_index": 1},
            {"transaction_hash": None, "block_number": 1,
             "trace_address": None, "trace_type": "reward", "trace_index": 0},
            {"transaction_hash": "0x" + "bb" * 32, "block_number": 1,
             "trace_address": [], "trace_index": 2},
        ]],
        RAW_TRACE,
    )
    cass = {r["trace_index"]: r for r in transform_traces(traces, CASSANDRA).collect()}
    assert cass[1]["trace_address"] == "0,2,1"
    assert cass[0]["trace_address"] is None  # None-safe (reward trace)
    assert cass[2]["trace_address"] == ""  # empty array → empty string
    csv = {r["trace_index"]: r for r in transform_traces(traces, CSV).collect()}
    assert csv[1]["trace_address"] == "0|2|1"


def test_transform_logs_dialects(spark):
    t0 = "0x" + "11" * 32
    t1 = "0x" + "22" * 32
    logs = spark.createDataFrame(
        [Row(**{f.name: r.get(f.name) for f in RAW_LOG.fields}) for r in [
            {"transaction_hash": "0x" + "aa" * 32, "block_number": 5,
             "topics": [t0, t1], "log_index": 0},
            {"transaction_hash": "0x" + "bb" * 32, "block_number": 5,
             "topics": [], "log_index": 1},  # anonymous event
            {"transaction_hash": "0x" + "cc" * 32, "block_number": 5,
             "topics": None, "log_index": 2},
        ]],
        RAW_LOG,
    )
    cass = {r["log_index"]: r for r in transform_logs(logs, CASSANDRA).collect()}
    assert bytes(cass[0]["topic0"]) == b"\x11" * 32
    # empty topics → "0x" sentinel → unhex("") = b"" (key column, never null)
    assert bytes(cass[1]["topic0"]) == b""
    assert bytes(cass[2]["topic0"]) == b""
    assert [bytes(t) for t in cass[0]["topics"]] == [b"\x11" * 32, b"\x22" * 32]
    assert cass[2]["topics"] == []  # None → [] normalization

    csv = {r["log_index"]: r for r in transform_logs(logs, CSV).collect()}
    assert csv[0]["topic0"] == t0
    assert csv[1]["topic0"] is None  # CSV dialect: null, not "0x"
    assert csv[0]["topics"] == f'["{t0}","{t1}"]'
    assert csv[1]["topics"] == "[]"
    assert csv[2]["topics"] is None


def test_latest_block_two_phase_max(spark):
    out = latest_block(transform_blocks(_blocks(spark), CASSANDRA))
    assert out.collect()[0]["max_block_id"] == 1000
