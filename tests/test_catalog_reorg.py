"""DDL/catalog path (S9/S7/F4) and reorg invalidation tests."""

from __future__ import annotations

from graphsense_ethereum_etl_spark.catalog import (
    database_exists,
    setup_database,
    table_columns,
)
from graphsense_ethereum_etl_spark.sources.generator import gen_chain
from graphsense_ethereum_etl_spark.streaming.incremental import (
    invalidate_from,
    latest_ingested_block,
    run_incremental,
)


def test_setup_database_idempotent(spark, tmp_path):
    db = "eth_raw_test"
    created = setup_database(spark, db, str(tmp_path / "warehouse"))
    assert set(created) == {
        "block",
        "transaction",
        "trace",
        "log",
        "exchange_rates",
        "configuration",
    }
    assert database_exists(spark, db)
    # idempotent re-run (the reference's has_keyspace guard)
    assert setup_database(spark, db, str(tmp_path / "warehouse")) == []
    cols = table_columns(spark, db, "configuration")
    assert cols == ["id", "block_bucket_size", "tx_prefix_length"]
    block_cols = table_columns(spark, db, "block")
    assert "block_id" in block_cols and "block_id_group" in block_cols
    spark.sql(f"DROP DATABASE `{db}` CASCADE")


def test_reorg_invalidate_and_reingest(spark, tmp_path):
    root = str(tmp_path / "sink")

    def source(s, lo, hi):
        return gen_chain(s, lo, hi, partitions=2)

    run_incremental(spark, source, root, head=49, batch_size=10, bucket_size=10)
    assert latest_ingested_block(spark, f"{root}/block") == 49

    # reorg detected at block 35: drop bucket 3 and later everywhere
    removed = invalidate_from(spark, root, 35, bucket_size=10)
    assert "block/block_id_group=3" in removed
    assert "block/block_id_group=4" in removed
    assert latest_ingested_block(spark, f"{root}/block") == 29

    # next incremental run re-ingests from the fork point
    run_incremental(spark, source, root, head=49, batch_size=10, bucket_size=10)
    assert latest_ingested_block(spark, f"{root}/block") == 49
    assert spark.read.parquet(f"{root}/block").count() == 50
