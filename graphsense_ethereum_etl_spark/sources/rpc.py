"""JSON-RPC extraction source (SURVEY.md §2.1 S1-S3), Spark-native.

The reference pulls blocks/txs/receipts/logs/traces from an Ethereum node via
batched JSON-RPC with a 5-thread pool (eth_cassandra_streaming.py:99-180).
The Spark shape: distribute the *block-id range* across executors
(``spark.range`` → ``repartition``), then each task fetches its contiguous
id-batch with batched RPC inside ``mapInPandas`` (Arrow batches out). Task
parallelism replaces the thread pool; at 1000 executors this scales the
extraction linearly while keeping each RPC batch bounded.

No Ethereum node exists in this harness, so the transport is pluggable:
``fetcher`` takes a list of block ids and returns per-entity record batches.
The default raises ``NotImplementedError`` (clearly-marked stub); tests
inject a deterministic fake (see sources/generator.py for the schema-shaped
equivalent). The web3 import is gated — absent in this container.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import RAW_BLOCK

BatchFetcher = Callable[[list[int]], list[dict[str, Any]]]


def default_rpc_fetcher(provider_uri: str) -> BatchFetcher:
    """Real-node fetcher factory. Requires web3 (not installed here) — the
    reference's equivalent is ExportBlocksJob over batched JSON-RPC
    (eth_cassandra_streaming.py:107-133)."""
    try:
        import web3  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "JSON-RPC extraction needs the 'web3' package and a reachable "
            "Ethereum node; neither exists in this environment. Inject a "
            "'fetcher' callable instead."
        ) from exc
    raise NotImplementedError("real RPC transport is out of harness scope")


def fetch_blocks(
    spark: SparkSession,
    start_block: int,
    end_block: int,
    fetcher: BatchFetcher,
    rpc_batch_size: int = 50,
    tasks: int | None = None,
) -> DataFrame:
    """Distributed extraction: partition [start_block, end_block] into tasks,
    fetch each task's ids in ``rpc_batch_size`` chunks (mirroring the
    reference's batch_size=50, eth_cassandra_streaming.py:586), emit Arrow
    batches with the RAW_BLOCK schema."""
    n_ids = end_block - start_block + 1
    if tasks is None:
        tasks = max(1, min(spark.sparkContext.defaultParallelism, n_ids))
    ids = spark.range(start_block, end_block + 1, 1, tasks)
    fields = [f.name for f in RAW_BLOCK.fields]

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            block_ids = pdf["id"].tolist()
            for lo in range(0, len(block_ids), rpc_batch_size):
                chunk = block_ids[lo : lo + rpc_batch_size]
                records = fetcher(chunk)
                out = pd.DataFrame.from_records(records, columns=fields)
                yield out

    return ids.mapInPandas(fetch_partition, schema=RAW_BLOCK)
