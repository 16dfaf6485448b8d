"""Spark 4 Python Data Source for chain extraction: ``spark.read
.format("ethrpc")`` — the idiomatic packaging of the JSON-RPC fetchers
(rpc.py) as a first-class source with planner-visible partitions.

Why a Data Source and not just ``mapInPandas`` (both exist here):
  - partition planning lives in the source (`partitions()` splits the block
    range into `rpc_batch_size`-aligned chunks), so Spark's scheduler sees
    one task per chunk with locality/retry semantics instead of an opaque
    map stage;
  - the reader composes with the standard reader API: ``.option()``s,
    schema projection, downstream pushdown all behave like any other
    source;
  - a future ``simpleStreamingReader`` makes the same source incrementally
    consumable without changing callers.

Registration is per-session: ``register_ethrpc(spark, post=...)``. The
transport's HTTP POST override threads through for recorded-fixture tests
(same pluggability as rpc.py — no node in this harness).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..schemas import RAW_BLOCK


class _BlockRange(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class EthRpcDataSource(DataSource):
    """``format("ethrpc")`` — options: ``uri`` (JSON-RPC endpoint),
    ``start``, ``end`` (inclusive block range), ``batch`` (ids per RPC
    batch & per planned partition, default 50)."""

    _test_post: Callable[[bytes], bytes] | None = None  # injected in tests

    @classmethod
    def name(cls) -> str:
        return "ethrpc"

    def schema(self):
        return RAW_BLOCK

    def reader(self, schema) -> DataSourceReader:
        return _EthRpcReader(self.options, type(self)._test_post)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _EthRpcStreamReader(self.options, type(self)._test_post)


class _EthRpcReader(DataSourceReader):
    def __init__(
        self, options: dict[str, str], post: Callable[[bytes], bytes] | None
    ) -> None:
        self.uri = options.get("uri", "http://localhost:8545")
        self.start = int(options["start"])
        self.end = int(options["end"])
        self.batch = int(options.get("batch", "50"))
        self._post = post

    def partitions(self) -> list[InputPartition]:
        """One planned partition per RPC batch — the scheduler, not the
        reader, owns the fan-out (task retries re-fetch only their chunk)."""
        return [
            _BlockRange(lo, min(lo + self.batch - 1, self.end))
            for lo in range(self.start, self.end + 1, self.batch)
        ]

    def read(self, partition: _BlockRange) -> Iterator[tuple[Any, ...]]:
        from .rpc import JsonRpcTransport, rpc_block_fetcher

        fetcher = rpc_block_fetcher(JsonRpcTransport(self.uri, post=self._post))
        fields = [f.name for f in RAW_BLOCK.fields]
        for rec in fetcher(list(range(partition.start, partition.end + 1))):
            yield tuple(rec[f] for f in fields)


class _EthRpcStreamReader(DataSourceStreamReader):
    """Streaming chain follower — the Structured-Streaming shape of the
    reference's ingest loop (SURVEY.md §3.1): the checkpointed offset
    ``{"next": <block id>}`` IS the resume marker, owned by the streaming
    checkpoint instead of a sink scan.

    Per trigger: ``latestOffset`` probes the node head via
    ``eth_blockNumber`` (S6) unless a fixed ``end`` bounds the backfill;
    ``partitions(start, end)`` splits the uncommitted range into
    ``batch``-aligned chunks (one executor task per RPC batch); ``read``
    re-fetchable by id, so recovery replays are idempotent.

    ``maxBlocksPerBatch`` (the reference's ``-b`` batching semantics,
    eth_cassandra_streaming.py:479-483): caps how far ``latestOffset`` may
    advance past the current position, so a long-idle stream resuming
    against a far-ahead head plans ceil(pending / cap) bounded micro-batches
    instead of ONE catch-up batch over millions of blocks (which would be a
    single all-or-nothing commit: no incremental checkpoints, cluster-sized
    task wave, full replay on any failure). Python stream readers don't
    receive the JVM's admission-control start offset, so the position is a
    driver-side cursor synced from ``initialOffset``, ``commit`` and every
    ``partitions(start, end)`` call. On RESTART the engine re-plans the last
    offset-log batch (``partitions`` of the restored range) before the first
    ``latestOffset`` — verified empirically, and the same engine contract
    pyspark's own ``_SimpleStreamReaderWrapper`` documents and depends on —
    so the cursor is always current before a cap is computed; the
    cursor-None fallback (cap relative to the configured ``start``) can
    only under-advance, never skip, and the next ``partitions`` re-syncs."""

    def __init__(
        self, options: dict[str, str], post: Callable[[bytes], bytes] | None
    ) -> None:
        self.uri = options.get("uri", "http://localhost:8545")
        self.start = int(options.get("start", "0"))
        self.end = int(options["end"]) if "end" in options else None
        self.batch = int(options.get("batch", "50"))
        self.max_blocks = (
            int(options["maxBlocksPerBatch"]) if "maxBlocksPerBatch" in options else None
        )
        if self.max_blocks is not None and self.max_blocks < 1:
            raise ValueError("maxBlocksPerBatch must be >= 1")
        self._cursor: int | None = None
        self._post = post

    def _transport(self):
        from .rpc import JsonRpcTransport

        return JsonRpcTransport(self.uri, post=self._post)

    def _head(self) -> int:
        if self.end is not None:
            return self.end
        [head_hex] = self._transport().request_batch([("eth_blockNumber", [])])
        return int(head_hex, 16)

    def initialOffset(self) -> dict:
        self._cursor = self.start
        return {"next": self.start}

    def latestOffset(self) -> dict:
        uncapped = self._head() + 1
        if self.max_blocks is None:
            return {"next": uncapped}
        base = self._cursor if self._cursor is not None else self.start
        capped = min(uncapped, base + self.max_blocks)
        # never regress behind a restored checkpoint ahead of `start`: Spark
        # planning clamps to max(committed, capped) via partitions(start, ...)
        self._cursor = capped
        return {"next": capped}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["next"]), int(end["next"]) - 1
        # authoritative sync: the batch being planned commits through `end`
        self._cursor = max(self._cursor or 0, int(end["next"]))
        return [
            _BlockRange(b, min(b + self.batch - 1, hi))
            for b in range(lo, hi + 1, self.batch)
        ] or [_BlockRange(lo, lo - 1)]

    def read(self, partition: _BlockRange) -> Iterator[tuple[Any, ...]]:
        if partition.end < partition.start:
            return iter([])
        from .rpc import rpc_block_fetcher

        fetcher = rpc_block_fetcher(self._transport())
        fields = [f.name for f in RAW_BLOCK.fields]
        return iter(
            tuple(rec[f] for f in fields)
            for rec in fetcher(list(range(partition.start, partition.end + 1)))
        )

    def commit(self, end: dict) -> None:
        # offsets are self-describing (no external cleanup); the commit just
        # keeps the rate-limit cursor in step with the engine's progress
        self._cursor = max(self._cursor or 0, int(end["next"]))


def register_ethrpc(spark, post: Callable[[bytes], bytes] | None = None) -> None:
    """Register the source on the session; ``post`` (test hook) overrides
    the transport's HTTP POST for every reader created afterwards.

    The override is baked into a DYNAMICALLY created subclass: workers
    resolve importable classes by module path (so a runtime attribute set
    on the module-level class would silently reset there) — an unimportable
    subclass forces cloudpickle to ship the class, attribute included, by
    value."""
    cls = EthRpcDataSource
    if post is not None:
        cls = type(
            "EthRpcDataSourceWithPost",
            (EthRpcDataSource,),
            {"_test_post": staticmethod(post)},
        )
    spark.dataSource.register(cls)
