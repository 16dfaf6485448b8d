"""Streaming source over a versioned table's COMMIT LOG — the Delta
"streaming from a table" analog (`spark.readStream.format("vtchanges")`),
built on the Python Data Source API like ``ethrpc`` (datasource.py).

Design decision — events, not rows: the stream emits one tiny row per NEW
COMMITTED VERSION (version, prev_version, manifest name, changed-partition
count), not the row-level feed itself. Row-level diffing needs the full
DataFrame engine (bag-semantics exceptAll over only the changed
partitions — ``versioned.py::read_changes``), which a Python data-source
``read()`` cannot host; re-deriving it executor-side would re-implement
the diff badly. Instead ``streaming/cdf.py::run_streaming_cdf`` pairs
this source with ``foreachBatch``: the checkpointed offset gives
exactly-once VERSION accounting (resume, replay, backfill-from-version),
and each version's row-level feed is produced by the proven batch
primitive with all its scale properties (dir-identity pruning,
O(changed partitions)). This is the repo's standard streaming shape —
stream owns progress, foreachBatch reuses the batch operator
(structured.py::run_stream_merge, neardup.py).

Offsets are ``{"version": V}`` = "all commits with seq <= V consumed".
``latestOffset`` re-reads the published pointer (one small file); a
version must survive until its batch commits — the same vacuum
grace-window contract time travel already imposes (keep_manifests >
stream lag).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_POINTER = "_MANIFEST"
_MANIFEST_DIR = "_manifests"

SCHEMA = (
    "version bigint, prev_version bigint, manifest string, "
    "n_changed_partitions int"
)


def _published_seq(root: str) -> int | None:
    try:
        with open(f"{root}/{_POINTER}") as fh:
            name = fh.read().strip()
    except FileNotFoundError:
        return None
    return int(name.split("-")[1].split(".")[0]) if name else None


def _committed_versions(root: str) -> list[int]:
    """Committed version seqs, oldest first (crash-debris manifests newer
    than the pointer excluded — versioned.py::history's rule)."""
    published = _published_seq(root)
    if published is None:
        return []
    return sorted(
        seq
        for seq in (
            int(n.split("-")[1].split(".")[0])
            for n in os.listdir(f"{root}/{_MANIFEST_DIR}")
        )
        if seq <= published
    )


def _partitions_of(root: str, version: int) -> dict[str, str]:
    with open(f"{root}/{_MANIFEST_DIR}/m-{version:08d}.json") as fh:
        return json.load(fh)["partitions"]


class _VersionSpan(InputPartition):
    def __init__(self, root: str, pairs: list[tuple[int, int]]) -> None:
        self.root = root
        self.pairs = pairs  # [(prev_version, version), ...]


class VTableChangesDataSource(DataSource):
    """``format("vtchanges")`` — options: ``root`` (versioned table root,
    required), ``startVersion`` (first version to emit, default: emit only
    versions committed AFTER the stream starts; 0 replays the full
    surviving history)."""

    @classmethod
    def name(cls) -> str:
        return "vtchanges"

    def schema(self):
        return SCHEMA

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _VTableChangesStreamReader(self.options)


class _VTableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict[str, str]) -> None:
        if "root" not in options:
            raise ValueError("vtchanges requires .option('root', <table root>)")
        self.root = options["root"].rstrip("/")
        self.start_version = (
            int(options["startversion"])
            if "startversion" in options
            else None
        )

    def initialOffset(self) -> dict:
        if self.start_version is not None:
            # emit history from start_version on: position BEFORE it
            versions = _committed_versions(self.root)
            before = [v for v in versions if v < self.start_version]
            return {"version": before[-1] if before else -1}
        # default: only versions committed after stream start
        published = _published_seq(self.root)
        return {"version": -1 if published is None else published}

    def latestOffset(self) -> dict:
        published = _published_seq(self.root)
        return {"version": -1 if published is None else published}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        versions = [v for v in _committed_versions(self.root) if v <= hi]
        pairs = []
        prev = None
        for v in versions:
            if v > lo and prev is not None:
                pairs.append((prev, v))
            elif v > lo and prev is None:
                # first surviving version in range: its "prev" is an empty
                # table (version -1 convention — the whole version is new)
                pairs.append((-1, v))
            prev = v
        return [_VersionSpan(self.root, pairs)]

    def read(self, partition: _VersionSpan) -> Iterator[tuple[Any, ...]]:
        for prev, cur in partition.pairs:
            new = _partitions_of(partition.root, cur)
            old = (
                _partitions_of(partition.root, prev) if prev >= 0 else {}
            )
            changed = sum(
                1 for p in set(old) | set(new) if old.get(p) != new.get(p)
            )
            yield (cur, prev, f"m-{cur:08d}.json", changed)

    def commit(self, end: dict) -> None:
        pass  # offsets are self-describing; nothing to clean up


def register_vtchanges(spark) -> None:
    """Register the source on the session (per-session, like ethrpc)."""
    spark.dataSource.register(VTableChangesDataSource)
