"""Randomized-schedule fuzz of the incremental ingest loop (r8).

The fixed-point crash tests (test_incremental.py) pin the three known
recovery semantics one at a time; this fuzz interleaves them: each seed
drives a random schedule of head advances, mid-batch crashes (children
written, marker not), hook crashes (after children, before marker), and
reorgs, then heals and extends to a common final head. The invariant is
CONTENT equality — every entity table byte-identical (as sorted rows) to
a single clean run — in both sink formats. This is the schedule-soak
style that found the r7 vacuum-destroys-table and r8 change-feed-schema
bugs in versioned.py; here it walks the ingest loop above it.
"""

from __future__ import annotations

import random

import pytest

from graphsense_ethereum_etl_spark.sources.generator import gen_chain
from graphsense_ethereum_etl_spark.streaming.incremental import (
    invalidate_from,
    latest_ingested_block,
    run_incremental,
)

TABLES = ["block", "transaction", "trace", "log"]
FINAL_HEAD = 79
BUCKET = 10
BATCH = 20


def source(spark, lo, hi):
    return gen_chain(spark, lo, hi, partitions=4)


def _read(spark, root, table, fmt):
    if fmt == "versioned":
        from graphsense_ethereum_etl_spark.versioned import VersionedTable

        return VersionedTable(spark, f"{root}/{table}").read()
    return spark.read.parquet(f"{root}/{table}")


def _content(spark, root, fmt):
    out = {}
    for t in TABLES:
        df = _read(spark, root, t, fmt)
        cols = sorted(df.columns)
        # repr-normalize cells: None sorts against typed values otherwise
        out[t] = sorted(
            tuple(repr(v) for v in r) for r in df.select(*cols).collect()
        )
    return out


@pytest.mark.parametrize("fmt", ["parquet", "versioned"])
@pytest.mark.parametrize("seed", range(4))
def test_random_crash_reorg_schedule_converges(spark, tmp_path, fmt, seed):
    rng = random.Random(1000 * (fmt == "versioned") + seed)
    root = str(tmp_path / "fuzz")
    head = -1

    def ingest(to_head, **kw):
        return run_incremental(
            spark, source, root, head=to_head, batch_size=BATCH,
            bucket_size=BUCKET, sink_format=fmt, **kw,
        )

    for _ in range(rng.randint(4, 7)):
        action = rng.choice(["advance", "crash", "hook_crash", "reorg"])
        if action == "advance":
            head = min(FINAL_HEAD, head + rng.randint(1, 35))
            ingest(head)
        elif action == "crash":
            target = min(FINAL_HEAD, max(head, 0) + rng.randint(5, 30))
            if target <= head:
                continue  # already at the final head: empty range, no batch
            k = rng.randint(0, 3)
            with pytest.raises(RuntimeError, match="injected crash"):
                ingest(target, fail_after_tables=k)
            # marker semantics: the sink never claims more than it ingested
            marker = latest_ingested_block(spark, f"{root}/block", fmt)
            assert marker is None or marker <= target
            ingest(target)  # heal
            head = target
        elif action == "hook_crash" and head >= 0:
            target = min(FINAL_HEAD, head + rng.randint(5, 30))
            if target == head:
                continue
            boom_at = rng.randint(1, 3)
            calls = {"n": 0}

            def hook(sp, raw, lo, hi):
                calls["n"] += 1
                if calls["n"] == boom_at:
                    raise RuntimeError("injected hook crash")

            try:
                ingest(target, on_batch=hook)
            except RuntimeError:
                pass  # hook crashed pre-marker: batch will replay
            ingest(target)  # heal (hook absent on replay is fine: no side table)
            head = target
        elif action == "reorg" and head >= BUCKET:
            fork = rng.randint(0, head)
            invalidate_from(spark, root, fork, bucket_size=BUCKET, sink_format=fmt)
            marker = latest_ingested_block(spark, f"{root}/block", fmt)
            assert marker is None or marker < (fork // BUCKET + 1) * BUCKET
            ingest(head)  # re-ingest to the same head

    ingest(FINAL_HEAD)
    assert latest_ingested_block(spark, f"{root}/block", fmt) == FINAL_HEAD

    ref = str(tmp_path / "ref")
    run_incremental(
        spark, source, ref, head=FINAL_HEAD, batch_size=BATCH,
        bucket_size=BUCKET, sink_format=fmt,
    )
    got, want = _content(spark, root, fmt), _content(spark, ref, fmt)
    for t in TABLES:
        assert got[t] == want[t], (
            f"seed {seed}/{fmt}: table {t} diverged from the clean run "
            f"({len(got[t])} vs {len(want[t])} rows)"
        )
