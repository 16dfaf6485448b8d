"""Streaming ANN index ingestion — ivfpq_add as a Structured Streaming
sink (engine extension; SURVEY.md §2.10 composed with the sim10 persisted
IVF-PQ lifecycle).

The batch half (operators/similarity.py::ivfpq_add) already has the
property a streaming sink needs: a batch encodes against the FROZEN
coarse/codebook frames in one map-only pass and APPENDS new files without
reading the index, so per-micro-batch cost is independent of index size.
This module drives it with ``foreachBatch`` + ``availableNow`` — the
run_streaming_bloom_gate shape — so a vector feed (an embedding pipeline's
output directory, a Kafka topic at cluster scale) flows straight into the
searchable index as it lands.

Delivery semantics: Structured Streaming replays the in-flight micro-batch
after a crash (at-least-once), and a replayed ivfpq_add would append its
rows AGAIN — unlike dd11's admit path there is no anti-join against the
index, by design (adds never read the codes relation). Two mechanisms keep
the index correct anyway:

  - REPLAY SKIP: applied (checkpoint, batch_id) pairs are recorded in a
    ``_stream_progress.json`` sidecar inside the index root (written
    temp-then-rename, so the record itself can't tear), and ``handle``
    skips any batch at-or-below the recorded high-water mark — the
    standard idempotent-foreachBatch pattern. This removes every replay
    EXCEPT a crash landing exactly between the codes append and the
    progress write.
  - REPAIR: in that one window the replay double-appends the batch.
    Because the encode is a pure function of the frozen frames, the
    duplicate rows are bit-identical, so ``compact_ivfpq_index`` (which
    now drops exact duplicate (cand_id) rows during its rewrite) restores
    the index; searches between crash and compact may score the affected
    candidates twice (the documented at-least-once caveat, same contract
    as the Bloom gate's survivor append).

Single-writer assumption: like the micro-batch ingest loop's flock, one
streaming writer per index root — foreachBatch invocations are serialized
within a query, and concurrent queries over different checkpoints would
interleave progress records.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

_PROGRESS = "_stream_progress.json"


def _progress_path(index_root: str) -> str:
    return f"{index_root}/{_PROGRESS}"


def _read_progress(index_root: str) -> dict:
    try:
        with open(_progress_path(index_root)) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return {}


def _write_progress(index_root: str, prog: dict) -> None:
    # temp-then-rename: the progress record itself can never tear
    tmp = _progress_path(index_root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(prog, fh)
    os.replace(tmp, _progress_path(index_root))


def _checkpoint_key(checkpoint: str) -> str:
    return hashlib.sha256(checkpoint.encode()).hexdigest()[:12]


def run_streaming_ann_add(
    vec_stream: DataFrame,
    index_root: str,
    checkpoint: str,
    id_col: str | None = None,
    vec_col: str | None = None,
    timeout_s: int = 120,
) -> StreamingQuery:
    """Drain the pending vector feed into the persisted IVF-PQ index with
    ``foreachBatch`` + ``availableNow`` (resume from the checkpoint).
    Every micro-batch is one ivfpq_add: frozen-frame encode, append,
    drift stats folded into meta.json — so the cumulative drift signal
    keeps working across the stream. Requires an existing
    build_ivfpq_index root; see the module docstring for the
    at-least-once window and its compact repair."""
    from ..operators.similarity import _ivfpq_meta, ivfpq_add

    _ivfpq_meta(index_root)  # existence + param sanity before starting
    spark = vec_stream.sparkSession
    key = _checkpoint_key(checkpoint)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        prog = _read_progress(index_root)
        if batch_id <= prog.get(key, -1):
            return  # replayed batch already applied — skip, don't re-append
        ivfpq_add(spark, index_root, batch_df, id_col=id_col, vec_col=vec_col)
        prog[key] = batch_id
        _write_progress(index_root, prog)

    q = (
        vec_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
