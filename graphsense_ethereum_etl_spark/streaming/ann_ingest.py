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

Delivery semantics: EXACTLY-ONCE. Structured Streaming replays the
in-flight micro-batch after a crash (at-least-once delivery), but each
add's visibility point is the codes MANIFEST commit (one pointer rename),
and the (checkpoint, batch_id) idempotency token rides INSIDE the
committed manifest doc — so "was this batch applied?" and "are its rows
readable?" are the same atomic fact. A replayed batch either finds its
token committed (skip: its rows are live) or not (its previous attempt's
files are unreferenced orphans, invisible to every reader; the replay
encodes again — bit-identical, frozen frames — and commits once).
Orphans are reclaimed by compact_ivfpq_index's directory rewrite. The
only loss window is METRICS: a crash between the manifest commit and the
meta.json drift-stat write under-counts cumulative drift, never the
index.

Single-writer per batch is enforced by ivfpq_add's advisory flock;
foreachBatch invocations within one query are serialized by Structured
Streaming anyway.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def _checkpoint_key(checkpoint: str) -> str:
    return hashlib.sha256(checkpoint.encode()).hexdigest()[:12]


def stream_progress(index_root: str, checkpoint: str) -> int:
    """The highest batch_id this checkpoint has committed into the index
    (-1 when none) — read from the current codes manifest's token map."""
    from ..operators.similarity import _codes_manifest

    man = _codes_manifest(index_root)
    if man is None:
        return -1
    return man.get("tokens", {}).get(_checkpoint_key(checkpoint), -1)


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
    Every micro-batch is one ivfpq_add carrying its (checkpoint,
    batch_id) token: frozen-frame encode, orphan-safe append, ONE atomic
    manifest commit that simultaneously publishes the rows and records
    the token, drift stats folded into meta.json. Requires an existing
    build_ivfpq_index root; see the module docstring for the
    exactly-once argument."""
    from ..operators.similarity import _ivfpq_meta, ivfpq_add

    _ivfpq_meta(index_root)  # existence + param sanity before starting
    spark = vec_stream.sparkSession
    key = _checkpoint_key(checkpoint)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ivfpq_add(
            spark,
            index_root,
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
            token=(key, int(batch_id)),
        )

    q = (
        vec_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
