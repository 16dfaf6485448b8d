"""Streaming NEAR-duplicate gate (engine extension; SURVEY.md §2.10 +
north-star dedup family).

``streaming_first_seen`` (stateful.py) drops EXACT cross-batch duplicates by
fingerprint equality. This module drops *near*-duplicates: each micro-batch
is SimHash-fingerprinted, checked against the accumulated fingerprint index
AND against its own lower-id rows with the same piece-banding Hamming join
the batch path uses (dd5), and only first-seen-novel documents pass the
gate.

Semantics (deterministic, batch-equivalent): a document is DROPPED iff it
has a Hamming-≤d near-duplicate among all documents that arrived before it —
earlier micro-batches, or lower doc_id within its own batch. Dropped
documents' fingerprints STAY in the index (a near-dup of a dropped doc is
still a near-dup of content the stream already saw), which makes the gate's
output exactly the batch rule "keep docs with no dd5 pair to a lower id" —
the property ``tests/test_streaming_neardup.py`` asserts against
``simhash_hamming_pairs`` on the same corpus.

State layout: the fingerprint index is a plain parquet table of
(doc_id, simhash) — 16 bytes/doc, appended once per batch. Unlike keyed
state-store state, it is shared by ALL piece buckets of the banding join,
readable by batch jobs, and compactable/versionable offline (the versioned
sink (versioned.py) can make the append atomic if exactly-once output
matters; with the plain appends here a crash between write and checkpoint
commit replays the batch — duplicate index rows are harmless to the
Hamming-match semantics, survivor re-appends make output at-least-once).

At 100 TB: per batch, one fingerprint aggregation over the batch (map-side
majority votes), one banded join of |batch| probes against the index — the
index side shuffles on (piece, value) keys only; no all-pairs, no driver
state. For giant indexes, persist the index bucketed by piece value so the
per-batch join is exchange-free on the index side (write_bucketed pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("simhash", T.LongType()),
    ]
)


def near_dup_gate_batch(
    batch: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    max_hamming: int = 3,
    n_pieces: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """One gate step: returns ``(survivor_ids, batch_fingerprints)``.

    ``survivor_ids`` — batch ids with NO Hamming-≤d match in ``index`` and
    no match to a lower-id row of the same batch (and whose id is not
    already indexed). ``batch_fingerprints`` — (doc_id, simhash) for EVERY
    batch row, to be appended to the index regardless of survival."""
    from ..operators.dedup import fingerprint_hamming_pairs, simhash

    fps = simhash(batch, text_col=text_col, id_col=id_col, bits=bits).select(
        F.col(id_col).cast("bigint").alias("doc_id"), "simhash"
    )
    idx = index.select(F.col("doc_id").cast("bigint"), "simhash")
    both = fps.unionByName(idx)
    pairs = fingerprint_hamming_pairs(
        both,
        id_col="doc_id",
        fp_col="simhash",
        bits=bits,
        max_hamming=max_hamming,
        n_pieces=n_pieces,
    )
    idx_ids = idx.select(F.col("doc_id").alias("iid")).distinct()
    # Pairs are id-normalized (id_a < id_b). A batch doc X is dropped iff it
    # pairs with anything that arrived earlier: any index doc (either side),
    # or a lower-id batch doc (X on the b side). Index-index pairs drop
    # nothing. b-side ids not in the index: always dropped (the a side is
    # earlier — indexed or lower-id batch row). a-side ids not in the index:
    # dropped only when the b side IS indexed (arrived in an earlier batch).
    b_hits = pairs.join(
        idx_ids, pairs.id_b == idx_ids.iid, "left_anti"
    ).select(F.col("id_b").alias("doc_id"))
    a_hits = (
        pairs.join(idx_ids, pairs.id_b == idx_ids.iid, "left_semi")
        .join(
            idx_ids.withColumnRenamed("iid", "iid_a"),
            F.col("id_a") == F.col("iid_a"),
            "left_anti",
        )
        .select(F.col("id_a").alias("doc_id"))
    )
    dropped = b_hits.unionByName(a_hits).distinct()
    survivors = (
        fps.select("doc_id")
        .join(idx_ids, fps.doc_id == idx_ids.iid, "left_anti")
        .join(dropped, "doc_id", "left_anti")
    )
    return survivors, fps


def run_streaming_neardup_gate(
    docs_stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    max_hamming: int = 3,
    n_pieces: int = 4,
    timeout_s: int = 120,
) -> StreamingQuery:
    """Drive the gate over a document stream with ``foreachBatch`` +
    ``availableNow`` (drain-pending-then-stop; resume in the checkpoint).
    Survivor ROWS land in ``out_dir``; the fingerprint index accumulates in
    ``index_dir``. Index/batch interplay is sequential per micro-batch —
    Structured Streaming serializes foreachBatch invocations, so the batch-N
    index read always sees the batch-N−1 append."""
    spark = docs_stream.sparkSession

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        try:
            index = spark.read.schema(INDEX_SCHEMA).parquet(index_dir)
            # touch the plan so a missing/empty dir fails HERE, not mid-join
            index.schema
            has_index = len(index.take(1)) > 0
        except Exception:
            has_index = False
        if not has_index:
            index = spark.createDataFrame([], INDEX_SCHEMA)
        survivors, fps = near_dup_gate_batch(
            batch_df,
            index,
            text_col=text_col,
            id_col=id_col,
            bits=bits,
            max_hamming=max_hamming,
            n_pieces=n_pieces,
        )
        (
            batch_df.join(survivors, batch_df[id_col] == survivors.doc_id, "left_semi")
            .write.mode("append")
            .parquet(out_dir)
        )
        fps.write.mode("append").parquet(index_dir)

    q = (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
