"""Streaming Bloom-filter dedup gate (engine extension; SURVEY.md §2.10 +
the dd10 membership family made operational).

``streaming_first_seen`` (stateful.py) keeps exact first-seen state in the
state store — per-key state that grows with the number of distinct
fingerprints. ``neardup.py`` keeps a parquet fingerprint INDEX — 16
bytes/doc, still corpus-sized. This module is the third point on that
curve, the one Dolma's dedupe pass actually runs at web scale: cross-batch
state is a CONSTANT-SIZE Bloom filter (m bits, default 2^16 → 2048 BIGINT
words ≈ 16 KiB at rest), so the gate's state cost is independent of corpus
size and the per-batch probe is map-only against a broadcast word map.

Semantics (deterministic given the batch sequence): a document is DROPPED
iff its fingerprint (md5 of normalized text) is Bloom-positive against the
filter accumulated from earlier batches, or a lower-id row of its own batch
carries the same fingerprint. Guarantees:

  - NO false negatives, ever: a true duplicate of any earlier SURVIVOR is
    always dropped (its fp's bits were set when the survivor passed), so
    the survivor set has globally distinct fingerprints — the invariant
    ``tests/test_streaming_bloomgate.py`` asserts.
  - False positives drop novel documents at the filter's FP rate
    (~(1-e^{-kn/m})^k — size m for the corpus; the tradeoff that buys
    constant state). FP verdicts are fp-deterministic: if a fingerprint is
    FP-dropped once, every later occurrence is dropped too (same bits), so
    the output is consistent — never "dropped here, kept there".

State layout + crash story: the filter directory is APPEND-ONLY parquet of
(word_idx, word) rows; readers OR the words per index (``read_bloom``).
bit_or is idempotent and commutative — the HLL-rollup replay argument
(streaming/incremental.py). Survivors are written BEFORE the words on
purpose: a crash after the words append replays the batch into a full
no-op (every survivor's fp now probes positive, so nothing re-emits and
the word append ORs to itself); a crash between the survivor write and the
words append re-appends the survivors (at-least-once output, the
neardup.py caveat — route through the versioned sink for exactly-once).
The reversed order would LOSE the batch's survivors on replay. Only
survivors' words are appended: an in-batch duplicate shares its keeper's fingerprint (same
words) and an FP-dropped document's bits are already set by definition, so
survivors-only appends lose nothing (asserted in tests).

At 100 TB: the per-batch cost is one fingerprint projection, one window on
fp within the batch, k broadcast map probes per row, and a ≤2048-row
append. Nothing corpus-sized moves, nothing corpus-sized is stored, and
the filter can be unioned across independent pipelines by bit_or — the
incremental property ``test_bloom_union_is_incremental`` pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("word_idx", T.LongType(), False),
        T.StructField("word", T.LongType(), False),
    ]
)

DEFAULT_M_BITS = 65536
DEFAULT_K_HASHES = 4


def ensure_gate_params(filter_dir: str, m_bits: int, k_hashes: int) -> None:
    """Create-or-verify the filter directory's ``_gate_params.json``.

    The word relation is meaningless without the (m_bits, k_hashes) that
    positioned its bits: probing an accumulated filter with DIFFERENT
    parameters silently lands on the wrong positions, and the gate's
    no-false-negative guarantee inverts — true duplicates pass as novel
    (reproduced in tests). The sidecar pins the parameters at first use;
    every later run of the driver loop verifies before touching the
    filter. Concurrent pipelines sharing one filter write identical
    sidecars, so the create path is race-benign."""
    import json
    import os

    os.makedirs(filter_dir, exist_ok=True)
    path = os.path.join(filter_dir, "_gate_params.json")
    want = {"m_bits": int(m_bits), "k_hashes": int(k_hashes)}
    if os.path.exists(path):
        with open(path) as fh:
            have = json.load(fh)
        if have != want:
            raise ValueError(
                f"bloom gate parameter mismatch for {filter_dir}: filter "
                f"was built with {have}, this run asked for {want} — "
                "probing with different parameters silently breaks the "
                "no-false-negative contract; use a fresh --filter-dir or "
                "the original parameters"
            )
        return
    with open(path, "w") as fh:
        json.dump(want, fh)


def read_bloom(spark, filter_dir: str) -> DataFrame:
    """Collapse the append-only filter directory into one word per index.

    Missing/empty directory → empty relation (every probe misses)."""
    try:
        raw = spark.read.schema(BLOOM_SCHEMA).parquet(filter_dir)
        raw.schema  # force resolution so a missing dir fails here
        has = len(raw.take(1)) > 0
    except Exception:
        has = False
    if not has:
        return spark.createDataFrame([], BLOOM_SCHEMA)
    return raw.groupBy("word_idx").agg(F.expr("bit_or(word)").alias("word"))


def bloom_gate_batch(
    batch: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> tuple[DataFrame, DataFrame]:
    """One gate step: returns ``(survivor_ids, survivor_words)``.

    ``survivor_ids`` — (doc_id) rows that are first-of-fingerprint within
    the batch (lowest id wins) AND Bloom-negative against the accumulated
    filter. ``survivor_words`` — the survivors' (word_idx, word) relation,
    ready to append to the filter directory.

    NULL fingerprints (NULL text) are exempt from BOTH dedup stages —
    a document that can't be fingerprinted can't be a duplicate of
    anything, so every such row passes. The exemption must be explicit
    in the in-batch stage too: the first-of-fingerprint window groups
    ALL NULL fps into one partition, and unexempted it silently dropped
    every NULL-text doc but the batch's first (the randomized-schedule
    fuzz caught it with two NULL-text docs in one batch)."""
    from ..functions.text import fingerprint
    from ..operators.dedup import bloom_build, bloom_probe

    fps = batch.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        fingerprint(text_col).alias("fp"),
    )
    first = (
        fps.withColumn(
            "_rk",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .filter(F.col("fp").isNull() | (F.col("_rk") == 1))
        .drop("_rk")
    )
    novel = bloom_probe(
        first, bloom, fp_col="fp", m_bits=m_bits, k_hashes=k_hashes,
        out_col="_seen",
    ).filter(~F.col("_seen"))
    survivors = novel.select("doc_id", "fp")
    words = bloom_build(
        survivors.select("fp"), fp_col="fp", m_bits=m_bits, k_hashes=k_hashes
    )
    return survivors.select("doc_id"), words


def run_streaming_bloom_gate(
    docs_stream: DataFrame,
    out_dir: str,
    filter_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
    timeout_s: int = 120,
) -> StreamingQuery:
    """Drive the gate with ``foreachBatch`` + ``availableNow`` (drain
    pending then stop; resume from the checkpoint). Survivor ROWS land in
    ``out_dir``; the filter accumulates in ``filter_dir`` as append-only
    words. foreachBatch invocations are serialized by Structured
    Streaming, so batch N always probes the filter including batch N−1.
    The filter directory's parameter sidecar is created/verified up
    front — resuming an accumulated filter with different
    (m_bits, k_hashes) is a hard error, not a silent false-negative
    source."""
    ensure_gate_params(filter_dir, m_bits, k_hashes)
    spark = docs_stream.sparkSession

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        bloom = read_bloom(spark, filter_dir)
        survivors, words = bloom_gate_batch(
            batch_df,
            bloom,
            text_col=text_col,
            id_col=id_col,
            m_bits=m_bits,
            k_hashes=k_hashes,
        )
        (
            batch_df.join(
                survivors,
                batch_df[id_col].cast("bigint") == survivors.doc_id,
                "left_semi",
            )
            .write.mode("append")
            .parquet(out_dir)
        )
        words.write.mode("append").parquet(filter_dir)

    q = (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
