"""Streaming Bloom-filter dedup gate (streaming/bloomgate.py): exact
cross-batch dedup with CONSTANT-SIZE state — planted exact duplicates
(including normalized-form variants) arriving in later micro-batches are
dropped against the accumulated filter, survivors have globally distinct
fingerprints, and a replayed batch is a no-op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SCHEMA = "doc_id long, text string"


def _corpus():
    """Three batches with planted exact dups across boundaries.

    fingerprint() normalizes (lowercase, collapse whitespace), so doc 21 —
    a case/spacing variant of doc 1 — is an exact duplicate too."""
    b1 = [
        (0, "alpha beta gamma delta"),
        (1, "epsilon zeta eta theta"),
        (2, "iota kappa lambda mu"),
        (3, "alpha beta gamma delta"),  # in-batch dup of 0
    ]
    b2 = [
        (10, "nu xi omicron pi"),
        (11, "epsilon zeta eta theta"),  # cross-batch dup of 1
        (12, "rho sigma tau upsilon"),
    ]
    b3 = [
        (20, "phi chi psi omega"),
        (21, "  Epsilon ZETA   eta theta "),  # normalized dup of 1
        (22, "nu xi omicron pi"),  # cross-batch dup of 10
    ]
    return b1, b2, b3


def test_streaming_bloom_gate_first_seen_across_batches(spark, tmp_path):
    from graphsense_ethereum_etl_spark.streaming.bloomgate import (
        read_bloom,
        run_streaming_bloom_gate,
    )

    b1, b2, b3 = _corpus()
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    flt = str(tmp_path / "filter")
    ckpt = str(tmp_path / "ckpt")

    survivors_after = []
    for batch in (b1, b2, b3):
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.mode(
            "append"
        ).json(src)
        stream = spark.readStream.schema(SCHEMA).json(src)
        run_streaming_bloom_gate(stream, out, flt, ckpt)
        survivors_after.append(
            {r.doc_id for r in spark.read.parquet(out).collect()}
        )

    # first-of-fingerprint survives; every later copy (in-batch, cross-batch,
    # normalized variant) is dropped. At m=2^16 with ~9 distinct fps the FP
    # probability is ~1e-10, so the exact rule is the expectation.
    assert survivors_after[-1] == {0, 1, 2, 10, 12, 20}
    assert survivors_after[0] == {0, 1, 2}
    # survivor fingerprints are globally distinct (the no-false-negative
    # guarantee: a duplicate of a survivor can never pass)
    from graphsense_ethereum_etl_spark.functions.text import fingerprint

    surv = spark.read.parquet(out).select(fingerprint("text").alias("fp"))
    assert surv.count() == surv.distinct().count()
    # survivor rows keep their payload
    row = spark.read.parquet(out).filter(F.col("doc_id") == 10).collect()[0]
    assert row.text == "nu xi omicron pi"

    # state is constant-size: the collapsed filter has at most m/32 words,
    # and equals the filter built from the survivors' fingerprints directly
    # (survivors-only appends lose nothing)
    from graphsense_ethereum_etl_spark.operators.dedup import bloom_build

    collapsed = {
        (r.word_idx, r.word) for r in read_bloom(spark, flt).collect()
    }
    assert len(collapsed) <= 65536 // 32
    direct = {
        (r.word_idx, r.word)
        for r in bloom_build(surv.distinct()).collect()
    }
    assert collapsed == direct


def test_bloom_gate_batch_replay_is_noop(spark, tmp_path):
    """After the words append, replaying the same batch emits zero
    survivors and leaves the collapsed filter unchanged — the crash-after-
    append story."""
    from graphsense_ethereum_etl_spark.streaming.bloomgate import (
        bloom_gate_batch,
        read_bloom,
    )

    flt = str(tmp_path / "filter")
    batch = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")], SCHEMA
    )
    bloom0 = read_bloom(spark, flt)
    surv, words = bloom_gate_batch(batch, bloom0)
    assert {r.doc_id for r in surv.collect()} == {0, 1}
    words.write.mode("append").parquet(flt)
    after_first = {
        (r.word_idx, r.word) for r in read_bloom(spark, flt).collect()
    }

    # replay: same batch against the now-updated filter
    surv2, words2 = bloom_gate_batch(batch, read_bloom(spark, flt))
    assert surv2.count() == 0
    words2.write.mode("append").parquet(flt)  # empty/idempotent append
    after_replay = {
        (r.word_idx, r.word) for r in read_bloom(spark, flt).collect()
    }
    assert after_replay == after_first


def test_bloom_gate_null_text_survives(spark, tmp_path):
    """A NULL-text doc has a NULL fingerprint — it can't be deduped, so it
    must pass the gate as novel and contribute nothing to the filter.
    Pre-fix, forall over its NULL probe positions evaluated to NULL and
    filter(~NULL) silently dropped the row; a NULL fp reaching bloom_build
    poisoned the word relation with a NULL map key (hard crash on the
    next batch's probe)."""
    from graphsense_ethereum_etl_spark.streaming.bloomgate import (
        bloom_gate_batch,
        read_bloom,
    )

    flt = str(tmp_path / "filter")
    b1 = spark.createDataFrame([(0, "alpha beta"), (1, None)], SCHEMA)
    surv, words = bloom_gate_batch(b1, read_bloom(spark, flt))
    assert {r.doc_id for r in surv.collect()} == {0, 1}
    words.write.mode("append").parquet(flt)

    # next batch: another NULL-text doc still survives (no bits were set
    # for doc 1) and the updated filter doesn't crash the probe
    b2 = spark.createDataFrame([(2, None), (3, "alpha beta")], SCHEMA)
    surv2, words2 = bloom_gate_batch(b2, read_bloom(spark, flt))
    assert {r.doc_id for r in surv2.collect()} == {2}
    assert all(r.word_idx is not None for r in words2.collect())


def test_gate_params_sidecar_blocks_mismatch(spark, tmp_path):
    """Probing an accumulated filter with different (m_bits, k_hashes)
    silently lands on the wrong bit positions and INVERTS the
    no-false-negative guarantee (a true duplicate passes as novel —
    reproduced before the sidecar existed). The driver loop pins the
    parameters at first use and hard-errors on mismatch."""
    import pytest as _pytest

    from graphsense_ethereum_etl_spark.streaming.bloomgate import (
        ensure_gate_params,
        run_streaming_bloom_gate,
    )

    flt = str(tmp_path / "filter")
    ensure_gate_params(flt, 65536, 4)
    ensure_gate_params(flt, 65536, 4)  # same params: idempotent
    with _pytest.raises(ValueError, match="parameter mismatch"):
        ensure_gate_params(flt, 4096, 4)
    with _pytest.raises(ValueError, match="parameter mismatch"):
        ensure_gate_params(flt, 65536, 2)

    # end-to-end: a second driver run with different m_bits refuses
    src = str(tmp_path / "src")
    spark.createDataFrame([(0, "alpha beta")], SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    run_streaming_bloom_gate(
        stream, str(tmp_path / "out"), flt, str(tmp_path / "ck"),
        m_bits=65536, k_hashes=4,
    )
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    with _pytest.raises(ValueError, match="parameter mismatch"):
        run_streaming_bloom_gate(
            stream2, str(tmp_path / "out2"), flt, str(tmp_path / "ck2"),
            m_bits=4096, k_hashes=4,
        )


def test_read_bloom_ignores_params_sidecar(spark, tmp_path):
    """The _gate_params.json sidecar lives inside the parquet filter dir;
    underscore-prefixed files are invisible to the parquet reader, so the
    word relation reads back unchanged."""
    from graphsense_ethereum_etl_spark.streaming.bloomgate import (
        bloom_gate_batch,
        ensure_gate_params,
        read_bloom,
    )

    flt = str(tmp_path / "filter")
    ensure_gate_params(flt, 65536, 4)
    batch = spark.createDataFrame([(0, "alpha beta")], SCHEMA)
    _surv, words = bloom_gate_batch(batch, read_bloom(spark, flt))
    words.write.mode("append").parquet(flt)
    got = read_bloom(spark, flt).collect()
    assert got and all(r.word_idx is not None for r in got)


@pytest.mark.parametrize("seed", list(range(8)))
def test_bloom_gate_randomized_schedules(spark, tmp_path_factory, seed):
    """Randomized multi-batch schedules (the soak pattern that keeps
    finding real bugs in the versioned table): random docs with planted
    cross-batch duplicates, normalization variants, NULL/empty texts,
    and a replayed batch. Invariants that hold regardless of Bloom false
    positives: (1) no two survivors across the whole run share a
    normalized fingerprint (the no-false-negative contract), (2) every
    NON-dropped distinct fingerprint's FIRST carrier is the survivor
    (lowest doc_id within its batch), (3) replaying a batch after its
    words landed emits zero survivors, (4) NULL-text docs always pass."""
    import random

    from graphsense_ethereum_etl_spark.streaming.bloomgate import (
        bloom_gate_batch,
        read_bloom,
    )

    rng = random.Random(7000 + seed)
    flt = str(tmp_path_factory.mktemp(f"bg{seed}") / "filter")
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

    def make_text(i):
        r = rng.random()
        if r < 0.1:
            return None
        if r < 0.2:
            return "  "  # whitespace-only: normalizes to ''
        words = [rng.choice(vocab) for _ in range(rng.randint(1, 4))]
        t = " ".join(words)
        if rng.random() < 0.3:
            t = "  " + t.upper().replace(" ", "   ") + " "  # norm variant
        return t

    next_id = 0
    survivors_fp = {}  # doc_id -> normalized fp key
    all_rows = []
    for _batch in range(rng.randint(3, 5)):
        rows = []
        for _ in range(rng.randint(2, 6)):
            rows.append((next_id, make_text(next_id)))
            next_id += 1
        if all_rows and rng.random() < 0.7:  # planted cross-batch dup
            rows.append((next_id, rng.choice(all_rows)[1]))
            next_id += 1
        all_rows.extend(rows)
        batch = spark.createDataFrame(rows, SCHEMA)
        surv, words = bloom_gate_batch(batch, read_bloom(spark, flt))
        got = sorted(r.doc_id for r in surv.collect())
        norm = {
            i: (" ".join(t.strip().lower().split()) if t is not None else None)
            for i, t in rows
        }
        for i in got:
            survivors_fp[i] = norm[i]
        # (2) a survivor is the lowest-id carrier of its fp in its batch
        for i in got:
            if norm[i] is None:
                continue
            assert i == min(j for j in norm if norm[j] == norm[i]), (
                f"seed {seed}: survivor {i} is not its batch's first carrier"
            )
        # (4) NULL-text docs always pass
        for i, t in rows:
            if t is None:
                assert i in got, f"seed {seed}: NULL-text doc {i} was dropped"
        words.write.mode("append").parquet(flt)
        # (3) immediate replay is a no-op
        surv2, _ = bloom_gate_batch(batch, read_bloom(spark, flt))
        replayed = {
            r.doc_id for r in surv2.collect() if norm[r.doc_id] is not None
        }
        assert not replayed, (
            f"seed {seed}: replay re-emitted non-NULL survivors {replayed}"
        )
    # (1) survivor fingerprints globally distinct (NULLs exempt)
    fps = [fp for fp in survivors_fp.values() if fp is not None]
    assert len(fps) == len(set(fps)), (
        f"seed {seed}: two survivors share a fingerprint — false negative"
    )
