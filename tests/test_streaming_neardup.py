"""Streaming near-duplicate gate (streaming/neardup.py): planted near-dups
arriving in LATER micro-batches are dropped against the accumulated
fingerprint index, and the stream's survivor set is EXACTLY the batch rule
"keep docs with no SimHash pair to a lower id" on the same corpus."""

from __future__ import annotations

from pyspark.sql import functions as F


def _corpus():
    """Docs with planted near-dup families across batch boundaries.

    Family heads draw 60 words from independent random vocabularies (so
    unrelated heads sit ~32 SimHash bits apart); near-dups substitute ONE
    word of a head (a few bit flips). Batches split by id so near-dups of
    batch-1 docs arrive in batches 2/3.
    """
    import random

    def head(seed: int) -> list[str]:
        rnd = random.Random(1000 + seed)
        return [f"w{rnd.randrange(100000)}" for _ in range(60)]

    def neardup(seed: int, sub: int) -> str:
        words = head(seed)
        words[sub] = f"sub{seed}x{sub}"
        return " ".join(words)

    rows = []
    rows += [(i, " ".join(head(i))) for i in range(0, 6)]      # batch 1 heads
    rows += [(10 + i, neardup(i, 7)) for i in range(0, 3)]     # batch 2: near-dups of 0-2
    rows += [(13, " ".join(head(20))), (14, " ".join(head(21)))]  # batch 2 novel
    rows += [(20 + i, neardup(i, 11)) for i in range(3, 6)]    # batch 3: near-dups of 3-5
    rows += [(26, " ".join(head(22)))]                         # batch 3 novel
    rows += [(27, neardup(20, 9))]                             # batch 3: near-dup of batch-2 doc 13
    return rows


def _batch_rule_survivors(spark, rows, max_hamming, n_pieces):
    """Ground truth: ids with no simhash pair to a LOWER id on the corpus."""
    from graphsense_ethereum_etl_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_hamming_pairs(docs, max_hamming=max_hamming, n_pieces=n_pieces)
    dropped = {r.id_b for r in pairs.collect()}  # pairs are id-normalized
    return {i for i, _ in rows} - dropped


def test_streaming_neardup_gate_matches_batch_rule(spark, tmp_path):
    from graphsense_ethereum_etl_spark.streaming.neardup import (
        run_streaming_neardup_gate,
    )

    rows = _corpus()
    max_hamming, n_pieces = 6, 8  # 8-bit pieces; planted pairs sit <= 5 apart
    expected = _batch_rule_survivors(spark, rows, max_hamming, n_pieces)
    # the corpus must actually exercise the gate in both directions
    planted_dups = {10, 11, 12, 20, 21, 22, 27}
    assert planted_dups.isdisjoint(expected)
    assert {13, 14, 26} <= expected

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def run():
        stream = spark.readStream.schema(schema).json(src)
        run_streaming_neardup_gate(
            stream, out, idx, ckpt, max_hamming=max_hamming, n_pieces=n_pieces
        )

    batches = [
        [r for r in rows if r[0] < 10],
        [r for r in rows if 10 <= r[0] < 20],
        [r for r in rows if r[0] >= 20],
    ]
    survivors_after = []
    for batch in batches:
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).json(src)
        run()
        survivors_after.append(
            {r.doc_id for r in spark.read.parquet(out).collect()}
        )

    assert survivors_after[-1] == expected
    # batch-2 near-dups of batch-1 content were dropped as they arrived
    assert survivors_after[1] - survivors_after[0] == {13, 14}
    # index accumulated EVERY doc's fingerprint (dropped docs included)
    n_indexed = spark.read.parquet(idx).select("doc_id").distinct().count()
    assert n_indexed == len(rows)
    # survivors keep their full rows (id + text), not just ids
    row = spark.read.parquet(out).filter(F.col("doc_id") == 13).collect()[0]
    assert dict(rows)[13] == row.text
