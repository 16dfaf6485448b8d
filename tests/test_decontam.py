"""Unit tests for benchmark decontamination (operators/decontam.py) and
within-block cosine pairs (operators/similarity.py::cosine_pairs_within)."""

from __future__ import annotations

import pyspark.sql.functions as F

from graphsense_ethereum_etl_spark.operators.decontam import (
    ngram_contamination,
    word_ngrams,
)
from graphsense_ethereum_etl_spark.operators.similarity import (
    cosine_pairs_within,
)


def test_word_ngrams_basic_and_short(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "  x  y  z  ")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", word_ngrams("text", 3).alias("g")).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # shorter than n
    assert out[3] == ["x y z"]  # leading/trailing/multi-space tokenization


def test_contamination_flags_only_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares "quick brown fox"
            (2, "totally unrelated words here"),
            (3, "quick brown fox quick brown fox"),  # two windows, one distinct hit
        ],
        "doc_id int, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "a quick brown fox appears")], "doc_id int, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in ngram_contamination(corpus, eval_set, n=3).collect()
    }
    assert set(rows) == {1, 3}
    assert rows[1]["n_hit_grams"] == 1 and rows[1]["n_grams"] == 3
    # doc 3 has distinct grams only — the repeated window counts once
    assert rows[3]["n_hit_grams"] == 1


def test_contamination_clean_corpus_is_empty(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id int, text string"
    )
    eval_set = spark.createDataFrame(
        [(9, "epsilon zeta eta theta")], "doc_id int, text string"
    )
    assert ngram_contamination(corpus, eval_set, n=3).count() == 0


def test_cosine_pairs_within_respects_blocks(spark):
    # identical vectors in different blocks must NOT pair
    df = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [1.0, 0.0]),
            (3, 1, [1.0, 0.0]),
            (4, 1, [0.0, 1.0]),  # orthogonal to 3 → filtered by threshold
        ],
        "vec_id long, blk int, embedding array<double>",
    )
    pairs = cosine_pairs_within(df, block_col="blk", threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"], r["cluster"]) for r in pairs] == [(1, 2, 0)]
    assert abs(pairs[0]["score"] - 1.0) < 1e-9


def test_cosine_pairs_within_orders_ids(spark):
    df = spark.createDataFrame(
        [(10, 0, [1.0, 1.0]), (2, 0, [1.0, 1.0])],
        "vec_id long, blk int, embedding array<double>",
    )
    [r] = cosine_pairs_within(df, block_col="blk", threshold=0.9).collect()
    assert (r["id_a"], r["id_b"]) == (2, 10)
