"""Dedup operator units beyond the oracle queries: SimHash piece-banding is
LOSSLESS for the declared hamming budget (pigeonhole), and the guard on the
piece/budget relationship fires."""

from __future__ import annotations

import pytest

from graphsense_ethereum_etl_spark.operators.dedup import (
    simhash,
    simhash_hamming_pairs,
)
from graphsense_ethereum_etl_spark.queries import load


def test_simhash_banding_is_lossless_vs_brute_force(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter("doc_id < 120")
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_hamming_pairs(docs, max_hamming=3).collect()
    }
    sims = simhash(docs)
    a = sims.selectExpr("doc_id AS id_a", "simhash AS sa")
    b = sims.selectExpr("doc_id AS id_b", "simhash AS sb")
    brute = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in a.crossJoin(b)
        .filter("id_a < id_b")
        .selectExpr("id_a", "id_b", "CAST(bit_count(sa ^ sb) AS BIGINT) AS hamming")
        .filter("hamming <= 3")
        .collect()
    }
    assert banded == brute  # no candidate lost, no extra pair, same distances


def test_simhash_banding_guard(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter("doc_id < 5")
    with pytest.raises(ValueError, match="n_pieces > max_hamming"):
        simhash_hamming_pairs(docs, max_hamming=4, n_pieces=4)
