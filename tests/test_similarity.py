"""IVF ANN operator tests beyond the oracle query: Lloyd training iterations
(the rows-only path) still produce a well-formed index, and probing more
clusters monotonically improves recall vs the exact baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphsense_ethereum_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from graphsense_ethereum_etl_spark.queries import load


def test_ivf_with_training_iterations(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    out = ivf_topk(emb, queries, n_clusters=8, nprobe=2, k=5, iters=1)
    rows = out.collect()
    assert len(rows) == 3 * 5
    assert all(r["rank"] >= 1 and r["rank"] <= 5 for r in rows)


def test_ivf_recall_improves_with_nprobe(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["cand_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(nprobe):
        approx = {
            (r["query_id"], r["cand_id"])
            for r in ivf_topk(emb, queries, n_clusters=8, nprobe=nprobe, k=5).collect()
        }
        return len(approx & exact) / len(exact)

    r2, r8 = recall(2), recall(8)
    assert r8 >= r2
    assert r8 == 1.0  # nprobe = n_clusters probes everything → exact
