"""Approximate/exact nearest-neighbor search over an embedding column.

Two tiers (north-star surface):
  - brute-force cosine top-k: exact baseline — broadcast the (small) query
    set, score every (query, candidate) pair with a JVM-side double fold,
    take top-k per query with a window. Scales linearly in candidates ×
    queries; right answer for recall evaluation and small query batches.
  - sign-LSH (random hyperplane) bucketed ANN: the 100 TB path — hash each
    vector to a ``n_planes``-bit signature of deterministic pseudo-random
    hyperplanes; candidates = same-bucket pairs only, then exact re-score.
    Bucket join shuffles only (id, signature) pairs, never the full matrix.

Hyperplanes are derived deterministically from md5 of (plane, dim) — no RNG
state, reproducible across runs and engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest candidates
    (excluding self), ranked by (rounded score desc, candidate id).

    The rounding (9 dp) makes the rank ordering stable across engines whose
    last-bit float behavior might differ; ties then break on candidate id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine("qvec", "cvec"), 9).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("cand_id").cast("bigint"),
            F.round("score", 6).alias("score"),
            "rank",
        )
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d is derived from
    md5(plane:d) mapped to [-1, 1). No RNG state; reproducible anywhere."""
    comps = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        comps.append(int(h[:8], 16) / float(1 << 31) - 1.0)
    return comps


def sign_lsh_signatures(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector sign-LSH bucket id: bit p = [v · hyperplane_p > 0]."""
    sig = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = _hyperplane(p, dim)
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return embeddings.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def lsh_ann_pairs(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    min_score: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN candidate pairs: same-bucket vectors, exact-rescored with cosine.
    Shuffle cost is bounded by bucket sizes (2^n_planes buckets)."""
    sigs = sign_lsh_signatures(embeddings, n_planes, dim, id_col, vec_col)
    a = sigs.select(
        F.col("bucket"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = sigs.select(
        F.col("bucket"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.round(cosine("va", "vb"), 6).alias("score"),
        )
        .filter(F.col("score") >= min_score)
    )
