"""Approximate/exact nearest-neighbor search over an embedding column.

Three tiers (north-star surface):
  - brute-force cosine top-k: exact baseline — broadcast the (small) query
    set, score every (query, candidate) pair with a JVM-side double fold,
    take top-k per query with a window. Scales linearly in candidates ×
    queries; right answer for recall evaluation and small query batches.
  - blocked all-pairs cosine (``blocked_cosine_pairs``): exact all-pairs ≥
    threshold via block-partitioned GEMM — rows tagged with their block-pair
    tasks (row-preserving, no ``collect_list`` packing), one
    ``applyInPandas`` group per block pair, chunk-tiled BLAS multiply. The
    classic distributed similarity-join layout: O(n²/B²) tasks each doing a
    GEMM, with per-task memory bounded by two blocks plus one score tile.
  - sign-LSH (random hyperplane) bucketed ANN: the 100 TB path — hash each
    vector to a ``n_planes``-bit signature of deterministic pseudo-random
    hyperplanes; candidates = same-bucket pairs only, then exact re-score.
    Bucket join shuffles only (id, signature) pairs, never the full matrix.

Hyperplanes are derived deterministically from md5 of (plane, dim) — no RNG
state, reproducible across runs and engines. Blocked-GEMM scores differ from
the sequential-fold oracle only by float-summation order (≈1e-15), far below
the 1e-6 rounding used for comparison.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, Window
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


def blocked_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    gemm_chunk: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine ≥ ``threshold`` via blocked GEMM.

    Row-preserving tiling: each vector row is tagged with the block-pair
    tasks it participates in (left side of pairs (blk, j ≥ blk), right side
    of pairs (i ≤ blk, blk)) via a cheap ``sequence`` explode — no
    ``collect_list`` packing, so no row ever approaches the JVM single-row /
    2 GB limit and the shuffle moves slim (pair, side, id, vec) rows. Each
    pair group lands in ONE ``applyInPandas`` task as Arrow batches; the
    kernel assembles the two sides' matrices and multiplies them with BLAS
    in ``gemm_chunk`` × ``gemm_chunk`` tiles, so peak task memory is the two
    block matrices plus one bounded score tile regardless of block size.

    Scale knobs: ``n_blocks`` bounds rows-per-task (grow it O(n) so a block
    stays ~constant); replication factor is n_blocks + 1 row copies, same
    asymptotics as the classic blocked layout but with streamable rows."""
    base = embeddings.select(
        (F.col(id_col) % n_blocks).cast("int").alias("blk"),
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<float>").alias("v"),
    )
    left = base.withColumn(
        "j", F.explode(F.expr(f"sequence(blk, {n_blocks - 1})"))
    ).select(
        (F.col("blk") * n_blocks + F.col("j")).alias("pair"),
        F.lit(0).alias("side"),
        "id",
        "v",
    )
    right = base.withColumn("i", F.explode(F.expr("sequence(0, blk)"))).select(
        (F.col("i") * n_blocks + F.col("blk")).alias("pair"),
        F.lit(1).alias("side"),
        "id",
        "v",
    )
    tagged = left.unionByName(right)

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        blk_l, blk_r = divmod(int(key[0]), n_blocks)
        l = pdf[pdf["side"] == 0]
        r = pdf[pdf["side"] == 1]
        if l.empty or r.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "score": []}).astype(
                {"id_a": "int64", "id_b": "int64", "score": "float64"}
            )
        ids_l = l["id"].to_numpy(dtype=np.int64)
        ids_r = r["id"].to_numpy(dtype=np.int64)
        m_l = np.array(l["v"].tolist(), dtype=np.float64)
        m_r = np.array(r["v"].tolist(), dtype=np.float64)
        # zero-norm guard: an all-zero embedding has no direction — its
        # similarity to anything is undefined; dividing by 1 leaves the
        # zero row, whose dot products are 0 and fail any threshold > 0
        # (deterministic exclusion instead of NaN + RuntimeWarning noise).
        n_l = np.linalg.norm(m_l, axis=1, keepdims=True)
        n_r = np.linalg.norm(m_r, axis=1, keepdims=True)
        m_l /= np.where(n_l == 0.0, 1.0, n_l)
        m_r /= np.where(n_r == 0.0, 1.0, n_r)
        out_a, out_b, out_s = [], [], []
        for a0 in range(0, len(ids_l), gemm_chunk):
            tile_l = m_l[a0 : a0 + gemm_chunk]
            for b0 in range(0, len(ids_r), gemm_chunk):
                scores = tile_l @ m_r[b0 : b0 + gemm_chunk].T
                ia, ib = np.nonzero(scores >= threshold)
                id_a = ids_l[a0 + ia]
                id_b = ids_r[b0 + ib]
                if blk_l == blk_r:
                    # diagonal pair: both sides hold the full block, each
                    # unordered pair appears twice — keep the ordered half
                    keep = id_a < id_b
                    lo, hi = id_a[keep], id_b[keep]
                else:
                    # off-diagonal: each unordered pair appears exactly once,
                    # but the smaller id may sit on either side — normalize
                    keep = id_a != id_b
                    lo = np.minimum(id_a[keep], id_b[keep])
                    hi = np.maximum(id_a[keep], id_b[keep])
                out_a.append(lo)
                out_b.append(hi)
                out_s.append(np.round(scores[ia[keep], ib[keep]], 6))
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "score": np.concatenate(out_s),
            }
        )

    return tagged.groupBy("pair").applyInPandas(
        kernel, schema="id_a bigint, id_b bigint, score double"
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d is derived from
    md5(plane:d) mapped to [-1, 1). No RNG state; reproducible anywhere."""
    comps = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        comps.append(int(h[:8], 16) / float(1 << 31) - 1.0)
    return comps


def _bucket_expr(vec_col: str, plane_offset: int, n_planes: int, dim: int):
    """Column: ``n_planes``-bit sign bucket using hyperplanes
    [plane_offset, plane_offset + n_planes). Bit p = [v · plane_p > 0],
    computed with the same sequential double fold as the cosine kernel so
    DuckDB's ``list_sum(list_transform(...))`` reproduces the sign exactly.

    The whole bucket is ONE parsed SQL expression (r13): building it from
    Column objects paid one py4j round trip per plane COMPONENT —
    PySpark's lit() turns a nested list into per-element CreateArray
    children, ~1,800 gateway calls per bucket, which made the BUILDER the
    hot path (2.7 of sim3's 3.5 s). A single F.expr string ships the
    constants to the JVM parser in one call; Catalyst folds the arrays to
    the same literals, so the executed plan (and every result) is
    unchanged — only driver-side construction gets cheaper."""
    planes = [_hyperplane(plane_offset + p, dim) for p in range(n_planes)]
    weights = [1 << p for p in range(n_planes)]
    planes_sql = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{c!r}D" for c in plane) + ")"
            for plane in planes
        )
        + ")"
    )
    weights_sql = "array(" + ", ".join(f"{w}L" for w in weights) + ")"
    return F.expr(
        f"aggregate(zip_with({planes_sql}, {weights_sql}, (plane, w) -> "
        f"CASE WHEN aggregate(zip_with({vec_col}, plane, "
        "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v) > 0 "
        "THEN w ELSE 0L END), 0L, (a, b) -> a + b)"
    )


def sign_lsh_signatures(
    embeddings: DataFrame,
    n_bands: int = 4,
    band_planes: int = 6,
    dim: int = 64,
    split_planes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded sign-LSH signatures: one row per (vector, band) with the band's
    primary ``band_planes``-bit bucket plus a ``split_planes``-bit sub-bucket
    (used by the bucket-size cap to re-split oversized buckets with MORE
    hyperplanes, preserving the similarity grouping).

    OR-amplification (b bands × r planes, the dd3/MinHash band layout): a
    pair is a candidate if it collides in ANY band — P(candidate) =
    1 − (1 − p^r)^b with p = 1 − θ/π, so recall for near-dups grows with b
    while the per-band bucket count 2^r (a free parameter: hyperplanes cost
    nothing to add) controls bucket sizes. Scale knobs at 100 TB: grow r with
    log2(n) to keep bucket sizes flat, grow b to buy recall back."""
    structs = []
    primary_total = n_bands * band_planes
    for b in range(n_bands):
        structs.append(
            F.struct(
                F.lit(b).alias("band"),
                _bucket_expr(vec_col, b * band_planes, band_planes, dim).alias(
                    "bucket"
                ),
                _bucket_expr(
                    vec_col, primary_total + b * split_planes, split_planes, dim
                ).alias("sub"),
            )
        )
    return embeddings.select(
        F.col(id_col), F.col(vec_col), F.explode(F.array(*structs)).alias("bb")
    ).select(id_col, vec_col, "bb.band", "bb.bucket", "bb.sub")


def lsh_planes_for(n: int, target_occupancy: int = 8, floor: int = 6) -> int:
    """Per-band plane count for a corpus of ``n`` vectors such that the
    MEAN bucket occupancy stays ≈ ``target_occupancy`` regardless of n:
    r = max(floor, ceil(log2(n / target))). With fixed planes, occupancy
    grows linearly with the corpus and same-bucket candidate PAIRS grow
    quadratically — the r8 shuffle-byte audit measured the fixed-6-plane
    sim3 at 35x shuffle bytes for 10x data; with r grown by log2(n) the
    bucket count tracks the corpus and candidates stay ~linear. Recall
    trade-off is the documented banding S-curve: near-duplicates (the
    dedup target) survive because their collision probability per plane
    is ≈ 1; mid-similarity recall is bought back with more bands, not
    fewer planes."""
    import math

    if n <= 0:
        return floor
    return max(floor, math.ceil(math.log2(max(1.0, n / target_occupancy))))


def lsh_ann_pairs(
    embeddings: DataFrame,
    n_bands: int = 4,
    band_planes: int = 6,
    dim: int = 64,
    min_score: float = 0.0,
    bucket_cap: int | None = None,
    split_planes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    auto_planes_target: int | None = None,
) -> DataFrame:
    """ANN candidate pairs: vectors sharing any band bucket, exact-rescored
    with cosine, deduped across bands.

    Bucket-size cap: buckets holding more than ``bucket_cap`` vectors are
    re-split by ``split_planes`` extra hyperplanes (sub-bucket), bounding the
    same-bucket self-join at Σ min(bucket, cap·2^split)² instead of Σ bucket²
    — the re-split keys stay similarity-preserving (more planes, not id
    hashing), so recall inside a hot bucket degrades gracefully rather than
    randomly. Refined ids are offset by 2^band_planes so split and unsplit
    buckets can never collide.

    ``auto_planes_target``: when set, ``band_planes`` is raised to
    ``lsh_planes_for(count, target)`` so bucket occupancy — and therefore
    candidate volume per vector — stays FLAT as the corpus grows (the one
    extra job is a count). The cap re-split then only handles skewed hot
    buckets, not uniform overflow. Callers measuring the fixed-parameter
    S-curve (sim5's recall panel) keep it unset.

    Every step (projection folds, window count, CASE re-split, pair join,
    rescore) is plain ANSI SQL over deterministic md5-derived plane literals
    — the DuckDB oracle reproduces the result bit-for-bit (queries.py
    sim3_lsh_ann splices the plane components into the SQL)."""
    if auto_planes_target is not None:
        band_planes = max(
            band_planes,
            lsh_planes_for(embeddings.count(), auto_planes_target, band_planes),
        )
    sigs = sign_lsh_signatures(
        embeddings, n_bands, band_planes, dim, split_planes, id_col, vec_col
    )
    # Candidate generation via ONE aggregation — no bucket self-join (which
    # would evaluate the signature subplan twice; measured, ReusedExchange
    # does not fire across the alias split) and no separate window for the
    # cap (which would add a second exchange + sort on ~the same key).
    # Each (band, bucket) group packs its (id, sub) members into an array —
    # bounded at KB scale by the cap mechanism itself, NOT the unbounded
    # collect_list anti-pattern — then the re-split decision is a pure
    # per-row expression: oversized groups explode into their 2^split_planes
    # sub-buckets via array filters, everything else passes through. One
    # slim shuffle total; the pair blowup is a pure Generate. Pairs dedupe
    # across bands BEFORE scoring, so the exact rescore runs once per
    # unique pair.
    slim = sigs.select(F.col(id_col), "band", "bucket", "sub")
    if bucket_cap is None:
        buckets = slim.groupBy("band", F.col("bucket").alias("bkt")).agg(
            F.collect_list(F.col(id_col)).alias("ids")
        )
    else:
        mult = 1 << split_planes
        base = 1 << band_planes
        g = slim.groupBy("band", "bucket").agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("i"), F.col("sub").alias("s"))
            ).alias("members")
        )
        def _sub_members(s: int):
            # NB: the lambda must stay UNARY — a second (defaulted) parameter
            # makes PySpark pick filter's (element, index) binary form and
            # silently pass the array index instead of the captured value
            return F.filter(F.col("members"), lambda m: m["s"] == s)

        split_arr = F.array(
            *[
                F.struct(
                    (F.lit(base) + F.col("bucket") * mult + F.lit(s))
                    .cast("bigint")
                    .alias("bkt"),
                    _sub_members(s).alias("ms"),
                )
                for s in range(mult)
            ]
        )
        unsplit = F.array(
            F.struct(
                F.col("bucket").cast("bigint").alias("bkt"),
                F.col("members").alias("ms"),
            )
        )
        buckets = g.select(
            "band",
            F.explode(
                F.when(F.size("members") > bucket_cap, split_arr).otherwise(
                    unsplit
                )
            ).alias("bb"),
        ).select(
            "band",
            F.col("bb.bkt").alias("bkt"),
            F.transform(F.col("bb.ms"), lambda m: m["i"]).alias("ids"),
        )
    cands = (
        buckets.select(F.explode("ids").alias("id_a"), "ids")
        .select(F.col("id_a"), F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(F.col("id_a").cast("bigint"), F.col("id_b").cast("bigint"))
        .distinct()
    )
    # Exact rescore of the candidates with a VECTORIZED Arrow kernel: one
    # numpy batch dot per Arrow chunk instead of an interpreted 64-element
    # fold per pair (~100× per-pair cost). This is the sanctioned
    # UDF-at-the-GEMM-boundary path (same class as blocked_cosine_pairs'
    # kernel); scores differ from the oracle's sequential fold only by
    # float-summation order (~1e-16), far below the 6-dp rounding used for
    # comparison and the min_score cut.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def batch_cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
        # Arrow delivers list<float> elements as numpy arrays — np.stack
        # avoids the Python-float boxing a tolist() round-trip would pay
        ma = np.stack(va.to_numpy()).astype(np.float64)
        mb = np.stack(vb.to_numpy()).astype(np.float64)
        d = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        # zero-norm guard: 0-vector pairs score 0.0 (fails any threshold
        # > 0) instead of NaN — see blocked_cosine_pairs
        s = np.einsum("ij,ij->i", ma, mb) / np.where(d == 0.0, 1.0, d)
        return pd.Series(np.round(s, 6))

    e_a = embeddings.select(
        F.col(id_col).cast("bigint").alias("id_a"), F.col(vec_col).alias("va")
    )
    e_b = embeddings.select(
        F.col(id_col).cast("bigint").alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        cands.join(e_a, "id_a")
        .join(e_b, "id_b")
        .select("id_a", "id_b", batch_cosine("va", "vb").alias("score"))
        .filter(F.col("score") >= min_score)
    )


def diverse_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity-constrained exact retrieval: per query, the top-``k``
    candidates under the constraint of AT MOST ONE candidate per
    ``group_col`` value — the context-diversification move of a RAG /
    few-shot pipeline (k near-identical chunks from one source crowd out
    everything else; capping per source/document/cluster is the standard
    fix, the degenerate-but-deterministic cousin of MMR re-ranking).

    Plan shape: queries broadcast (bounded panel), candidates scored
    map-only (JVM double cosine fold, 9-dp rank rounding — the
    brute_force_topk convention), then the per-(query, group) argmax is
    ONE aggregation via a (score, -id) struct MAX — no window over the
    full scored relation — and only the group winners (|queries| x
    |groups| rows) pay the final per-query ranking window. Ties break on
    candidate id ascending at both stages."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        F.col(group_col).alias("_grp"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "_grp",
            "cand_id",
            F.round(cosine("qvec", "cvec"), 9).alias("score9"),
        )
    )
    best = (
        scored.groupBy("query_id", "_grp")
        .agg(
            F.max(
                F.struct(
                    F.col("score9").alias("s"), (-F.col("cand_id")).alias("nid")
                )
            ).alias("b")
        )
        .select(
            "query_id",
            F.col("_grp").alias(group_col),
            (-F.col("b.nid")).cast("bigint").alias("cand_id"),
            F.col("b.s").alias("score9"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score9").desc(), F.col("cand_id")
    )
    return (
        best.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("cand_id"),
            group_col,
            F.round("score9", 6).alias("score"),
            "rank",
        )
    )


def cosine_pairs_within(
    tagged: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pin_partitions: int | None = None,
) -> DataFrame:
    """Exact cosine pairs ≥ ``threshold`` restricted to rows sharing
    ``block_col`` — the within-block half of SemDeDup-style semantic dedup
    (block = a k-means cluster id) or any precomputed blocking key.

    One hash shuffle of the n input rows on the block key lands each block
    in a single ``applyInPandas`` task, which multiplies the block matrix
    against itself in ``gemm_chunk``-row tiles and emits ONLY the
    upper-triangle pairs ≥ ``threshold`` — candidate cardinality is
    Σ|block|² of register-level flops, not of materialized rows.

    This shape replaced the r2-r6 pair-row formulation (self-join on blk →
    one scored row PER PAIR through a scalar pandas UDF) after the r7 sf~1
    probe: that plan materialized Σ|block|² rows each carrying BOTH
    vectors, and the post-scoring threshold filter made Catalyst evaluate
    the scoring UDF TWICE (filter pushdown duplicates a project-level
    Python UDF under the surviving Filter+Project pair) — ~13× more bytes
    through Arrow than the block matrices themselves, twice. Score
    semantics are unchanged: float64 dot / norms (matmul vs the old
    einsum differs only in last-ulp summation order, far below the 6-dp
    comparison rounding), zero-norm pairs score 0.0, pairs oriented
    id_a < id_b.

    ``pin_partitions``: fix the block-key partitioning at that width via a
    user-specified repartition, which AQE will NOT coalesce — the task's
    cost is |block|² COMPUTE per shuffled byte, violating AQE's
    bytes-proportional coalescing model. Callers pin when blocks are many
    and compute-heavy (dd8 pins iff its cluster count scaled past the
    certified-scale floor).

    The block key keeps its own type: integral keys are widened losslessly
    to bigint (the historical ``cluster bigint`` output schema), while any
    other type (string domains, decimals, …) groups on the RAW key and the
    output ``cluster`` column carries that type — a non-integral key must
    never be cast-to-NULL-and-dropped (that silently yielded zero pairs)."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
    )

    gemm_chunk = 1024
    key_type = tagged.schema[block_col].dataType
    integral = isinstance(
        key_type, (ByteType, ShortType, IntegerType, LongType)
    )
    cluster_ddl = "bigint" if integral else key_type.simpleString()
    out_schema = f"cluster {cluster_ddl}, id_a long, id_b long, score double"

    def block_pairs(key, pdf):
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"cluster": [], "id_a": [], "id_b": [], "score": []}
            )
        M = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        nrm = np.linalg.norm(M, axis=1)
        # zero-norm guard: 0-vector pairs score 0.0 (fails any threshold
        # > 0) instead of NaN — see blocked_cosine_pairs
        safe = np.where(nrm == 0.0, 1.0, nrm)
        blk_val = int(key[0]) if integral else key[0]
        out_a, out_b, out_s = [], [], []
        for lo in range(0, n, gemm_chunk):
            hi = min(lo + gemm_chunk, n)
            S = np.round(
                (M[lo:hi] @ M.T) / np.outer(safe[lo:hi], safe), 6
            )
            zero = np.outer(nrm[lo:hi] == 0.0, np.ones(n, bool)) | (
                nrm == 0.0
            )
            S = np.where(zero, 0.0, S)
            ii, jj = np.nonzero(S >= threshold)
            # id_a < id_b by VALUE, not position — duplicate ids within a
            # block must not emit self-pairs (id_a == id_b), matching the
            # replaced join formulation's strict value-ordering filter.
            upper = ids[jj] > ids[ii + lo]
            out_a.append(ids[ii[upper] + lo])
            out_b.append(ids[jj[upper]])
            out_s.append(S[ii[upper], jj[upper]])
        if not out_a:
            return pd.DataFrame(
                {"cluster": [], "id_a": [], "id_b": [], "score": []}
            )
        a = np.concatenate(out_a)
        return pd.DataFrame(
            {
                "cluster": (
                    np.full(len(a), blk_val, dtype=np.int64)
                    if integral
                    else [blk_val] * len(a)
                ),
                "id_a": a,
                "id_b": np.concatenate(out_b),
                "score": np.concatenate(out_s),
            }
        )

    # NULL block keys never matched in the replaced join formulation
    # (SQL equi-join semantics) — drop them explicitly for parity.
    blk_expr = (
        F.col(block_col).cast("bigint") if integral else F.col(block_col)
    )
    base = tagged.select(
        blk_expr.alias("blk"),
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("v"),
    ).filter(F.col("blk").isNotNull())
    if pin_partitions is not None:
        base = base.repartition(pin_partitions, "blk")
    return base.groupBy("blk").applyInPandas(block_pairs, out_schema)


def ivf_centroids(
    embeddings: DataFrame,
    n_clusters: int = 8,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse-quantizer centroids: (cluster, centroid array<double>).

    Seed assignment is deterministic (``vec_id % n_clusters``); ``iters``
    Lloyd iterations refine it (assign to nearest centroid → recompute
    means). ``iters=0`` keeps every step ANSI-SQL-expressible (the oracle
    path); training iterations are the standard iterative-DataFrame loop —
    each iteration is one broadcast-join assignment pass plus one
    mean-aggregation, nothing driver-side.

    Centroid means are computed with per-row DECIMAL casts so the sum is
    exact and order-independent — the centroid doubles come out bit-identical
    in any engine, which is what makes the downstream cosine assignments
    reproducible (repo determinism rule #1, queries.py module doc).
    """
    assign = embeddings.select(
        (F.col(id_col) % n_clusters).cast("int").alias("cluster"),
        F.col(vec_col).alias("v"),
    )
    cent = _centroids_from(assign)
    for _ in range(iters):
        scored = _assign_clusters(embeddings, cent, 1, id_col, vec_col)
        assign = scored.select("cluster", F.col("v"))
        cent = _centroids_from(assign)
    return cent


def _centroids_from(assign: DataFrame) -> DataFrame:
    """(cluster, v:array) → (cluster, centroid:array<double>), exact means."""
    comp = (
        assign.select("cluster", F.posexplode("v").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(27,10)")).cast("double") / F.count("*")
            ).alias("comp")
        )
    )
    return comp.groupBy("cluster").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "comp"))), lambda s: s["comp"]
        ).alias("centroid")
    )


def _assign_clusters(
    embeddings: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Nearest-``nprobe`` clusters per vector by cosine (broadcast the tiny
    centroid table; score every (vector, centroid) pair with the same JVM
    double fold the exact search uses; 9-dp rounding + cluster-id tiebreak
    keeps the argmax stable across engines)."""
    scored = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    ).crossJoin(F.broadcast(centroids))
    w = Window.partitionBy("vid").orderBy(
        F.round(cosine("v", "centroid"), 9).desc(), F.col("cluster")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("vid", "v", "cluster")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    n_clusters: int = 8,
    nprobe: int = 2,
    k: int = 10,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k: assign every candidate to its nearest
    centroid (an inverted list keyed by cluster), probe each query's
    ``nprobe`` nearest clusters, exact-rescore only those lists.

    The 100-TB shape: candidate vectors shuffle ONCE on cluster id (that
    exchange IS the inverted index — at rest you'd ``write_bucketed`` it),
    queries × centroids is a broadcast cross of a k-row table, and the probe
    join moves each query to nprobe/k of the data instead of all of it —
    brute_force_topk's cost × (nprobe / n_clusters), same per-pair kernel.
    """
    cent = ivf_centroids(embeddings, n_clusters, iters, id_col, vec_col)
    cand = _assign_clusters(embeddings, cent, 1, id_col, vec_col).select(
        F.col("cluster"), F.col("vid").alias("cand_id"), F.col("v").alias("cv")
    )
    probe = _assign_clusters(queries, cent, nprobe, id_col, vec_col).select(
        F.col("cluster"), F.col("vid").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        cand.join(probe, "cluster")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id", "cand_id", F.round(cosine("qv", "cv"), 9).alias("score9")
        )
        # a candidate can appear via several probed clusters → dedupe
        .groupBy("query_id", "cand_id")
        .agg(F.max("score9").alias("score9"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score9").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("cand_id").cast("bigint"),
            F.round("score9", 6).alias("score"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the ANN memory-compression tier
# ---------------------------------------------------------------------------
#
# IVF-Flat (above) reduces the COMPUTE per query but still stores and
# rescans full float vectors; at 100 TB the embedding matrix itself is the
# bottleneck (64-dim float64 = 512 B/vector). PQ (Jégou, Douze, Schmid,
# "Product Quantization for Nearest Neighbor Search", IEEE TPAMI 2011)
# compresses each vector to m small codes: split the d dims into m
# subspaces, train a tiny codebook per subspace, store each vector as its
# m nearest-codeword ids (m bytes at n_codes<=256 — 64x smaller), and
# answer queries with ADC (asymmetric distance computation): per query,
# precompute a (m x n_codes) lookup table of exact subspace distances to
# every codeword, then score a candidate with m table lookups instead of d
# float multiplies — the candidate's floats are never touched again.
#
# Everything here is QUANTIZED INTEGER on km1's conventions (queries.py):
# components fixed-pointed at floor((x + 1.0) * 2^20) (offset keeps them
# non-negative, translation leaves distances unchanged), codeword means by
# truncating integer division (Spark DIV == DuckDB //), squared distances
# as exact BIGINT sums (max magnitude (2^21)^2 * d = 2^48 — no overflow,
# no float-summation order) — so codes, ADC distances, and ranks are
# bit-identical in any engine and the oracle hash-checks exactly.


def pq_codebooks(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace PQ codebooks: (sub, c, cent array<bigint>).

    Seeding is deterministic (``vec_id % n_codes`` — ivf_centroids'
    convention) and each codeword component is the truncating-integer-
    division mean of its members' quantized components, so the codebook is
    engine-identical. ``iters`` per-subspace Lloyd rounds refine it:
    re-encode every vector against the current codebook (the same map-only
    broadcast pass queries use — no join blow-up) and re-mean per
    (sub, code, j). ``iters=0`` keeps every step ANSI-SQL-expressible (the
    oracle path — ivf_centroids' contract); production indexes train with
    iters>0, typically on a sample. A codeword that loses all members
    simply vanishes — everything downstream matches codes BY ID, never by
    array position.

    One narrow shuffle of (sub, c, j, value) rows per round trains ALL m
    codebooks at once; everything downstream treats the result as a
    broadcast-sized dimension (m * n_codes * dim/m values total — the same
    k x d reach as a centroid relation, paid once at index build)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    w = dim // m
    xq = _pq_quantize(vec_col)
    valid = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)

    def mean_codebook(tagged: DataFrame) -> DataFrame:
        """(c, pos, xv) rows -> (sub, c, cent) truncating-division means."""
        comp = (
            tagged.select(
                "c",
                (F.col("pos") / w).cast("int").alias("sub"),
                (F.col("pos") % w).alias("j"),
                "xv",
            )
            .groupBy("sub", "c", "j")
            .agg(F.expr("sum(xv) DIV count(*)").alias("cent_j"))
        )
        return comp.groupBy("sub", "c").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("j", "cent_j"))),
                lambda s: s["cent_j"],
            ).alias("cent")
        )

    cb = mean_codebook(
        embeddings.where(valid).select(
            (F.col(id_col) % n_codes).cast("int").alias("c"),
            F.posexplode(xq).alias("pos", "xv"),
        )
    )
    for _ in range(iters):
        cbs = _pq_prepared(cb, m)
        encoded = (
            embeddings.where(valid)
            .crossJoin(F.broadcast(cbs))
            .select(
                F.expr(_sql_codes(_sql_quantize(vec_col), m, w)).alias(
                    "codes"
                ),
                F.posexplode(xq).alias("pos", "xv"),
            )
        )
        cb = mean_codebook(
            encoded.select(
                F.col("codes")[(F.col("pos") / w).cast("int")].alias("c"),
                "pos",
                "xv",
            )
        )
    return cb


# -- SQL-text expression builders -------------------------------------------
#
# The PQ/IVF-PQ expression trees are deep higher-order-function nests; built
# through the pyspark Column API each lambda costs a py4j round trip and the
# full ivfpq_topk tree took ~1.0 s of DRIVER time per construction (measured
# r14 — ~40% of sim7's wall at sf0.1). Building each nest as ONE SQL string
# parsed by F.expr collapses that to a single gateway call (guide §4; the
# r13 simhash/_bucket_expr precedent). The strings are the exact textual
# form of the previous Column trees — parser and Column API produce the
# same resolved expressions, so results and physical plans are identical
# (plan-diffed modulo expression ids when this landed). Lambda variable
# names are globally distinct within any one composed nest, so no nested
# lambda ever shadows an enclosing one.


def _sql_quantize(vec_col: str) -> str:
    """km1's fixed-point quantization (queries.py): floor((x+1.0)*2^20),
    the exact IEEE-double expression the SQL oracle evaluates."""
    return (
        f"transform(`{vec_col}`, qv -> CAST(FLOOR((CAST(qv AS DOUBLE) + 1.0D)"
        " * 1048576.0D) AS BIGINT))"
    )


def _sql_l2(a: str, b: str) -> str:
    """Exact BIGINT squared L2 distance between two bigint arrays."""
    return (
        f"aggregate(zip_with({a}, {b}, (zx, zy) -> (zx - zy) * (zx - zy)), "
        "CAST(0 AS BIGINT), (zacc, zv) -> zacc + zv)"
    )


def _sql_sub_dists(arr: str, s: str, w: int) -> str:
    """array of struct(dist, c) for subspace ``s`` (a lambda-variable name
    bound by the caller's transform-over-sequence): exact BIGINT squared
    distance from ``arr``'s subvector to every codeword of the prepared
    single-row ``cbs`` codebook column (in scope)."""
    sv = f"slice({arr}, {s} * {w} + 1, {w})"
    return (
        f"transform(element_at(cbs, {s} + 1), se -> named_struct("
        f"'dist', {_sql_l2(sv, 'se.cent')}, 'c', se.c))"
    )


def _sql_codes(arr: str, m: int, w: int) -> str:
    """m per-subspace argmin codeword ids for ``arr`` against ``cbs``."""
    return (
        f"transform(sequence(0, {m - 1}), sq -> "
        f"array_min({_sql_sub_dists(arr, 'sq', w)}).c)"
    )


def _sql_luts(arr: str, m: int, w: int) -> str:
    """m per-subspace ADC lookup tables (struct(c, ld)) for ``arr``."""
    return (
        f"transform(sequence(0, {m - 1}), sq -> transform("
        f"{_sql_sub_dists(arr, 'sq', w)}, "
        "le -> named_struct('c', le.c, 'ld', le.dist)))"
    )


_SQL_ADC = (
    "aggregate(zip_with(codes, luts, (zc, zl) -> "
    "element_at(filter(zl, fl -> fl.c = zc), 1).ld), "
    "CAST(0 AS BIGINT), (aacc, av) -> aacc + av)"
)


def _sql_coarse_dists(xq: str) -> str:
    """array of struct(dist, c) to every coarse centroid (expects the
    single-row ``coarse`` array column in scope)."""
    return (
        "transform(coarse, ce -> named_struct("
        f"'dist', {_sql_l2(xq, 'ce.cent')}, 'c', ce.c))"
    )


def _sql_cent_of(cluster: str) -> str:
    """centroid array of the coarse entry whose c == ``cluster``."""
    return f"element_at(filter(coarse, fe -> fe.c = {cluster}), 1).cent"


def _pq_quantize(vec_col: str):
    """Column form of ``_sql_quantize`` (one parse, no lambda chatter)."""
    return F.expr(_sql_quantize(vec_col))


def _pq_prepared(codebooks: DataFrame, m: int):
    """Collapse the codebook relation to ONE row ``cbs``:
    array (by sub) of array of struct(c, cent) sorted by codeword id —
    the broadcastable closed form both encode and LUT build consume."""
    per_sub = codebooks.groupBy("sub").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("c").cast("int").alias("c"), "cent"))
        ).alias("words")
    )
    return per_sub.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "words"))),
            lambda s: s["words"],
        ).alias("cbs")
    )


# (the per-subspace expressions stay a transform-over-sequence — one shared
# subtree instead of m unrolled copies, measured 5× faster analysis on sim6
# when that landed — now emitted as SQL text by _sql_codes/_sql_luts above)


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    k: int = 10,
    iters: int = 0,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC approximate top-k: (query_id, cand_id, adc_dist, rank).

    Scale shape: the codebook is ONE broadcast row; candidate encoding is
    a map-only pass (per row: m argmins over n_codes codewords, all
    whole-stage-codegen struct arithmetic — no explode, no shuffle, and at
    rest you'd persist just (id, codes), m bytes per vector); the query
    panel builds its (m x n_codes) integer LUTs in the same map-only way
    and broadcasts; scoring is brute_force_topk's broadcast cross shape
    but each pair costs m integer table lookups instead of d float
    multiplies, and the only shuffle anywhere is the final per-query
    top-k window. Codes are matched to LUT entries BY CODEWORD ID (a
    filter over the n_codes-sized struct array), so nothing assumes the
    seeding produced dense codeword ids.

    ``rerank=R`` adds the FAISS refine stage (raw PQ recall is a
    SHORTLIST quality, not an answer quality): take the top-R per query
    by ADC, fetch full vectors for only those R·|queries| candidates (the
    shortlist broadcasts into the embedding scan — map-only, no fact
    shuffle), exact integer-L2 rescore, re-rank to top-k. Output
    ``adc_dist`` then carries the EXACT quantized squared distance, and
    recall approaches exact search as R grows while ADC still prunes
    |corpus|-R of the float reads per query."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    w = dim // m
    cbs = _pq_prepared(
        pq_codebooks(embeddings, dim, m, n_codes, iters, id_col, vec_col), m
    )
    xq = _pq_quantize(vec_col)
    valid = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)

    xq_sql = _sql_quantize(vec_col)
    cand = (
        embeddings.where(valid)
        .crossJoin(F.broadcast(cbs))
        .select(
            F.col(id_col).cast("long").alias("cand_id"),
            F.expr(_sql_codes(xq_sql, m, w)).alias("codes"),
        )
    )
    lut = (
        queries.where(valid)
        .crossJoin(F.broadcast(cbs))
        .select(
            F.col(id_col).cast("long").alias("query_id"),
            F.expr(_sql_luts(xq_sql, m, w)).alias("luts"),
        )
    )
    scored = (
        cand.crossJoin(F.broadcast(lut))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(_SQL_ADC).alias("adc_dist"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("cand_id"))
    if rerank:
        shortlist = (
            scored.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= rerank)
            .select("query_id", "cand_id")
        )
        cvec = embeddings.where(valid).select(
            F.col(id_col).cast("long").alias("cand_id"), xq.alias("cxq")
        )
        qvec = queries.where(valid).select(
            F.col(id_col).cast("long").alias("query_id"), xq.alias("qxq")
        )
        exact = (
            cvec.join(F.broadcast(shortlist), "cand_id")
            .join(F.broadcast(qvec), "query_id")
            .select(
                "query_id",
                "cand_id",
                F.expr(_sql_l2("cxq", "qxq")).alias("adc_dist"),
            )
        )
        scored = exact
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("cand_id").cast("bigint"),
            F.col("adc_dist").cast("bigint"),
            "rank",
        )
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    n_clusters: int = 8,
    nprobe: int = 2,
    m: int = 8,
    n_codes: int = 16,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k — the composition production ANN actually
    ships (FAISS IndexIVFPQ): an IVF coarse quantizer routes each vector
    to one of ``n_clusters`` inverted lists, PQ encodes the RESIDUAL
    (vector − its coarse centroid) as m codes, and a query probes its
    ``nprobe`` nearest lists scoring candidates by residual-space ADC.
    IVF bounds the candidates touched (nprobe/n_clusters of the data),
    PQ bounds the bytes per candidate (m codes, no floats) — the two
    cuts compose multiplicatively, which is why this is the default
    billion-scale index layout.

    Unlike sim4's cosine IVF, the coarse quantizer here is integer-L2 on
    the SAME km1 quantization the PQ stage uses, so residuals are exact
    integer subtractions and every distance in the pipeline — coarse
    assignment, codeword training, ADC — is an exact BIGINT: the whole
    index is engine-identical and the oracle hash-checks with no
    tolerance boolean.

    Plan shape: coarse centroids and PQ codebooks are tiny broadcast
    relations (trained in two narrow exploded-row shuffles); candidate
    assignment + residual encoding is ONE map-only pass (at rest you'd
    persist (cluster, id, codes) — the inverted index, m bytes/vector);
    the probe join shuffles candidates once on cluster id (sim4's
    inverted-list exchange) against nprobe rows per query; top-k is the
    only other shuffle. A candidate belongs to exactly one list, so
    multi-probe never scores it twice — no dedup aggregation needed."""
    frames = _ivfpq_build_frames(
        embeddings, dim, n_clusters, m, n_codes, id_col, vec_col
    )
    return _ivfpq_query_side(
        queries, *frames, dim=dim, m=m, nprobe=nprobe, k=k,
        id_col=id_col, vec_col=vec_col,
    )


def _coarse1_local(spark, coarse: DataFrame) -> DataFrame:
    """Collect a PERSISTED (tiny: n_clusters rows) coarse quantizer and
    rebuild the one-row broadcastable ``coarse`` array as a LocalRelation:
    consumer queries then embed the literal values instead of each paying
    a scan + collect_list-agg + broadcast-build subtree over the parquet
    frame (one footer-read job here replaces one per consumer — the r13
    LSH plane-literal pattern applied to the index-at-rest frames). The
    Python sort reproduces array_sort over struct(c, cent) exactly: c is
    unique per entry, so the struct order is the c order."""
    from pyspark.sql import types as T

    rows = sorted(
        (int(r["c"]), [int(x) for x in r["cent"]])
        for r in coarse.select("c", "cent").collect()
    )
    schema = T.StructType([
        T.StructField(
            "coarse",
            T.ArrayType(T.StructType([
                T.StructField("c", T.IntegerType()),
                T.StructField("cent", T.ArrayType(T.LongType())),
            ])),
        )
    ])
    return spark.createDataFrame([(rows,)], schema)


def _cbs_local(spark, cb: DataFrame) -> DataFrame:
    """_pq_prepared's one-row ``cbs`` column from a PERSISTED codebook
    relation, as a LocalRelation (see _coarse1_local). Reproduces the
    agg exactly: words sorted by codeword id within each sub (c unique),
    subs ascending."""
    from pyspark.sql import types as T

    by_sub: dict[int, list] = {}
    for r in cb.select("sub", "c", "cent").collect():
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["c"]), [int(x) for x in r["cent"]])
        )
    cbs = [sorted(v) for _, v in sorted(by_sub.items())]
    schema = T.StructType([
        T.StructField(
            "cbs",
            T.ArrayType(T.ArrayType(T.StructType([
                T.StructField("c", T.IntegerType()),
                T.StructField("cent", T.ArrayType(T.LongType())),
            ]))),
        )
    ])
    return spark.createDataFrame([(cbs,)], schema)


def _ivfpq_assign_residual(
    embeddings: DataFrame,
    coarse: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    coarse1: DataFrame | None = None,
) -> DataFrame:
    """(cand_id, cluster, res) — coarse-assign every valid vector against
    a GIVEN coarse quantizer and compute its integer residual. One
    map-only pass; ``coarse`` is tiny and broadcasts. ``coarse1``
    overrides the derived one-row frame with a precomputed LocalRelation
    (_coarse1_local) when the quantizer is at rest."""
    xq_sql = _sql_quantize(vec_col)
    valid = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    if coarse1 is None:
        coarse1 = coarse.agg(
            F.array_sort(F.collect_list(F.struct("c", "cent"))).alias("coarse")
        )
    # single fused projection (the exact form CollapseProject reduces the
    # old two-select chain to — one analysis pass instead of two over the
    # full HOF tree, measured on the r14 driver-cost breakdown)
    cluster_sql = f"array_min({_sql_coarse_dists(xq_sql)}).c"
    return (
        embeddings.where(valid)
        .crossJoin(F.broadcast(coarse1))
        .select(
            F.col(id_col).cast("long").alias("cand_id"),
            F.expr(cluster_sql).alias("cluster"),
            F.expr(
                f"zip_with({xq_sql}, {_sql_cent_of(cluster_sql)}, "
                "(wx, wy) -> wx - wy)"
            ).alias("res"),
        )
    )


def _ivfpq_train_coarse(
    train: DataFrame, dim: int, n_clusters: int, id_col: str, vec_col: str
) -> DataFrame:
    """Coarse quantizer: integer-L2 centroids over vid % n_clusters."""
    xq = _pq_quantize(vec_col)
    valid = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    return (
        train.where(valid)
        .select(
            (F.col(id_col) % n_clusters).cast("int").alias("c"),
            F.posexplode(xq).alias("pos", "xv"),
        )
        .groupBy("c", "pos")
        .agg(F.expr("sum(xv) DIV count(*)").alias("cent_p"))
        .groupBy("c")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "cent_p"))),
                lambda s: s["cent_p"],
            ).alias("cent")
        )
    )


def _ivfpq_cb_from_residuals(
    cand_res: DataFrame, dim: int, m: int, n_codes: int
) -> DataFrame:
    """Residual PQ codebooks from an assign-residual relation (vid %
    n_codes seed, trunc-div means)."""
    w = dim // m
    res_tagged = cand_res.select(
        (F.col("cand_id") % n_codes).cast("int").alias("c"),
        F.posexplode("res").alias("pos", "xv"),
    )
    return (
        res_tagged.select(
            "c",
            (F.col("pos") / w).cast("int").alias("sub"),
            (F.col("pos") % w).alias("j"),
            "xv",
        )
        .groupBy("sub", "c", "j")
        .agg(F.expr("sum(xv) DIV count(*)").alias("cent_j"))
        .groupBy("sub", "c")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("j", "cent_j"))),
                lambda s: s["cent_j"],
            ).alias("cent")
        )
    )


def _ivfpq_train_cb(
    train: DataFrame,
    coarse: DataFrame,
    dim: int,
    m: int,
    n_codes: int,
    id_col: str,
    vec_col: str,
    coarse1: DataFrame | None = None,
) -> DataFrame:
    """Residual PQ codebooks against a GIVEN coarse quantizer (vid %
    n_codes seed, trunc-div means)."""
    return _ivfpq_cb_from_residuals(
        _ivfpq_assign_residual(
            train, coarse, id_col, vec_col, dim, coarse1=coarse1
        ),
        dim, m, n_codes,
    )


def _ivfpq_train_frames(
    train: DataFrame,
    dim: int,
    n_clusters: int,
    m: int,
    n_codes: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, DataFrame]:
    """The TRAINING side of IVF-PQ: coarse quantizer + residual PQ
    codebooks learned from ``train`` only. Encoding is a pure function
    of these two frames, which is what makes incremental adds against a
    FROZEN index well-defined (FAISS train/add split)."""
    coarse = _ivfpq_train_coarse(train, dim, n_clusters, id_col, vec_col)
    cb = _ivfpq_train_cb(train, coarse, dim, m, n_codes, id_col, vec_col)
    return coarse, cb


def _ivfpq_codes_from_residuals(
    cand_res: DataFrame, cb: DataFrame, dim: int, m: int,
    cbs: DataFrame | None = None,
) -> DataFrame:
    """(cluster, cand_id, codes, res_dist) from an assign-residual
    relation and FROZEN codebooks: per-subspace argmin codes, one
    map-only pass over the broadcast codebook row. ``res_dist`` is the
    exact integer L2² of the vector's residual to its assigned coarse
    centroid — the per-vector quantizer-fit number whose corpus mean is
    the drift baseline ivfpq_add compares against. Unused consumers (the
    in-flight ivfpq_topk path) never pay for it: Catalyst prunes the
    unreferenced projection."""
    w = dim // m
    if cbs is None:
        cbs = _pq_prepared(cb, m)
    return cand_res.crossJoin(F.broadcast(cbs)).select(
        "cluster",
        "cand_id",
        F.expr(_sql_codes("res", m, w)).alias("codes"),
        F.expr(
            "aggregate(transform(res, rv -> rv * rv), CAST(0 AS BIGINT), "
            "(racc, rx) -> racc + rx)"
        ).alias("res_dist"),
    )


def _ivfpq_encode(
    embeddings: DataFrame,
    coarse: DataFrame,
    cb: DataFrame,
    dim: int,
    m: int,
    id_col: str,
    vec_col: str,
    coarse1: DataFrame | None = None,
    cbs: DataFrame | None = None,
) -> DataFrame:
    """(cluster, cand_id, codes, res_dist) — encode vectors against
    FROZEN coarse/codebook frames: assign + residual + per-subspace
    argmin codes, one map-only pass over broadcast frames. ``coarse1``/
    ``cbs`` take precomputed LocalRelation forms of the frames
    (_coarse1_local/_cbs_local) when they are at rest."""
    return _ivfpq_codes_from_residuals(
        _ivfpq_assign_residual(
            embeddings, coarse, id_col, vec_col, dim, coarse1=coarse1
        ),
        cb, dim, m, cbs=cbs,
    )


def _ivfpq_build_frames(
    embeddings: DataFrame,
    dim: int,
    n_clusters: int,
    m: int,
    n_codes: int,
    id_col: str,
    vec_col: str,
    train: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The index-build side of IVF-PQ, as three persistable relations:

      coarse (c, cent array<bigint>)          — the coarse quantizer
      cb     (sub, c, cent array<bigint>)     — residual PQ codebooks
      cand   (cluster, cand_id, codes, res_dist) — the inverted index

    ivfpq_topk consumes them in-flight; build_ivfpq_index writes them at
    rest (codes partitioned BY CLUSTER so a probe reads only its lists).
    ``train`` defaults to ``embeddings``; passing a subset trains the
    quantizers on it while still encoding every embedding — the
    reference relation for the build-then-add lifecycle (ivfpq_add)."""
    if train is not None and train is not embeddings:
        coarse, cb = _ivfpq_train_frames(
            train, dim, n_clusters, m, n_codes, id_col, vec_col
        )
        cand = _ivfpq_encode(embeddings, coarse, cb, dim, m, id_col, vec_col)
        return coarse, cb, cand
    # train == encode corpus (the in-flight ivfpq_topk path): build ONE
    # assign-residual expression and derive both the codebook training and
    # the candidate codes from it — the r12 shared-subtree shape, which the
    # r13 helper split had quietly doubled (one extra driver-side
    # construction of the residual tree per query; sentinel-paired A/B
    # measured the split ~8% slower on sim7 at sf0.1, plans identical).
    coarse = _ivfpq_train_coarse(embeddings, dim, n_clusters, id_col, vec_col)
    cand_res = _ivfpq_assign_residual(embeddings, coarse, id_col, vec_col, dim)
    cb = _ivfpq_cb_from_residuals(cand_res, dim, m, n_codes)
    cand = _ivfpq_codes_from_residuals(cand_res, cb, dim, m)
    return coarse, cb, cand


def _ivfpq_query_side(
    queries: DataFrame,
    coarse: DataFrame,
    cb: DataFrame,
    cand: DataFrame,
    dim: int,
    m: int,
    nprobe: int,
    k: int,
    id_col: str,
    vec_col: str,
    coarse1: DataFrame | None = None,
    cbs: DataFrame | None = None,
) -> DataFrame:
    """Probe nprobe lists per query and ADC-score their candidates —
    identical whether the index frames are in-flight (ivfpq_topk) or read
    back from rest (ivfpq_search; that path passes the frames' LocalRelation
    forms via ``coarse1``/``cbs``)."""
    w = dim // m
    xq_sql = _sql_quantize(vec_col)
    valid = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    if coarse1 is None:
        coarse1 = coarse.agg(
            F.array_sort(F.collect_list(F.struct("c", "cent"))).alias("coarse")
        )
    if cbs is None:
        cbs = _pq_prepared(cb, m)

    qprobe = (
        queries.where(valid)
        .crossJoin(F.broadcast(coarse1))
        .select(
            F.col(id_col).cast("long").alias("query_id"),
            F.expr(xq_sql).alias("xqv"),
            F.col("coarse"),
            F.explode(
                F.expr(
                    f"slice(array_sort({_sql_coarse_dists(xq_sql)}), "
                    f"1, {nprobe})"
                )
            ).alias("probe"),
        )
        .select(
            "query_id",
            F.col("probe")["c"].alias("cluster"),
            F.expr(
                f"zip_with(xqv, {_sql_cent_of('probe.c')}, "
                "(wx, wy) -> wx - wy)"
            ).alias("qres"),
        )
    )
    lut = qprobe.crossJoin(F.broadcast(cbs)).select(
        "query_id",
        "cluster",
        F.expr(_sql_luts("qres", m, w)).alias("luts"),
    )

    scored = (
        cand.join(lut, "cluster")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(_SQL_ADC).alias("adc_dist"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("cand_id").cast("bigint"),
            F.col("adc_dist").cast("bigint"),
            "rank",
        )
    )


def build_ivfpq_index(
    embeddings: DataFrame,
    index_root: str,
    dim: int,
    n_clusters: int = 8,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF-PQ index at rest — the separation production ANN
    actually deploys (FAISS writes the index once, serves queries from
    it; the docstring promise "at rest you'd persist (cluster, id,
    codes)" made real):

      <index_root>/meta.json   dim / n_clusters / m / n_codes / columns
                               + the drift baseline (build_res_dist_sum,
                               build_n) and cumulative add stats
      <index_root>/coarse      (c, cent)            — coarse quantizer
      <index_root>/codebooks   (sub, c, cent)       — residual codebooks
      <index_root>/codes       (cand_id, codes, res_dist)
                               partitioned by CLUSTER

    ``codes`` is partitioned by cluster id, so a search's nprobe lists
    prune to their directories at the parquet scan — the on-disk form of
    the inverted-list cut (candidates never read = bytes never touched,
    m bytes per vector for the ones that are). Everything is exact
    BIGINT on km1's quantization: rebuilding the index bit-reproduces
    it, and search-from-rest returns byte-identical rows to the
    in-flight ivfpq_topk (pinned by test)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    import json
    import os

    # Train -> write -> READ BACK each frame before the next stage
    # consumes it: lazily chaining the three writes would re-run the
    # corpus-wide training aggregates inside every downstream plan (the
    # coarse explode-agg 3x, the codebook assign+agg 2x — measured ~2x
    # build wall at sf0.1). The read-back frames are tiny parquet
    # broadcasts, so each training pass runs exactly once and the
    # encode pass is the only other corpus scan. (The in-flight
    # ivfpq_topk keeps the lazy shape — it has no disk to pin to.)
    spark = embeddings.sparkSession
    os.makedirs(index_root, exist_ok=True)
    _ivfpq_train_coarse(
        embeddings, dim, n_clusters, id_col, vec_col
    ).write.mode("overwrite").parquet(f"{index_root}/coarse")
    # read back + collapse to LocalRelations (r14): the frames are
    # n_clusters / m*n_codes rows — ONE footer-read job each replaces a
    # scan+agg+broadcast-build subtree inside every downstream consumer
    # (codebook training, encode, and at serving time every add/search)
    coarse = spark.read.parquet(f"{index_root}/coarse")
    coarse1 = _coarse1_local(spark, coarse)
    _ivfpq_train_cb(
        embeddings, coarse, dim, m, n_codes, id_col, vec_col,
        coarse1=coarse1,
    ).write.mode("overwrite").parquet(f"{index_root}/codebooks")
    cb = spark.read.parquet(f"{index_root}/codebooks")
    cand = _ivfpq_encode(
        embeddings, coarse, cb, dim, m, id_col, vec_col,
        coarse1=coarse1, cbs=_cbs_local(spark, cb),
    )
    # Drift baseline rides the write pass as observe() metrics (r13) —
    # previously a separate read-back aggregation job over the just-
    # written codes. Clustering the rows onto their partition value
    # before the partitioned write turns the up-to-(tasks x clusters)
    # small-file spray into one file per cluster dir per write — the
    # encode still runs at full scan parallelism below the exchange, and
    # the shuffle carries only (id, codes, res_dist, cluster). Cluster
    # counts scale with the corpus (corpus-scaled bucket posture), so
    # per-cluster write tasks stay bounded at any size.
    obs = Observation()
    (
        cand.observe(
            obs,
            F.sum("res_dist").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .repartition(F.col("cluster"))
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{index_root}/codes")
    )
    _build_stats = obs.get
    # a rebuild is a fresh index: manifest history restarts at seq 1
    # naming exactly the just-written files
    import shutil

    shutil.rmtree(f"{index_root}/{_CODE_MANIFESTS}", ignore_errors=True)
    _codes_commit(index_root, _codes_data_files(index_root))
    # Drift baseline for ivfpq_add (FAISS-retrain signal): mean residual
    # distance of the BUILD corpus under its own quantizer, as exact
    # integer (sum, n) so later ratios are reproducible. Collected as
    # observe() metrics during the codes write itself — no read-back scan.
    row = _build_stats
    with open(f"{index_root}/meta.json", "w") as fh:
        json.dump(
            {
                "dim": dim,
                "n_clusters": n_clusters,
                "m": m,
                "n_codes": n_codes,
                "id_col": id_col,
                "vec_col": vec_col,
                "build_res_dist_sum": int(row["s"] or 0),
                "build_n": int(row["n"]),
                "added_res_dist_sum": 0,
                "added_n": 0,
            },
            fh,
        )
    # a rebuild is a fresh index: clear sticky-retirement state a
    # previous generation left behind (build_minhash_index convention)
    shutil.rmtree(f"{index_root}/_retired", ignore_errors=True)


_CODE_MANIFESTS = "_code_manifests"


def _codes_data_files(index_root: str) -> list[str]:
    """Relative paths (under codes/) of every parquet data file on disk —
    INCLUDING orphans from crashed adds; only the manifest says which
    are live."""
    import os

    base = f"{index_root}/codes"
    out = []
    for r, _, fs in os.walk(base):
        for f in fs:
            if f.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(r, f), base))
    return sorted(out)


def _codes_manifest(index_root: str, version: int | None = None) -> dict | None:
    """A codes manifest doc: the CURRENT one by default, or an explicit
    committed ``version`` (time travel — valid for history between
    compactions, which restart the manifest sequence over the rewritten
    directory: the VersionedTable vacuum-grace contract). Returns None
    for a pre-manifest index (legacy fallback: every file in the dir is
    live); raises FileNotFoundError for a version that was never
    committed or was reclaimed by a compact."""
    import json

    if version is not None:
        with open(
            f"{index_root}/{_CODE_MANIFESTS}/m-{version:08d}.json"
        ) as fh:
            return json.load(fh)
    try:
        with open(f"{index_root}/{_CODE_MANIFESTS}/_current") as fh:
            name = fh.read().strip()
        with open(f"{index_root}/{_CODE_MANIFESTS}/{name}") as fh:
            return json.load(fh)
    except OSError:
        return None


def ivfpq_index_history(index_root: str) -> list[int]:
    """Committed codes-manifest versions, oldest first — seq 1 is the
    build (or the latest compact, which restarts history), each add is
    one more. Crash debris (a manifest newer than the published pointer)
    is excluded, mirroring VersionedTable.history."""
    import os
    import re

    mdir = f"{index_root}/{_CODE_MANIFESTS}"
    cur = _codes_manifest(index_root)
    if cur is None:
        return []
    return sorted(
        int(m.group(1))
        for f in os.listdir(mdir)
        if (m := re.match(r"m-(\d{8})\.json$", f))
        and int(m.group(1)) <= cur["seq"]
    )


def _codes_commit(
    index_root: str, files: list[str], tokens: dict | None = None
) -> int:
    """Atomically publish a new live-file set for the codes relation —
    the Iceberg/Delta AddFile idea at minimum viable size: the manifest
    names exactly the parquet files a reader may see, and ONE
    temp-then-rename pointer swap is the commit point. Files appended by
    a crashed add that never reached its commit are orphans: on disk,
    referenced by nothing, invisible to every reader, reclaimed when
    compaction rewrites the directory. ``tokens`` carries idempotency
    high-water marks (checkpoint-key -> batch_id) INSIDE the committed
    doc, so a streaming add's replay-skip decision and its visibility
    commit are the same atomic event — exactly-once, not at-least-once."""
    import json
    import os

    mdir = f"{index_root}/{_CODE_MANIFESTS}"
    os.makedirs(mdir, exist_ok=True)
    cur = _codes_manifest(index_root)
    seq = (cur["seq"] + 1) if cur else 1
    name = f"m-{seq:08d}.json"
    with open(f"{mdir}/{name}", "w") as fh:
        json.dump(
            {"seq": seq, "files": sorted(files), "tokens": tokens or {}}, fh
        )
    tmp = f"{mdir}/_current.tmp"
    with open(tmp, "w") as fh:
        fh.write(name)
    os.replace(tmp, f"{mdir}/_current")
    return seq


def _codes_read(
    spark,
    index_root: str,
    clusters: list | None = None,
    version: int | None = None,
) -> DataFrame:
    """Snapshot read of the LIVE codes relation, pruned manifest-side to
    ``clusters`` when given (unprobed inverted lists cost zero IO — not
    even a footer read; orphaned files from crashed adds are never
    handed to the scan). ``version`` pins a historic manifest (time
    travel — immutable data files make it free until a compact rewrites
    the directory). Falls back to the raw directory for pre-manifest
    indexes."""
    base = f"{index_root}/codes"
    man = _codes_manifest(index_root, version)
    if man is None:
        df = spark.read.parquet(base)
        if clusters is not None:
            df = df.filter(F.col("cluster").isin(list(clusters)))
        return df
    files = man["files"]
    if clusters is not None:
        want = {f"cluster={c}/" for c in clusters}
        files = [f for f in files if any(f.startswith(w) for w in want)]
        if not files:
            return (
                spark.read.option("basePath", base)
                .parquet(base)
                .filter(F.lit(False))
            )
    df = spark.read.option("basePath", base).parquet(
        *[f"{base}/{f}" for f in files]
    )
    if clusters is not None:
        df = df.filter(F.col("cluster").isin(list(clusters)))
    return df


def _ivfpq_meta(index_root: str) -> dict:
    import json

    try:
        with open(f"{index_root}/meta.json") as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise ValueError(
            f"no IVF-PQ index at {index_root!r} (missing meta.json) — "
            "run build_ivfpq_index first"
        ) from None


def _ivfpq_retired(spark, index_root: str) -> DataFrame | None:
    """The sticky retirement list (cand_id bigint), or None when no id
    was ever retired (or compact cleared it)."""
    import os

    rdir = f"{index_root}/_retired"
    if not os.path.isdir(rdir) or not any(
        f.endswith(".parquet") for f in os.listdir(rdir)
    ):
        return None
    return spark.read.parquet(rdir).select("cand_id")


def ivfpq_add(
    spark,
    index_root: str,
    new_embeddings: DataFrame,
    id_col: str | None = None,
    vec_col: str | None = None,
    token: tuple[str, int] | None = None,
) -> dict:
    """FAISS ``add``: encode a batch of new vectors against the FROZEN
    coarse quantizer and residual codebooks of a persisted index
    (build_ivfpq_index) and append them to the cluster-partitioned codes
    relation — the index's quantizers are NEVER retrained, so an added
    vector gets exactly the codes a search expects, and the whole
    lifecycle (build once, add batches as the corpus grows, rebuild when
    drift says so) mirrors dd11's incremental MinHash index on the ANN
    tier.

    Plan shape: the add job reads ONLY the tiny coarse/codebook frames
    (broadcast) and the batch itself — never the existing codes
    partitions (plan- and file-level-asserted in tests); the append
    creates new files inside the cluster dirs the batch lands in and
    touches no existing file. Per-batch cost is one map-only encode pass
    over the batch. Retirement is STICKY (minhash_probe convention): a
    replayed batch containing ids retired since its first add must not
    resurrect them, so the batch anti-joins the (small) retirement list
    — not the codes table — before encoding.

    ATOMIC VISIBILITY: the appended files become readable only when the
    codes manifest commits (one pointer rename) — a reader mid-add never
    sees a partial batch, and a crash before the commit leaves invisible
    orphans that compaction reclaims. ``token=(key, batch_id)`` makes
    the add EXACTLY-ONCE for streaming replays: the high-water mark
    rides inside the committed manifest doc, so skip-decision and
    visibility are the same atomic event (streaming/ann_ingest.py).
    Concurrent adds to one root are serialized by an advisory flock
    (the ingest loop's convention).

    Returns the DRIFT metric the caller uses to schedule retraining
    (FAISS has no such signal; production systems bolt it on): the
    batch's mean residual distance under the frozen coarse quantizer vs
    the build corpus's own (meta's exact-integer baseline). A ratio
    drifting above ~1 means new data no longer fits the frozen
    centroids — recall decays and a rebuild is due. Cumulative add
    stats are folded into meta.json so drift is queryable later without
    rescanning (metrics-only: a crash between manifest commit and meta
    write under-counts the stats, never the index)."""
    import json

    meta = _ivfpq_meta(index_root)
    lock_fh = open(f"{index_root}/_add.lock", "w")
    try:
        import fcntl

        fcntl.flock(lock_fh, fcntl.LOCK_EX)
    except ImportError:  # non-POSIX: documented single-writer contract
        pass
    try:
        man = _codes_manifest(index_root)
        tokens = dict(man.get("tokens", {})) if man else {}
        if token is not None and tokens.get(token[0], -1) >= token[1]:
            return {"added": 0, "skipped_replay": True}
        id_col = id_col or meta["id_col"]
        vec_col = vec_col or meta["vec_col"]
        coarse = spark.read.parquet(f"{index_root}/coarse")
        cb = spark.read.parquet(f"{index_root}/codebooks")
        # the frozen frames are tiny: collapse them to LocalRelations so
        # the per-batch encode embeds the literal values (no frame scan
        # inside the encode job — see _coarse1_local)
        coarse1 = _coarse1_local(spark, coarse)
        cbs = _cbs_local(spark, cb)
        batch = new_embeddings
        retired = _ivfpq_retired(spark, index_root)
        if retired is not None:
            batch = batch.join(
                F.broadcast(
                    retired.select(F.col("cand_id").alias(id_col))
                ),
                id_col,
                "left_anti",
            )
        # materialize the batch-sized encode ONCE, pinned before the write
        # so the append provably never reads the index it extends; the
        # drift aggregate rides the checkpoint pass as observe() metrics
        # (r13) instead of a second aggregation job over the batch
        obs = Observation()
        enc = (
            _ivfpq_encode(
                batch, coarse, cb, meta["dim"], meta["m"], id_col, vec_col,
                coarse1=coarse1, cbs=cbs,
            )
            .observe(
                obs,
                F.sum("res_dist").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            .localCheckpoint(eager=True)
        )
        row = obs.get
        added_n = int(row["n"])
        added_sum = int(row["s"] or 0)
        if added_n or token is not None:
            before = set(_codes_data_files(index_root))
            if added_n:
                # cluster the batch onto its partition value first: one
                # file per touched cluster dir per add instead of one per
                # (task x cluster) — the file count a streaming ingest
                # accumulates is what compaction otherwise pays for
                enc.repartition(F.col("cluster")).write.mode(
                    "append"
                ).partitionBy("cluster").parquet(f"{index_root}/codes")
            new_files = [
                f for f in _codes_data_files(index_root) if f not in before
            ]
            live = man["files"] if man else sorted(before)
            if token is not None:
                tokens[token[0]] = token[1]
            _codes_commit(index_root, list(live) + new_files, tokens)
        meta["added_res_dist_sum"] = (
            meta.get("added_res_dist_sum", 0) + added_sum
        )
        meta["added_n"] = meta.get("added_n", 0) + added_n
        with open(f"{index_root}/meta.json", "w") as fh:
            json.dump(meta, fh)
    finally:
        lock_fh.close()
    build_mean = (
        meta["build_res_dist_sum"] / meta["build_n"] if meta.get("build_n")
        else None
    )
    batch_mean = added_sum / added_n if added_n else None
    return {
        "added": added_n,
        "batch_res_dist_sum": added_sum,
        "batch_mean_res_dist": batch_mean,
        "build_mean_res_dist": build_mean,
        "drift_ratio": (
            batch_mean / build_mean if batch_mean and build_mean else None
        ),
    }


def ivfpq_remove(spark, index_root: str, ids) -> int:
    """FAISS ``remove_ids``, deferred: record ids in the STICKY
    retirement list. Search excludes them immediately; the bytes live on
    until compact_ivfpq_index rewrites the codes relation (the
    tombstone-then-vacuum split every LSM-shaped store uses — an eager
    rewrite per removal would be a full-partition write amplification).
    ``ids`` is an iterable of ints or a single-column DataFrame.
    Returns the number of ids recorded."""
    _ivfpq_meta(index_root)  # existence check
    if isinstance(ids, DataFrame):
        rel = ids.select(ids.columns[0]).toDF("cand_id")
        rel = rel.select(F.col("cand_id").cast("long"))
    else:
        rel = spark.createDataFrame(
            [(int(i),) for i in ids], "cand_id long"
        )
    rel.write.mode("append").parquet(f"{index_root}/_retired")
    return rel.count()


def compact_ivfpq_index(spark, index_root: str) -> dict:
    """The index's VACUUM (compact_minhash_index convention): every add
    appends one file per touched cluster dir, so a long-lived index
    accretes small files without bound, and retirement tombstones
    accumulate scan-side anti-join cost. Compaction rewrites the codes
    relation minus retired ids into ONE file per cluster partition, then
    clears the retirement list (now physically applied). The rewrite
    goes to a sibling dir first and swaps in via rename, so a crash
    mid-compact leaves the live index intact.

    The rewrite also drops exact duplicate rows per cand_id — the repair
    half of the streaming add path's at-least-once window (a replayed
    micro-batch double-appends BIT-IDENTICAL rows, since encoding is a
    pure function of the frozen frames; see streaming/ann_ingest.py).
    Keeping one arbitrary row per cand_id is safe precisely because the
    duplicates are identical."""
    import os
    import shutil

    meta = _ivfpq_meta(index_root)
    codes_dir = f"{index_root}/codes"
    tmp_dir = f"{index_root}/codes__compact"

    def _count_files(d):
        return sum(
            1
            for root, _, files in os.walk(d)
            for f in files
            if f.endswith(".parquet")
        )

    files_before = _count_files(codes_dir)
    # read LIVE rows only (through the manifest): orphan files from
    # crashed adds must be reclaimed, not compacted in
    codes = _codes_read(spark, index_root).dropDuplicates(["cand_id"])
    retired = _ivfpq_retired(spark, index_root)
    if retired is not None:
        codes = codes.join(F.broadcast(retired), "cand_id", "left_anti")
    man = _codes_manifest(index_root)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    (
        codes.repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(tmp_dir)
    )
    rows = spark.read.parquet(tmp_dir).count()
    old_dir = f"{index_root}/codes__old"
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(codes_dir, old_dir)
    os.rename(tmp_dir, codes_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    shutil.rmtree(f"{index_root}/_retired", ignore_errors=True)
    # fresh manifest history over the rewritten dir; idempotency tokens
    # carry over (a replayed streaming batch must stay skipped across a
    # compact), and the dir swap itself reclaimed every orphan
    shutil.rmtree(f"{index_root}/{_CODE_MANIFESTS}", ignore_errors=True)
    _codes_commit(
        index_root,
        _codes_data_files(index_root),
        dict(man.get("tokens", {})) if man else {},
    )
    return {
        "rows": rows,
        "files_before": files_before,
        "files_after": _count_files(codes_dir),
        "n_clusters": meta["n_clusters"],
    }


def ivfpq_index_stats(
    spark, index_root: str, version: int | None = None
) -> DataFrame:
    """(cluster, n_vectors, res_dist_sum, mean_res_dist) — per-inverted-
    list occupancy and quantizer fit of a persisted index, the
    introspection panel an operator reads before trusting a grown index:
    skewed occupancy means the frozen coarse quantizer routes new data
    badly (hot lists slow every probe that hits them — the IVF analog of
    join-key skew, prof1's concern), and a cluster whose mean residual
    distance drifts far above its siblings' is where recall decays
    first. All integers are exact (res_dist is the stored per-vector
    residual L2²; the mean is a trunc-div like every grouped mean in the
    u2 family), so the panel is oracle-hashable. Reads the LIVE view
    (manifest-pinned, retirement-filtered); ``version`` pins history.
    One scan of two narrow columns + one |clusters|-sized aggregate."""
    codes = _codes_read(spark, index_root, version=version)
    retired = _ivfpq_retired(spark, index_root)
    if retired is not None:
        codes = codes.join(F.broadcast(retired), "cand_id", "left_anti")
    return (
        codes.groupBy(F.col("cluster").cast("int").alias("cluster"))
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.sum("res_dist").cast("bigint").alias("res_dist_sum"),
            F.expr("sum(res_dist) DIV count(*)").cast("bigint").alias(
                "mean_res_dist"
            ),
        )
    )


def ivfpq_search(
    spark,
    index_root: str,
    queries: DataFrame,
    nprobe: int = 2,
    k: int = 10,
    id_col: str | None = None,
    vec_col: str | None = None,
    version: int | None = None,
) -> DataFrame:
    """Answer top-k queries from a persisted IVF-PQ index
    (build_ivfpq_index) WITHOUT touching the original embeddings: read
    the tiny coarse/codebook relations, compute each query's nprobe
    lists, and scan ONLY those partitions of the codes table — the
    probed-cluster set (≤ |queries|·nprobe ints, a bounded panel-sized
    collect) is pushed into the scan as a partition filter, so unprobed
    lists cost zero IO (PartitionFilters, plan-asserted in tests).
    Results are byte-identical to running ivfpq_topk in-flight with the
    same parameters. ``version`` answers from a HISTORIC index state
    (ivfpq_index_history lists them): the coarse/codebook frames are
    frozen across adds by construction, so pinning the codes manifest is
    sufficient — "search yesterday's index" costs nothing until a
    compact reclaims the history, the k-family time-travel contract on
    the ANN tier."""
    meta = _ivfpq_meta(index_root)
    id_col = id_col or meta["id_col"]
    vec_col = vec_col or meta["vec_col"]
    dim, m = meta["dim"], meta["m"]
    coarse = spark.read.parquet(f"{index_root}/coarse")
    cb = spark.read.parquet(f"{index_root}/codebooks")

    valid = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    # at-rest frames as LocalRelations (see _coarse1_local): the probe
    # job and the main query embed the literal quantizer instead of each
    # re-scanning + re-aggregating the tiny parquet frames
    coarse1 = _coarse1_local(spark, coarse)
    cbs = _cbs_local(spark, cb)
    probed = sorted(
        {
            r["cluster"]
            for r in queries.where(valid)
            .crossJoin(F.broadcast(coarse1))
            .select(
                F.explode(
                    F.expr(
                        "transform(slice(array_sort("
                        f"{_sql_coarse_dists(_sql_quantize(vec_col))}), "
                        f"1, {nprobe}), pe -> pe.c)"
                    )
                ).alias("cluster")
            )
            .distinct()
            .collect()
        }
    )
    # snapshot read through the codes manifest: unprobed clusters are
    # pruned at the FILE-LIST level (zero IO, not even footers), orphans
    # from crashed adds are invisible, and a concurrent add's partial
    # batch can never leak into the scan
    cand = _codes_read(spark, index_root, probed, version=version).select(
        "cluster", "cand_id", "codes"
    )
    retired = _ivfpq_retired(spark, index_root)
    if retired is not None:
        # tombstoned ids (ivfpq_remove) are excluded at search time until
        # compaction applies them physically; the list is small-side by
        # construction and broadcasts
        cand = cand.join(F.broadcast(retired), "cand_id", "left_anti")
    return _ivfpq_query_side(
        queries, coarse, cb, cand, dim=dim, m=m, nprobe=nprobe, k=k,
        id_col=id_col, vec_col=vec_col, coarse1=coarse1, cbs=cbs,
    )


def ivfpq_refine(
    embeddings: DataFrame,
    queries: DataFrame,
    shortlist: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, cand_id, exact_dist, rank) — EXACT re-rank of an ADC
    shortlist: FAISS's IndexRefineFlat stage, the second half of the
    production two-stage recipe (cheap compressed-domain recall with a
    generous k, then exact distances on the tiny survivor set to repair
    PQ's quantization error before the final cut). ``shortlist`` is any
    (query_id, cand_id) relation — ivfpq_topk/pq_adc_topk output.

    Distances are integer L2 on km1's fixed-point quantization
    (floor((x+1.0)*2^20) per component — the same domain the ADC stage
    scores in), so the refine is engine-exact: per-dim diffs are <=
    2^21, squares <= 2^42, a 64-dim sum < 2^48 — no overflow, no
    tolerance boolean in the oracle.

    Plan shape: the shortlist is (queries x k_adc)-bounded, so it and
    the query-vector relation BROADCAST; one corpus scan fetches the
    candidate vectors (a broadcast semi-shaped join — at rest you'd
    point-read the id list instead), the zip_with/aggregate distance
    fold is whole-stage-codegen JVM work, and the final top-k windows
    over shortlist-sized data. Nothing corpus-sized ever shuffles."""
    cand = shortlist.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("cand_id").cast("bigint").alias("cand_id"),
    )
    cv = embeddings.select(
        F.col(id_col).cast("bigint").alias("cand_id"),
        _pq_quantize(vec_col).alias("cv"),
    )
    qv = queries.select(
        F.col(id_col).cast("bigint").alias("query_id"),
        _pq_quantize(vec_col).alias("qv"),
    )
    fetched = cv.join(F.broadcast(cand), "cand_id")
    paired = fetched.join(F.broadcast(qv), "query_id")
    scored = paired.select(
        "query_id", "cand_id", F.expr(_sql_l2("qv", "cv")).alias("exact_dist")
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("exact_dist"), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "cand_id",
            F.col("exact_dist").cast("bigint").alias("exact_dist"), "rank",
        )
    )
