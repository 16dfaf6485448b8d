"""Corpus-level pipeline compositions — the operations a training-data
curation run strings together, exposed as single calls for the CLI
(`corpus` subcommand) and reused by the registry queries.

Each composition is built entirely from the registry's proven operators
(dedup.py, decontam.py, functions/text.py), so scale posture is inherited:
candidate generation is always banded/bucketed, keeper resolution is one
window over the cluster id, scoring is pure Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from ..functions import text as T


def score_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality/analysis column pack: every text signal the registry exposes
    (token counts, quality ratios, language guess, fingerprint, repetition),
    appended in one pass — 100% Catalyst expressions, no shuffle."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col),
        T.token_count(c).alias("n_tokens"),
        T.distinct_token_count(c).alias("n_distinct_tokens"),
        T.bpe_ish_token_count(c).alias("n_bpe_tokens"),
        T.alpha_ratio(c).alias("alpha_ratio"),
        T.mean_token_length(c).alias("mean_token_len"),
        T.lang_id(c).alias("lang_guess"),
        T.dup_shingle_ratio(c).alias("dup_shingle_ratio"),
        T.fingerprint(c).alias("fingerprint"),
    )


def dedup_keepers(
    docs: DataFrame,
    method: str = "exact",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per document with (cluster_id, cluster_size, keep): the
    canonical-keeper resolution a dedup pass feeds into the filter stage.

    method="exact"  — md5-fingerprint clusters (byte-identical content).
    method="minhash" — MinHash+LSH candidate pairs → connected components.
    method="simhash" — SimHash Hamming pairs → connected components.

    Keeper = lowest id per cluster (exact) / longest text with id
    tie-break (near-dup methods, mirroring cc2)."""
    if method == "exact":
        fp = docs.select(
            F.col(id_col), T.fingerprint(text_col).alias("cluster_key")
        )
        # cluster_id = min doc id per fingerprint: one PARTITIONED window
        # (a dense_rank over a global ordering would funnel every row
        # through a single task at scale)
        w = Window.partitionBy("cluster_key")
        return fp.select(
            F.col(id_col),
            F.min(id_col).over(w).cast("bigint").alias("cluster_id"),
            F.count("*").over(w).cast("bigint").alias("cluster_size"),
            (F.col(id_col) == F.min(id_col).over(w)).alias("keep"),
        )

    from .graph import connected_components

    if method == "minhash":
        from .dedup import lsh_candidate_pairs

        pairs = lsh_candidate_pairs(docs, text_col=text_col, id_col=id_col)
    elif method == "simhash":
        from .dedup import simhash_hamming_pairs

        pairs = simhash_hamming_pairs(
            docs, text_col=text_col, id_col=id_col
        ).select(F.col("id_a"), F.col("id_b"))
    else:
        raise ValueError(f"unknown dedup method: {method}")

    comp = connected_components(pairs, src="id_a", dst="id_b")
    slim = docs.select(
        F.col(id_col), F.length(F.col(text_col)).alias("_len")
    )
    lab = slim.join(comp, slim[id_col] == comp.id, "left").select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.coalesce(comp.component, slim[id_col]).cast("bigint").alias("cluster_id"),
        "_len",
    )
    w = Window.partitionBy("cluster_id")
    wk = w.orderBy(F.col("_len").desc(), F.col(id_col).asc())
    return lab.select(
        id_col,
        "cluster_id",
        F.count("*").over(w).cast("bigint").alias("cluster_size"),
        (F.row_number().over(wk) == 1).alias("keep"),
    )


def hash_sample(
    docs: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic rate-based sample: md5-bucket the id into [0, 1e6) and
    keep buckets below rate·1e6 — reproducible across runs and engines,
    independent of scan order, consistent under re-partitioning (smp1's
    scheme with a per-run salt)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(1_000_000),
    )
    return docs.filter(bucket < int(rate * 1_000_000))


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 256,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-split sequence packing bookkeeping (smp4's layout as a
    reusable pass): per shard, documents concatenate in id order and cut
    into fixed ``seq_len``-token sequences; each document row gains its
    starting sequence id, offset inside it, and boundary-span count — what
    a dataloader needs to map packed sequences back to provenance. One
    window shuffle on the shard key; pure integer arithmetic."""
    # NULL text counts as empty (one zero-length token, the same as ''):
    # an unguarded split(NULL) yields NULL n_tokens, which poisons every
    # downstream cumulative sum and seq assignment for that document.
    d = docs.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.col(shard_col),
        F.size(F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "cb", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    )
    return d.select(
        id_col,
        shard_col,
        "n_tokens",
        F.expr(f"cb DIV {seq_len}").alias("seq_id"),
        (F.col("cb") % seq_len).cast("bigint").alias("offset_in_seq"),
        (
            F.expr(f"(cb + n_tokens - 1) DIV {seq_len}")
            - F.expr(f"cb DIV {seq_len}")
        )
        .cast("bigint")
        .alias("n_spans"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking (chk1's layout as a reusable pass):
    each document splits into ``chunk_tokens``-token chunks every
    ``stride`` tokens (ragged tails kept), emitting the chunk TEXT for
    downstream embedding/indexing. Pure Catalyst sequence+slice transform
    + one explode — no shuffle. NULL text is treated as '' (one empty
    chunk) rather than silently dropping the document (explode of a NULL
    sequence emits zero rows)."""
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(toks), F.lit(stride)),
        lambda s: F.struct(
            s.alias("s"),
            F.concat_ws(" ", F.slice(toks, s, chunk_tokens)).alias("chunk_text"),
            F.size(F.slice(toks, s, chunk_tokens)).alias("n_tokens"),
        ),
    )
    return docs.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.explode(chunks).alias("c"),
    ).select(
        id_col,
        F.col("c.s").cast("bigint").alias("start_pos"),
        F.col("c.n_tokens").cast("bigint").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def negative_pairs(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Contrastive-training negative sampling (smp8's logic as a reusable
    pass): ``k`` pseudo-random partners per document from an integer LCG
    over (id, slot) — reproducible across runs/engines, no rand(). The
    candidate relation joins back to the id table so partners exist, and
    same-source partners are tagged as hard negatives. Self-pairs drop,
    so each doc yields up to k rows. Join sides are corpus-sized but
    narrow (id + source only)."""
    ids = docs.select(
        F.col(id_col).cast("bigint").alias(id_col), F.col(source_col)
    )
    n = ids.agg(F.count("*").cast("bigint").alias("_n_docs"))
    cand = (
        ids.crossJoin(F.broadcast(n))
        .select(
            id_col,
            source_col,
            "_n_docs",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_s"),
        )
        .select(
            id_col,
            F.col("_s").cast("bigint").alias("slot"),
            F.col(source_col),
            (
                (
                    F.col(id_col) * F.lit(1103515245)
                    + F.lit(12345)
                    + F.col("_s") * F.lit(2654435761)
                )
                % F.col("_n_docs")
            ).alias("neg_id"),
        )
    )
    neg = ids.select(
        F.col(id_col).alias("_j_id"), F.col(source_col).alias("_j_source")
    )
    return (
        cand.join(neg, cand.neg_id == neg._j_id)
        .filter(F.col("neg_id") != F.col(id_col))
        .select(
            id_col,
            "slot",
            "neg_id",
            (F.col(source_col) == F.col("_j_source")).alias("same_source"),
        )
    )


def dedup_lines(
    docs: DataFrame,
    min_count: int = 3,
    line_tokens: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequent line removal (RefinedWeb/CCNet boilerplate dedup):
    lines occurring >= ``min_count`` times ACROSS the corpus are dropped
    from every document, and each document's text is reassembled from its
    kept lines in order. ``line_tokens=None`` splits on real newlines
    (web-page boilerplate: nav bars, cookie banners); ``line_tokens=k``
    uses k-token segments instead, for corpora without newlines (t11's
    registry configuration).

    Scale shape: one map-side-combined shuffle builds the line-frequency
    relation, but only its >= min_count tail survives — boilerplate is by
    definition a SMALL distinct set (Heaps-bounded), so it broadcasts back
    over the exploded lines; the corpus then shuffles exactly once, on the
    doc id, to reassemble. Reassembly is order-exact: collect_list of
    (pos, line) structs, array_sort on the unique position, join.

    NULL ``text_col`` is treated as '' (the doc passes through as a single
    empty line rather than vanishing — split/explode of NULL would
    otherwise emit zero rows and silently drop the document). Output
    PROJECTS to (id_col, n_lines, n_dropped, text_col): other input
    columns are not carried — join back on ``id_col`` to reattach them."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    if line_tokens is None:
        parts = F.split(text, "\n")
        sep = "\n"
        line_expr = F.transform(
            F.sequence(F.lit(1), F.size(parts)),
            lambda s: F.struct(
                s.alias("s"), F.element_at(parts, s).alias("line")
            ),
        )
    else:
        toks = F.split(F.trim(text), r"\s+")
        sep = " "
        line_expr = F.transform(
            F.sequence(F.lit(1), F.size(toks), F.lit(line_tokens)),
            lambda s: F.struct(
                s.alias("s"),
                F.array_join(F.slice(toks, s, line_tokens), " ").alias("line"),
            ),
        )
    lines = docs.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.explode(line_expr).alias("c"),
    ).select(id_col, F.col("c.s").alias("s"), F.col("c.line").alias("line"))
    common = (
        lines.groupBy("line")
        .count()
        .filter(F.col("count") >= min_count)
        .select("line", F.lit(True).alias("is_common"))
    )
    marked = lines.join(F.broadcast(common), "line", "left")
    kept = F.when(
        F.col("is_common").isNull(), F.struct(F.col("s"), F.col("line"))
    )
    return marked.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("is_common").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)),
                lambda x: x.getField("line"),
            ),
            sep,
        ).alias(text_col),
    )


def semantic_dedup_keepers(
    docs_with_vectors: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup keeper resolution over an embedding column: quantized
    k-means blocks (dd8's assignment), within-cluster cosine pairs ≥
    ``threshold``, connected components over the near-dup graph, then
    min-id keeper per component. The quadratic term is per-cluster-bounded
    (raise ``n_clusters`` at scale); everything else is the cc2 shape."""
    from ..queries import _kmeans_assign_one_round
    from .graph import connected_components
    from .similarity import cosine_pairs_within

    emb = docs_with_vectors.select(
        F.col(id_col).cast("bigint").alias("vec_id"), F.col(vec_col)
    )
    assign = _kmeans_assign_one_round(emb, k=n_clusters).select(
        "vec_id", F.col("c").alias("cluster")
    )
    tagged = emb.join(assign, "vec_id")
    pairs = cosine_pairs_within(
        tagged, block_col="cluster", threshold=threshold, vec_col=vec_col
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    base = docs_with_vectors.select(F.col(id_col).cast("bigint").alias(id_col))
    lab = base.join(comp, base[id_col] == comp.id, "left").select(
        base[id_col],
        F.coalesce(comp.component, base[id_col]).cast("bigint").alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id")
    return lab.select(
        id_col,
        "cluster_id",
        F.count("*").over(w).cast("bigint").alias("cluster_size"),
        (F.col(id_col) == F.min(id_col).over(w)).alias("keep"),
    )


def bigram_commonness(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """CCNet-style corpus LM quality signal, integer-exact (lm1): train a
    token bigram model ON the corpus (pair + prefix occurrence counts),
    then score each document by how common its bigrams are — sum of
    corpus-wide pair counts over sum of prefix counts. Low commonness ≈
    rare/garbled word sequences (the role perplexity plays in CCNet,
    without ln(), whose last-ulp libm differences would break hash-exact
    oracles; both sums are BIGINT so the single final division is the
    only IEEE op).

    Scale shape (the r5 verdict's pre-aggregation variant): ONE corpus
    explode into (doc, w1, w2), immediately collapsed map-side to
    per-document bigram counts ``k`` — the corpus pays a single
    (doc_id,w1,w2)-keyed shuffle and is never exploded again. The model
    tables derive from that same shuffled relation (Catalyst reuses the
    exchange across the two consumers), rolled up to the
    vocabulary-bounded (w1,w2,pc) + prefix (w1,upc) dims; per-doc sums
    weight by ``k`` (Σ k·pc ≡ Σ pc over raw pairs).

    ``broadcast_model=False`` is the broadcast-overflow fallback for
    web-scale vocabularies where the bigram dim outgrows driver/executor
    broadcast reach: the probe becomes a co-partitioned shuffle hash join
    on (w1, w2) — same results, one extra model-sized exchange.

    Row conservation (r7, ADVICE): one output row per input id — documents
    with <2 tokens or NULL text produce no bigrams, so their scores are
    left-joined back as (n_bigrams=0, sums=0, commonness=NULL) instead of
    silently vanishing from the output (the same no-silent-drop rule r6
    applied to chunk/pack/dedup_lines). The join-back exchanges only
    id-width relations, never text.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    pairs = docs.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.arrays_zip(
                    F.slice(toks, 1, F.size(toks) - 1).alias("w1"),
                    F.slice(toks, 2, F.size(toks) - 1).alias("w2"),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p"),
    ).select(id_col, "p.w1", "p.w2")
    # The explicit null filter is a near-no-op (split() never yields null
    # tokens; NULL ids are malformed input whose bigrams carry no signal)
    # but it NORMALIZES the plan: the probe join pushes isnotnull(w1) AND
    # isnotnull(w2) into its branch while the prefix rollup would push
    # only isnotnull(w1), and the r7 row-conservation left join infers
    # isnotnull(doc_id) into the probe branch alone — unequal canonical
    # subtrees defeat exchange reuse and the corpus would be exploded
    # twice (regression-asserted in tests/test_plans.py).
    pairs = pairs.filter(
        F.col(id_col).isNotNull()
        & F.col("w1").isNotNull()
        & F.col("w2").isNotNull()
    )
    # single corpus-keyed shuffle; every downstream consumer hangs off this
    # one exchange (reuse asserted in tests/test_plans.py)
    dp = pairs.groupBy(id_col, "w1", "w2").agg(
        F.count("*").cast("bigint").alias("k")
    )
    bc = dp.groupBy("w1", "w2").agg(F.sum("k").cast("bigint").alias("pc"))
    # prefix counts are a rollup of the bigram dim — no corpus pass
    uc = bc.groupBy("w1").agg(F.sum("pc").cast("bigint").alias("upc"))
    lm = bc.join(uc, "w1")
    probe = dp.join(
        F.broadcast(lm) if broadcast_model else lm, ["w1", "w2"]
    )
    scored = (
        probe.groupBy(id_col)
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("pc")).cast("bigint").alias("sum_pair_cnt"),
            F.sum(F.col("k") * F.col("upc"))
            .cast("bigint")
            .alias("sum_prefix_cnt"),
        )
        .withColumn(
            "commonness",
            F.round(
                F.col("sum_pair_cnt").cast("double")
                / F.col("sum_prefix_cnt").cast("double"),
                9,
            ),
        )
    )
    base = docs.select(F.col(id_col).cast("bigint").alias(id_col))
    return base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0).cast("bigint")).alias("n_bigrams"),
        F.coalesce("sum_pair_cnt", F.lit(0).cast("bigint")).alias(
            "sum_pair_cnt"
        ),
        F.coalesce("sum_prefix_cnt", F.lit(0).cast("bigint")).alias(
            "sum_prefix_cnt"
        ),
        "commonness",
    )


def domain_cap(
    docs: DataFrame,
    k: int = 10,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Per-domain document cap (crawl-curation staple — bound any single
    domain's share of the corpus): keep the first ``k`` documents per
    ``domain_col`` in deterministic ``md5(id || ':cap')`` order, so the
    kept set is stable across runs and independent of scan order. Returns
    (domain, id, rk) with rk ∈ [1, k].

    ``salt_buckets=S`` enables the rank PRE-FILTER for mega-domains
    (smp5's scale path, promised since r5 and real as of r7): stage 1
    ranks within (domain, salt) — salt a deterministic hash of the id —
    and keeps only local rank ≤ k, so at most S·k candidates per domain
    survive; stage 2 runs the exact ROW_NUMBER over the domain on that
    bounded set. EXACT by a pigeonhole argument: any row in a domain's
    true global top-k is necessarily in its own salt bucket's top-k
    (fewer than k rows of the whole domain hash-order before it, so
    fewer than k of its bucket do). The worst single-task sort drops
    from |domain| to ~|domain|/S and the exact window touches ≤ S·k
    rows per domain — a 10⁹-row mega-domain costs S bounded sorts plus
    one k·S-row sort instead of one 10⁹-row sort. ``None`` keeps the
    single-window plan (one exchange; right when domains are known
    small).
    """
    hx = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":cap")))
    e = docs.select(domain_col, id_col, hx.alias("_hx"))
    if salt_buckets is not None:
        e = _domain_cap_candidates(e, k, domain_col, id_col, salt_buckets)
    w = Window.partitionBy(domain_col).orderBy("_hx", id_col)
    return (
        e.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select(domain_col, id_col, "rk")
    )


def _domain_cap_candidates(
    e: DataFrame, k: int, domain_col: str, id_col: str, salt_buckets: int
) -> DataFrame:
    """Stage 1 of the salted domain cap: per-(domain, salt) local rank,
    keep local rank ≤ k — ≤ ``salt_buckets``·k survivors per domain, and
    the survivor set provably contains the domain's global top-k."""
    salted = e.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col), F.lit("cap-salt")), F.lit(salt_buckets))
    )
    lw = Window.partitionBy(domain_col, "_salt").orderBy("_hx", id_col)
    return (
        salted.withColumn("_lrk", F.row_number().over(lw))
        .filter(F.col("_lrk") <= k)
        .drop("_salt", "_lrk")
    )


def centroid_classifier(
    examples: DataFrame,
    id_col: str = "doc_id",
    feature_col: str = "features",
    label_col: str = "label",
    train_col: str = "is_train",
) -> DataFrame:
    """Nearest-centroid (Rocchio) linear classifier, integer-exact — the
    quality/language GATE pattern of LLM data pipelines (fastText-style
    filters: CCNet, Llama's quality classifiers) with training AND
    inference in-engine: per-class mean vectors over the labeled training
    rows, then each held-out row is scored by which centroid is closer.

    ``examples`` carries (id_col, feature_col array<bigint>, label_col
    0/1, train_col boolean).  Integer features (e.g.
    ``functions.text.hashed_embedding``) keep every step exact: centroid
    components are truncating-division means (Spark DIV == DuckDB //),
    and instead of comparing two L2 distances — whose expansion needs a
    division by two class sizes — the decision value is the margin

        m(x) = 2·x·(c⁺ − c⁻) − (‖c⁺‖² − ‖c⁻‖²)

    an exact BIGINT whose sign says which centroid is nearer (ties →
    class 0, the conservative gate).  Returns one row per held-out
    example: (id_col, label, pred, margin).

    Scale shape: training is one explode of the train rows into
    (class, dim, value) and a partial-agg groupBy (2·dim cells) whose
    2·dim-integer result is collected to the driver (km1's sanctioned
    k·d-scalar centroid collect) and inlined as literals, so inference is
    a pure map-only zip_with/aggregate pass over the held-out split — no
    shuffle and no broadcast exchange touch the scored corpus; the model
    "parameters" are 2·dim integers in the plan itself.  Mismatched
    feature widths surface per-row (zip_with pads with NULL → NULL
    margin), and a training split missing either class raises — a
    one-class gate is a bug upstream, not a model."""
    train = examples.filter(F.col(train_col))
    cent_rows = (
        train.select(
            F.col(label_col).alias("cls"),
            F.posexplode(feature_col).alias("pos", "xv"),
        )
        .groupBy("cls", "pos")
        .agg(F.expr("sum(xv) DIV count(*)").alias("cv"))
        .collect()
    )
    cents: dict[int, dict[int, int]] = {}
    for r in cent_rows:
        cents.setdefault(r["cls"], {})[r["pos"]] = r["cv"]
    if sorted(cents) != [0, 1]:
        raise ValueError(
            f"need both classes in the training split, saw {sorted(cents)}"
        )
    cp = [v for _, v in sorted(cents[1].items())]
    cn = [v for _, v in sorted(cents[0].items())]
    if len(cp) != len(cn):
        raise ValueError(
            f"per-class feature widths differ: {len(cp)} vs {len(cn)}"
        )
    diff = F.array(*[F.lit(p - n).cast("long") for p, n in zip(cp, cn)])
    norm_gap = sum(p * p for p in cp) - sum(n * n for n in cn)

    x = F.col(feature_col)
    margin = (
        F.lit(2)
        * F.aggregate(
            F.zip_with(x, diff, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        - F.lit(norm_gap)
    ).cast("bigint")
    return examples.filter(~F.col(train_col)).select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.col(label_col).cast("int").alias("label"),
        F.when(margin > 0, F.lit(1)).otherwise(F.lit(0)).alias("pred"),
        margin.alias("margin"),
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
    max_weight: int = 64,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006
    "Weighted random sampling with a reservoir", A-ES): select ``k`` rows
    where selection probability tracks ``weight_col`` — the curation move
    behind quality-weighted corpus subsets (sample high-quality documents
    preferentially, without the duplicates replacement sampling allows).

    A-ES keys each row with u^(1/w) (u uniform) and keeps the k largest.
    This implementation replaces the float key with an INTEGER-EXACT
    equivalent: the maximum of w independent 32-bit hash tickets
    ``H(id:j:salt)``, j = 1..w. max of w iid U(0,1) has CDF x^w — the
    law of u^(1/w) — so the selection distribution is A-ES's exactly,
    while key comparison is int64 (no libm, no last-ulp divergence
    between engines; the DuckDB oracle reproduces keys bit-for-bit).

    Weights are clamped to [1, ``max_weight``] (NULL → 1); the ticket
    array is a per-row ``transform(sequence(...))`` expression — O(w)
    register work, NO explode, NO extra rows. Selection is a global
    top-k: Catalyst plans ORDER BY + LIMIT as TakeOrderedAndProject
    (per-partition heap + driver merge of k·P candidates — never a
    global sort), the shape that survives a 10⁹-row corpus. Ties break
    on ``id_col`` ascending, so the kept set is fully deterministic.

    Rows with NULL ``id_col`` are dropped (no stable identity → no
    reproducible ticket; same contract as hash_sample/domain_cap).

    Weight typing (r8 ADVICE): integer weights pass through; FRACTIONAL
    weights are HALF_UP-rounded to the nearest integer before clamping
    (the old silent cast('int') TRUNCATED — 0.9 became 0 and then the
    clamp floor 1, collapsing all sub-1 weights upward and all [1,2)
    weights to 1 without warning). The integer-exact ticket scheme
    quantizes by construction; callers needing finer weight resolution
    pre-scale (w*10 with max_weight*10). Non-numeric weight columns are
    rejected. ``id_col`` must be UNIQUE: rows sharing an id draw
    identical correlated tickets, which skews the A-ES distribution —
    the same reproducibility contract as hash_sample's hash-of-id
    bucketing, enforced here only by documentation because a uniqueness
    probe would cost a full aggregation per call."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_weight < 1:
        raise ValueError(f"max_weight must be >= 1, got {max_weight}")
    wtype = dict(docs.dtypes).get(weight_col, "")
    if wtype in ("tinyint", "smallint", "int", "bigint"):
        w_int = F.col(weight_col).cast("int")
    elif wtype in ("float", "double") or wtype.startswith("decimal"):
        w_int = F.round(F.col(weight_col)).cast("int")
    else:
        raise ValueError(
            f"weight_col {weight_col!r} has non-numeric type {wtype!r} — "
            "weighted_sample needs an integer or fractional numeric weight"
        )
    w = F.greatest(
        F.lit(1),
        F.least(F.coalesce(w_int, F.lit(1)), F.lit(max_weight)),
    )
    key = _aes_sample_key(id_col, w, salt)
    return (
        docs.filter(F.col(id_col).isNotNull())
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _aes_sample_key(id_col: str, w, salt: str):
    """The integer-exact A-ES key: max of w md5 tickets H(id:j:salt) —
    max of w iid U(0,1) has CDF x^w, the law of u^(1/w). Shared by the
    global (weighted_sample) and per-group (grouped_weighted_sample)
    variants so both stay bit-identical to the SQL oracles."""
    return F.array_max(
        F.transform(
            F.sequence(F.lit(1), w),
            lambda j: F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(id_col).cast("string"),
                            F.lit(":"),
                            j.cast("string"),
                            F.lit(f":{salt}"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
        )
    )


def grouped_weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    group_col: str,
    id_col: str = "doc_id",
    salt: str = "gws",
    max_weight: int = 64,
) -> DataFrame:
    """Per-GROUP weighted sampling without replacement: the k rows with
    the largest A-ES keys WITHIN each ``group_col`` value — the stratified
    form of ``weighted_sample`` (quality-weighted subsets per source /
    domain / language, the mix-building move that keeps every stratum
    represented while preferring high-weight rows inside it).

    Same integer-exact ticket scheme and weight contract as
    weighted_sample (integers pass through, fractional weights HALF_UP
    round, non-numeric rejected; ``id_col`` must be unique; NULL ids are
    dropped). Selection is one window per group (rank by key desc, id
    asc) — a single exchange on ``group_col``; the ticket array is
    map-side register work. Rows with NULL group form their own stratum
    (a NULL crawl domain is still a domain)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_weight < 1:
        raise ValueError(f"max_weight must be >= 1, got {max_weight}")
    wtype = dict(docs.dtypes).get(weight_col, "")
    if wtype in ("tinyint", "smallint", "int", "bigint"):
        w_int = F.col(weight_col).cast("int")
    elif wtype in ("float", "double") or wtype.startswith("decimal"):
        w_int = F.round(F.col(weight_col)).cast("int")
    else:
        raise ValueError(
            f"weight_col {weight_col!r} has non-numeric type {wtype!r} — "
            "grouped_weighted_sample needs a numeric weight"
        )
    w = F.greatest(
        F.lit(1), F.least(F.coalesce(w_int, F.lit(1)), F.lit(max_weight))
    )
    win = Window.partitionBy(group_col).orderBy(
        F.col("sample_key").desc(), F.col(id_col).asc()
    )
    return (
        docs.filter(F.col(id_col).isNotNull())
        .withColumn("sample_key", _aes_sample_key(id_col, w, salt))
        .withColumn("sample_rank", F.row_number().over(win).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
    )


def grouped_split(
    docs: DataFrame,
    group_col: str = "source",
    cuts: tuple[int, int] = (80, 90),
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a function of
    ``group_col`` ALONE (bucket = md5-uniform of "group:salt" mod 100;
    < cuts[0] → train, < cuts[1] → val, else test), so every row sharing
    a group — every document from one crawl domain, every trace from one
    address — lands in the SAME split. Splitting i.i.d. by row leaks
    near-duplicate siblings across the boundary and inflates eval; group
    hashing is the standard fix (GroupShuffleSplit et al.).

    Deterministic across runs/engines (smp1's md5-bucket convention),
    consistent under corpus growth (a group never migrates), map-only
    (zero shuffles — the assignment is a scalar expression on each row).
    NULL groups form their own bucket (hash of the empty sentinel), so
    NULL-group rows co-travel too rather than scattering."""
    lo, hi = cuts
    if not 0 < lo <= hi <= 100:
        raise ValueError(f"cuts must satisfy 0 < lo <= hi <= 100, got {cuts}")
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.coalesce(F.col(group_col).cast("string"), F.lit("\x01null")),
                        F.lit(f":{salt}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(100),
    )
    return docs.withColumn(
        "split",
        F.when(bucket < lo, F.lit("train"))
        .when(bucket < hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def token_budget_mix(
    docs: DataFrame,
    budget: int,
    token_col: str,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mixb",
    budgets: dict[str, int] | None = None,
) -> DataFrame:
    """Token-BUDGETED mix construction: per source, keep a deterministic
    hash-ordered prefix of documents whose running token total stays
    within the source's budget — the data-mixing move that builds a
    training corpus to an exact per-source token recipe (smp3 rebalances
    by expected RATE; budgets enforce the total). Kept rows return with
    ``cum_tokens`` (the running total INCLUDING the row) for recipe
    audits.

    Determinism: the per-source order is md5(id:salt) — an unbiased
    sample prefix, stable across runs/engines, unaffected by corpus
    growth before the cut line. A row whose own tokens exceed the
    remaining budget is dropped along with everything after it (the
    budget is a hard ceiling, documented — no partial documents). NULL
    token counts count as 0; NULL ids drop (no stable order position).

    ``budgets`` optionally overrides the default ``budget`` per source
    value (unlisted sources use the default). Plan: ONE exchange on the
    source column for the cumsum window; everything else is map-side."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}")))
    toks = F.coalesce(F.col(token_col).cast("bigint"), F.lit(0))
    b = F.lit(budget).cast("bigint")
    if budgets:
        mapping = F.create_map(
            *[F.lit(x) for kv in budgets.items() for x in kv]
        )
        b = F.coalesce(
            mapping[F.col(source_col)].cast("bigint"), b
        )
    w = Window.partitionBy(source_col).orderBy(h, F.col(id_col).asc())
    return (
        docs.filter(F.col(id_col).isNotNull())
        .withColumn("_toks", toks)
        .withColumn("cum_tokens", F.sum("_toks").over(w))
        .filter(F.col("cum_tokens") <= b)
        .drop("_toks")
    )


# ---- BPE tokenizer: train merge rules, apply, count tokens ---------------
#
# Words are encoded as separator-framed strings — chr(31) wraps the word,
# chr(31)chr(31) separates symbols — so the standard ``replace(enc,
# SEP+x+SEP+SEP+y+SEP, SEP+xy+SEP)`` implements EXACTLY BPE's left-to-right
# non-overlapping merge semantics (scan resumes after each replacement:
# 'aaaa' under rule (a,a) -> [aa, aa]; the frame makes rule symbols match
# whole-symbol only — the 'a' in 'ba' can never match). The same encoding
# is mirrored verbatim in the v3/v4 DuckDB oracles (queries.py).
#
# Character-class contract (adversarial/non-ASCII text):
# - chr(31) (\x1f) IS the frame, so it must never appear inside a word —
#   callers strip it from the raw text (_bpe_strip_sep / the oracle's
#   replace(text, chr(31), '')) before any word ever reaches _bpe_encode.
# - the encode regex uses (?s)(.) so '.' is TOTAL in both engines: bare
#   '.' skips U+2028/U+2029/U+0085/\r/\n in Java regex but only \n in
#   DuckDB's RE2, which would frame those code points differently.
# - residual documented divergence: the \s+ word SPLIT — Java \s
#   includes \x0B (vertical tab), RE2's does not, so a text containing
#   \x0B between non-spaces tokenizes as two words here and one in the
#   oracle. This matches every other \s+-splitting operator in the repo
#   (t1/t2/lm1/...) and is a property of the split convention, not of
#   the BPE encoding.

_BPE_SEP = "\x1f"


def _bpe_strip_sep(col) -> "F.Column":
    """Delete the frame byte \\x1f from raw text so it can never collide
    with the separator-framed encoding (oracle mirror:
    ``replace(text, chr(31), '')``)."""
    return F.translate(col, _BPE_SEP, "")


def _bpe_encode(col) -> "F.Column":
    e = F.concat(
        F.lit(_BPE_SEP),
        F.regexp_replace(col, "(?s)(.)", "$1" + _BPE_SEP + _BPE_SEP),
    )
    return e.substr(F.lit(1), F.length(e) - 1)


def _bpe_symbols(enc_col: str = "enc") -> "F.Column":
    return F.split(
        F.col(enc_col).substr(F.lit(2), F.length(enc_col) - 2),
        _BPE_SEP + _BPE_SEP,
    )


def _bpe_pair_counts(rel: DataFrame) -> DataFrame:
    """(x, y, cnt): adjacent-symbol pair frequencies weighted by word
    frequency ``f`` — vocab-sized input, vocab-sized output. Single-
    symbol words (every >= 2-char word after enough merges) contribute
    no pairs: the size guard matters because Spark's ``sequence(1, 0)``
    DESCENDS instead of yielding empty, so an index-arithmetic
    formulation walks off the array under ANSI (found by the 'aa'
    hand-example; lm1's guarded arrays_zip convention instead)."""
    syms = rel.select(_bpe_symbols().alias("a"), "f")
    n = F.size("a")
    pairs = syms.select(
        F.explode(
            F.when(
                n >= 2,
                F.arrays_zip(
                    F.slice("a", 1, n - 1).alias("x"),
                    F.slice("a", 2, n - 1).alias("y"),
                ),
            ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
        ).alias("p"),
        "f",
    )
    return (
        pairs.select("p.x", "p.y", "f")
        .groupBy("x", "y")
        .agg(F.sum("f").cast("bigint").alias("cnt"))
    )


def _bpe_apply_rule(
    rel: DataFrame, rule: DataFrame, keep: tuple = ("f",)
) -> DataFrame:
    """Apply the 1-row argmax merge rule to every encoded word — the rule
    relation broadcasts, the application is map-only."""
    return (
        rel.crossJoin(
            F.broadcast(
                rule.select(F.col("x").alias("mx"), F.col("y").alias("my"))
            )
        )
        .select(
            F.expr(
                "replace(enc, concat(chr(31), mx, chr(31), chr(31), my, "
                "chr(31)), concat(chr(31), mx, my, chr(31)))"
            ).alias("enc"),
            *keep,
        )
        .localCheckpoint(eager=True)  # vocab-sized; feeds 2 consumers
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(id, n_words, n_tokens): train ``merges`` BPE merge rules on the
    corpus (rules learned on the >= 2-char word vocabulary, argmax pair
    by (cnt desc, pair) each round — v3's certified convention), apply
    them to every word, and count tokens per document. The number an
    LLM-data pipeline bills against a token budget, under the corpus's
    OWN tokenizer instead of a whitespace proxy.

    Scale shape — tokenize the VOCABULARY, not the corpus: the corpus
    collapses once to per-(doc, word) counts (the only corpus-keyed
    shuffle); training and the encode→merge→count chain run over the
    Heaps-bounded distinct-word relation (map-only passes + 1-row
    broadcast rules); per-doc sums broadcast-join the tokenized vocab
    back onto the (doc, word, count) relation (``broadcast_vocab=False``
    is the web-scale-vocabulary fallback: a co-partitioned shuffle join,
    lm1's convention). Expensive string work is paid once per DISTINCT
    word, never per occurrence.

    Row conservation: one output row per input id — docs with NULL/empty
    text report (0, 0) instead of vanishing (the r6/r7 no-silent-drop
    rule). A training round whose argmax is unlearnable (no pair occurs
    — empty or all-single-char vocabulary) STOPS the ascent early
    instead of cross-joining an empty rule (which would wipe the
    relation): with zero learnable rules tokens == characters."""
    if merges < 0:
        raise ValueError(f"merges must be >= 0, got {merges}")
    dw = (
        docs.select(
            F.col(id_col).cast("bigint").alias(id_col),
            F.explode(
                F.split(
                    F.trim(
                        _bpe_strip_sep(
                            F.lower(F.coalesce(F.col(text_col), F.lit("")))
                        )
                    ),
                    r"\s+",
                )
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy(id_col, "w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    trainw = (
        dw.filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.sum("c").cast("bigint").alias("f"))
    )
    enc = trainw.select(_bpe_encode("w").alias("enc"), "f").localCheckpoint(
        eager=True
    )
    rules = []
    for _ in range(merges):
        # the learnability probe (did the argmax produce a row?) rides the
        # checkpoint pass as an observe() metric — no separate count job
        obs = Observation()
        m = (
            _bpe_pair_counts(enc)
            .orderBy(F.col("cnt").desc(), "x", "y")
            .limit(1)
            .observe(obs, F.count(F.lit(1)).alias("_n"))
            .localCheckpoint(eager=True)
        )
        if obs.get["_n"] == 0:
            break  # nothing left to merge — stop, don't wipe the relation
        rules.append(m)
        enc = _bpe_apply_rule(enc, m)
    aenc = dw.select("w").distinct().select("w", _bpe_encode("w").alias("enc"))
    for m in rules:
        aenc = _bpe_apply_rule(aenc, m, keep=("w",))
    tok = aenc.select(
        "w", F.size(_bpe_symbols()).cast("bigint").alias("n_tok")
    )
    perdoc = (
        dw.join(F.broadcast(tok) if broadcast_vocab else tok, "w")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum(F.col("c") * F.col("n_tok")).cast("bigint").alias("n_tokens"),
        )
    )
    zero = F.lit(0).cast("bigint")
    return (
        docs.select(F.col(id_col).cast("bigint").alias(id_col))
        .distinct()
        .join(perdoc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", zero).alias("n_words"),
            F.coalesce("n_tokens", zero).alias("n_tokens"),
        )
    )
