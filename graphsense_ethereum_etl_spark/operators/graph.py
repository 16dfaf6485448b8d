"""Graph operators over edge-list DataFrames.

The reference stores the address graph implicitly as edge lists
(transaction/trace from_address → to_address, schema.cql:36-38,60-62) and
leaves analytics to downstream consumers; this engine operates on them
directly. Degree and k-hop are plain joins/aggs (queries g1/g2); this module
adds the iterative operator those can't express: connected components —
which is also the missing last step of every pairwise-dedup pipeline
(duplicate PAIRS → duplicate CLUSTERS → pick one canonical doc per cluster).

Implementation: minimum-label propagation. label(v) starts as v; each round
every vertex takes the min of its own and its neighbors' labels; fixpoint
after O(component diameter) rounds. Each round is one shuffle join + one
aggregation — no driver-side graph state, the only driver traffic is a
1-row convergence probe per round. ``localCheckpoint`` truncates the plan
lineage every iteration (without it, round N's plan contains N copies of
the join tree and planning time grows quadratically — the standard trap of
iterative DataFrame algorithms).

Dedup-cluster diameters are tiny (near-cliques), so rounds ≈ 2-3 in
practice with plain label propagation; for adversarial long-chain graphs
(diameter ≫ rounds) ``algorithm="star"`` switches to large-star/small-star
alternation (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14), which contracts the graph toward stars and converges in
O(log n) rounds regardless of diameter. Both produce identical labels
(component = min reachable id) and are oracle-checkable against a DuckDB
recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..plans import checkpoint_partitioned, evolving_hint


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    algorithm: str = "label",
) -> DataFrame:
    """(id, component) for every vertex in ``edges``; component = the
    minimum vertex id reachable from it. Isolated vertices don't appear
    (no edge rows) — union them in upstream if needed.

    ``algorithm``: "label" (min-label propagation, O(diameter) rounds — the
    right default for dedup near-cliques) or "star" (large-star/small-star
    alternation, O(log n) rounds — use when component diameters are unknown
    or adversarial, e.g. chain-shaped link graphs).

    Vertex ids must be integral (the label algebra is MIN over bigint);
    edges with a NULL endpoint — including ids a bigint cast NULLs out —
    are dropped explicitly here, BEFORE the algorithm: a NULL vertex
    carries no identity, and without this filter it would propagate as a
    phantom "minimum" node id through every join (the adversarial harness
    pins the contract). Callers with string ids (hex addresses) map them
    to dense ints upstream, as every dedup call site does."""
    edges = edges.filter(
        F.col(src).cast("bigint").isNotNull()
        & F.col(dst).cast("bigint").isNotNull()
    )
    if algorithm == "star":
        labels, _ = _star_components(edges, src, dst, max_iter)
        return labels
    e = edges.select(
        F.col(src).cast("bigint").alias("s"), F.col(dst).cast("bigint").alias("d")
    )
    sym = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    # pin the edge partitioning on the per-round join key through the
    # checkpoint (plans/checkpoint.py): rounds shuffle only the labels,
    # the edge set crosses the wire exactly once (r8 shuffle-byte audit)
    sym = checkpoint_partitioned(sym, "d")
    # Round 1 fused into initialization (r14): with label(v) = v, the
    # first round's neighbor-min join degenerates to a plain aggregation —
    # label_1(v) = min(v, min neighbor) — so the identity-label relation,
    # its checkpoint, and the round-1 join+join-back pass are all skipped.
    # The round-1 change count (label < v) rides the same checkpoint as an
    # observe() metric, preserving the loop's convergence contract (a
    # graph whose every vertex is its own component minimum — e.g. i->i+1
    # chains labeled from the low end — exits before any join runs).
    obs0 = Observation()
    labels = (
        sym.groupBy(F.col("s").alias("v"))
        .agg(F.least(F.min("d"), F.col("s")).alias("label"))
        .withColumn("_changed", F.col("label") < F.col("v"))
        .observe(obs0, F.count_if(F.col("_changed")).alias("_n"))
        .localCheckpoint(eager=True)
        .drop("_changed")
    )
    # Size-gated hint regime for every evolving side this loop produces
    # (plans/hints.py): labels and nbr_min are vertex-sized or smaller in
    # every round, so ONE vertex count (over the just-materialized
    # checkpoint — a cached scan) bounds them all. Under the threshold the
    # evolving side is broadcast and the pinned edges never move at all;
    # over it, shuffle_hash keeps the r8 audit's no-corpus-broadcast
    # guarantee (Catalyst alone broadcast the EDGE set at sf~1 and OOMed).
    n_vertices = labels.count()
    if obs0.get["_n"] == 0:
        return labels.select(
            F.col("v").alias("id"), F.col("label").alias("component")
        )
    for _ in range(max_iter - 1):
        nbr_min = (
            sym.join(
                evolving_hint(labels, n_vertices), sym["d"] == labels["v"]
            )
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_label = F.least(
            labels["label"], F.coalesce(F.col("nbr_label"), labels["label"])
        )
        # Probe fusion (r2 verdict #8, tightened r13): the old label is in
        # hand during the round's join, so the change count rides INSIDE the
        # materialization pass itself as an observe() metric (accumulator-
        # merged, no extra pass, no extra job) — the per-round driver traffic
        # is exactly the checkpoint action, not checkpoint + probe job.
        # Min-propagation only ever decreases labels, so "<" is the change.
        obs = Observation()
        new_labels = (
            # join-back gated the same way: nbr_min is VERTEX-sized —
            # broadcastable here, corpus-sized at 100 TB
            labels.join(
                evolving_hint(nbr_min, n_vertices),
                labels["v"] == nbr_min["s"],
                "left",
            )
            .select(
                labels["v"],
                new_label.alias("label"),
                (new_label < labels["label"]).alias("_changed"),
            )
            .observe(obs, F.count_if(F.col("_changed")).alias("_n"))
            .localCheckpoint(eager=True)
        )
        labels = new_labels.drop("_changed")
        if obs.get["_n"] == 0:
            break
    return labels.select(F.col("v").alias("id"), F.col("label").alias("component"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 2,
) -> DataFrame:
    """(id, community) after ``rounds`` synchronous label-propagation steps
    over the undirected simple graph of ``edges`` — near-linear community
    detection (Raghavan et al. 2007), made DETERMINISTIC: every vertex
    starts as its own label; each round every vertex simultaneously adopts
    the most frequent label among its neighbours, ties broken by the
    SMALLEST label. Synchronous update + value tie-break replace the two
    classic nondeterminism sources (asynchronous visit order, random
    tie-break), so the result is a pure function of the edge set, the
    label algebra is all-integer, and each round is SQL-unrollable — the
    registry oracle (g7) hash-checks exactly.

    Contract mirrors connected_components: NULL-endpoint edges are dropped
    before the algorithm; self-loops are not neighbours and multi-edges
    count once (the neighbour relation is a SET); a vertex appearing only
    in self-loops keeps its own label; isolated vertices don't appear (no
    edge rows).

    Scale shape: per round, ONE shuffle-join of the symmetrized edge set
    against the current labels on the neighbour key, a (vertex, label)
    count that combines map-side, a per-vertex argmax as MAX over a
    (count, -label) struct — no window, no sort — and a left join back to
    the vertex relation. Deep runs truncate lineage with localCheckpoint
    every few rounds like connected_components; the default 2 rounds keep
    a single shallow plan."""
    ok = edges.filter(
        F.col(src).cast("bigint").isNotNull()
        & F.col(dst).cast("bigint").isNotNull()
    )
    e = ok.select(
        F.col(src).cast("bigint").alias("s"), F.col(dst).cast("bigint").alias("d")
    )
    verts = (
        e.select(F.col("s").alias("v"))
        .union(e.select(F.col("d").alias("v")))
        .distinct()
    )
    und = e.filter(F.col("s") != F.col("d"))
    sym = und.union(
        und.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct()
    # pinned partitioning on the per-round join key (see connected_components)
    sym = checkpoint_partitioned(sym, "d")
    labels = verts.withColumn("label", F.col("v")).localCheckpoint(eager=True)
    # one vertex count bounds every evolving side (see connected_components)
    n_vertices = labels.count()
    for r in range(rounds):
        nbr = sym.join(
            evolving_hint(labels, n_vertices), sym["d"] == labels["v"]
        ).select(sym["s"].alias("u"), F.col("label"))
        cnt = nbr.groupBy("u", "label").agg(F.count("*").alias("c"))
        best = cnt.groupBy("u").agg(
            F.max(
                F.struct(F.col("c").alias("c"), (-F.col("label")).alias("nl"))
            ).alias("b")
        ).select(F.col("u"), (-F.col("b.nl")).alias("nlabel"))
        # join-back gated like connected_components: best is vertex-sized
        labels = labels.join(
            evolving_hint(best, n_vertices), labels["v"] == best["u"], "left"
        ).select(
            labels["v"],
            F.coalesce(F.col("nlabel"), labels["label"]).alias("label"),
        )
        if rounds > 3 and (r + 1) % 3 == 0:
            labels = labels.localCheckpoint(eager=True)
    return labels.select(
        F.col("v").alias("id"), F.col("label").alias("community")
    )


def _star_components(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> tuple[DataFrame, int]:
    """Large-star/small-star alternation (Kiveris et al., SoCC'14).

    Each round:
      large-star  — per node u over its full neighborhood Γ(u):
                    m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
      small-star  — per node u over its SMALLER neighbors (edges directed
                    larger→smaller): m = min(Γ≤(u) ∪ {u}); emit (v, m) for
                    v ∈ Γ≤(u) ∪ {u}, v ≠ m.

    Both steps are one groupBy-min plus one join each (all hash-partitioned
    on the node id — consecutive rounds reuse the same partitioning), and
    each round at least halves the height of every tree, so the edge set
    converges to per-component stars (v → component-min) in O(log n) rounds
    independent of diameter. ``localCheckpoint`` truncates lineage per round
    (same trap as the label loop). Convergence probe, fused (r2 verdict #8):
    each round computes a cheap order-independent SIGNATURE of its edge set
    (count + decimal-exact sum of xxhash64(u,v)) as one aggregate over the
    just-checkpointed partitions. A signature differing from last round's
    PROVES the set changed (equal sets ⇒ equal signature), so the expensive
    two-sided exceptAll set-compare runs only when the signature repeats —
    i.e. exactly once, at the suspected fixpoint, to rule out a hash-sum
    collision. Soundness is preserved; the per-round probe drops from two
    shuffle-join jobs to one cached-scan aggregate.

    Returns (labels, rounds_used): labels as (id, component) for every
    non-isolated vertex.
    """
    e = (
        edges.select(
            F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    vertices = (
        e.select(F.col("u").alias("id"))
        .union(e.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    def _signature(df: DataFrame):
        row = df.agg(
            F.count("*").alias("c"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["c"], row["h"])

    prev_sig = _signature(e)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star over the symmetric neighborhood
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over larger→smaller directed edges
        d = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins2 = d.groupBy("u").agg(F.min("v").alias("m"))
        joined = d.join(mins2, "u")
        small = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(joined.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        sig = _signature(small)
        if sig != prev_sig:
            e, prev_sig = small, sig  # provably changed — no set-compare needed
            continue
        # signature repeated: confirm true fixpoint (collision guard)
        changed = (
            small.exceptAll(e).limit(1).count() + e.exceptAll(small).limit(1).count()
        )
        e, prev_sig = small, sig
        if changed == 0:
            break
    # stars: u → component min (u never the min itself); minima label themselves
    labels = vertices.join(e, vertices.id == e.u, "left").select(
        F.col("id"), F.coalesce(F.col("v"), F.col("id")).alias("component")
    )
    return labels, rounds


def bipartite_project(
    edges: DataFrame,
    left: str = "s",
    right: str = "p",
    degree_cap: int | None = None,
    weight_col: str = "shared",
) -> DataFrame:
    """One-mode projection of a bipartite edge list onto its ``left``
    side: two left vertices are connected with weight = number of shared
    ``right`` neighbors (supplier co-sourcing, co-purchase,
    author-collaboration graphs). Input edges are deduplicated first, so
    multi-edges never inflate weights.

    The self-join key is the RIGHT vertex, so the pair blow-up is
    Σ deg(r)² over right vertices — a single hub with degree d emits
    d·(d-1)/2 pairs before any aggregation (degree 10⁵ → 5·10⁹ rows from
    one key). ``degree_cap`` bounds that: right vertices whose degree
    exceeds the cap are EXCLUDED from the projection (hub suppression —
    standard in co-occurrence analysis, where a neighbor shared by
    everyone carries no similarity signal; cf. tf-idf's df cutoff). With
    the cap, per-key fan-out is ≤ cap², making the worst key a constant
    the planner's AQE skew handling never has to rescue. ``None`` keeps
    every vertex (exact projection; only safe when the right-side degree
    distribution is known bounded).

    Scale shape: the degree relation is aggregated map-side and joined
    back on the right key — the same key the self-join shuffles on, so
    the filter adds no extra exchange of the (large) edge relation
    beyond the one the projection already pays. Pairs collapse map-side
    before the final (s1,s2) exchange.

    Vertex ids keep their INPUT types — the self-join, the ``<`` pair
    ordering, and the groupBy all work on any comparable type, and this
    repo's core vertex domain is hex address STRINGS: an unconditional
    bigint cast (the pre-r7 behavior) turned those into NULL join keys and
    silently dropped every edge. NULL vertices are dropped explicitly (a
    NULL never equi-joins, so they could never contribute a pair anyway).
    """
    e = (
        edges.select(F.col(left).alias("_l"), F.col(right).alias("_r"))
        .filter(F.col(left).isNotNull() & F.col(right).isNotNull())
        .distinct()
    )
    if degree_cap is not None:
        # degree as a WINDOW over the right key, not a groupBy+join-back:
        # the window shuffles e onto hashpartitioning(_r) — exactly the
        # partitioning the self-join below needs — so Catalyst reuses one
        # exchange for cap filter and join instead of paying a separate
        # degree-relation shuffle plus a join.
        from pyspark.sql import Window

        w = Window.partitionBy("_r")
        e = (
            e.withColumn("_deg", F.count("*").over(w))
            .filter(F.col("_deg") <= degree_cap)
            .drop("_deg")
        )
    a = e.select(F.col("_l").alias(f"{left}1"), "_r")
    b = e.select(F.col("_l").alias(f"{left}2"), "_r")
    return (
        a.join(b, "_r")
        .filter(F.col(f"{left}1") < F.col(f"{left}2"))
        .groupBy(f"{left}1", f"{left}2")
        .agg(F.count("*").cast("bigint").alias(weight_col))
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, n_triangles) — per-vertex triangle participation over the
    undirected simple graph of ``edges``; vertices in no triangle don't
    appear. On a dedup candidate graph this measures TRANSITIVITY (a
    near-dup relation whose pairs close into triangles clusters cleanly;
    open wedges are the borderline pairs), the clustering-coefficient
    numerator.

    Algorithm: compact-forward / node-iterator++ (Latapy 2008; Suri &
    Vassilvitskii's MapReduce form, WWW'11). Every undirected edge is
    ORIENTED from its lower-(degree, id) endpoint to its higher one —
    a total acyclic order, so each triangle survives as exactly ONE
    directed wedge (u→v, u→w) with ord(v) < ord(w) plus its closing edge
    (v→w), counted once with no multiplicity correction. The degree
    orientation is the scale bound: out-degree after orienting is
    O(√m) for EVERY vertex (a vertex keeps only edges toward
    higher-degree endpoints), so wedge volume is Σ outdeg² = O(m^1.5)
    worst-case regardless of hub skew — an id-only orientation would
    leave a low-id hub with out-degree m and a quadratic wedge burst.

    Plan shape: one degree aggregation, orientation as a pure projection
    (no shuffle), wedge self-join keyed on the shared source u, closure
    equi-join keyed on the (v, w) edge pair, per-vertex explode+count.
    Each shuffle moves O(m) edge rows or O(m^1.5)-bounded wedge rows —
    no broadcast of corpus-sized relations anywhere.

    Contract (harnessed): NULL-endpoint edges and self-loops are dropped;
    multi-edges count once (the edge relation is a SET)."""
    tri = _oriented_triangles(edges, src, dst)
    verts = (
        tri.select(F.col("u").alias("id"))
        .unionAll(tri.select(F.col("v").alias("id")))
        .unionAll(tri.select(F.col("w").alias("id")))
    )
    return verts.groupBy("id").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )


def _normalized_edges(
    edges: DataFrame, src: str, dst: str
) -> DataFrame:
    """(a, b) undirected simple edge SET, a < b, NULLs/self-loops dropped,
    checkpointed — the shared input of the triangle family (and of g10's
    degree relation, which reuses this checkpoint instead of re-running
    the upstream edge pipeline)."""
    return (
        edges.select(
            F.col(src).cast("bigint").alias("a"),
            F.col(dst).cast("bigint").alias("b"),
        )
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def _edge_degrees(e0: DataFrame) -> DataFrame:
    """(v, d) degree over a normalized edge set."""
    return (
        e0.select(F.col("a").alias("v"))
        .unionAll(e0.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )


def _oriented_triangles(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Shared compact-forward triangle enumeration: (u, v, w) rows, one
    per triangle, in (degree, id) orientation order — consumed by
    ``triangle_counts`` (per-vertex) and ``edge_support`` (per-edge).
    Always normalizes the input to an undirected simple edge SET first;
    the peeling operators (ktruss_peel, edge_trussness) enumerate ONCE
    and never re-enter here, so no skip-normalization path is needed."""
    # e0 feeds the degree agg AND both degree joins — checkpoint it so the
    # upstream edge pipeline (for g9: the whole MinHash band join) runs
    # once, not once per reference
    e0 = _normalized_edges(edges, src, dst)
    return _oriented_triangles_from(e0, _edge_degrees(e0))


def _oriented_triangles_from(e0: DataFrame, deg: DataFrame) -> DataFrame:
    """Enumeration over a pre-normalized edge set and its degree relation
    (g10 shares both with its coefficient normalization instead of
    recomputing them from the raw edges)."""
    da = deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da")
    db = deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db")
    # orientation: u = lower (degree, id) endpoint; carry the out-side
    # (degree, id) key so wedge generation can order the two spokes.
    # deg is vertex-sized: size-gate it (plans/hints.py) — broadcast keeps
    # e0 in place entirely at demo scale; 2·|e0| (a cached-scan count)
    # upper-bounds the vertex set
    n_vertex_bound = 2 * e0.count()
    keyed = e0.join(evolving_hint(da, n_vertex_bound), "a").join(
        evolving_hint(db, n_vertex_bound), "b"
    )
    fwd = F.struct(F.col("da").alias("d"), F.col("a").alias("i")) < F.struct(
        F.col("db").alias("d"), F.col("b").alias("i")
    )
    # the oriented edge relation feeds THREE consumers (both wedge sides +
    # the closure); checkpoint it or the full upstream pipeline (for g9:
    # the entire MinHash signature + band join) re-executes per consumer —
    # measured 5.4 s → 1.9 s at sf0.1. Pinned on u, the wedge self-join
    # reads both sides exchange-free.
    oriented = checkpoint_partitioned(
        keyed.select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
        ),
        "u",
    )
    x = oriented.alias("x")
    y = oriented.alias("y")
    wedges = x.join(y.hint("shuffle_hash"), F.col("x.u") == F.col("y.u")).filter(
        F.struct(F.col("x.dv").alias("d"), F.col("x.v").alias("i"))
        < F.struct(F.col("y.dv").alias("d"), F.col("y.v").alias("i"))
    ).select(
        F.col("x.u").alias("u"), F.col("x.v").alias("v"), F.col("y.v").alias("w")
    )
    closing = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    )
    return wedges.join(closing.hint("shuffle_hash"), ["v", "w"])


def edge_support(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id_a, id_b, support) — per-EDGE triangle participation over the
    undirected simple graph: how many triangles contain each edge. This
    is the k-truss primitive (Cohen 2008): a k-truss is the maximal
    subgraph whose every edge has support >= k-2, and the peeling loop
    that computes it just re-evaluates this relation — one support pass
    per round, exactly like g6's k-core degree peeling. On a dedup
    candidate graph, support separates STRUCTURAL near-dup clusters
    (edges embedded in many closed triangles) from chance band
    collisions (support-0 edges, absent here), a sharper signal than
    either endpoint's triangle count alone.

    Same enumeration kernel as ``triangle_counts`` (compact-forward with
    degree orientation — O(m^1.5) wedge bound; see that docstring): each
    enumerated triangle (u, v, w) credits its THREE edges, re-normalized
    to (least, greatest) form since orientation order is (degree, id),
    not id. One extra map-side-combinable groupBy over 3x|triangles|
    two-long rows is the whole cost over the vertex form. Edges in no
    triangle don't appear (support 0 by omission).

    Contract (harnessed): NULL-endpoint edges and self-loops are dropped;
    multi-edges count once (the edge relation is a SET)."""
    tri = _oriented_triangles(edges, src, dst)
    e3 = (
        tri.select(F.col("u").alias("x"), F.col("v").alias("y"))
        .unionAll(tri.select(F.col("u").alias("x"), F.col("w").alias("y")))
        .unionAll(tri.select(F.col("v").alias("x"), F.col("w").alias("y")))
        .select(
            F.least("x", "y").alias("id_a"), F.greatest("x", "y").alias("id_b")
        )
    )
    return e3.groupBy("id_a", "id_b").agg(
        F.count("*").cast("bigint").alias("support")
    )


def ktruss_peel(
    edges: DataFrame,
    k: int,
    rounds: int | None = 2,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """(id_a, id_b, support) — ``rounds`` rounds of k-truss support
    peeling (Cohen 2008) over the undirected simple graph, then the
    per-edge support of the surviving subgraph: each round recomputes
    edge support on the current edge set and keeps edges with
    support >= k-2 (edges in no triangle have support 0 and are
    dropped). This is g6's k-core degree-peel pattern lifted from
    vertices to edges — the densest-subgraph tier for the reference's
    address graph (schema.cql:36-38,60-62: transaction/trace edge
    lists), and on a dedup candidate graph the k-truss isolates the
    structurally-confirmed duplicate clusters from chains of chance
    band collisions.

    Fixed ``rounds`` (the g4/g6 unrolled-iteration convention) keeps
    the SQL oracle expressible; ``rounds=None`` iterates to the TRUE
    k-truss fixpoint (no edge below the support floor remains) — the
    same per-round plan driven by connected_components-style driver
    looping on a 1-row convergence probe, capped by ``max_rounds``.
    Exhausting the cap before convergence raises ValueError rather
    than silently returning a non-fixpoint relation.

    ENUMERATE ONCE, PEEL ON INCIDENCE: triangles of an edge-induced
    subgraph are exactly the parent's triangles whose three edges all
    survive, so the compact-forward enumeration (the O(m^1.5) pass —
    see triangle_counts) runs ONCE; every peel round then works on the
    (triangle -> 3 normalized edges) incidence relation: one
    map-side-combinable support count, a filter for the round's DEAD
    edges (support < k-2), and three size-gated anti-joins removing
    the triangles any dead edge kills. A naive re-enumeration per
    round re-pays degree aggregation, orientation, the wedge
    self-join, and two checkpoints every round — measured 7.2 s vs
    3 s at sf0.1 for rounds=2. The dead relation is edge-bounded
    (<= 3|tri|), so the anti-joins ride ``evolving_hint``: broadcast
    (map-only round) while it fits, shuffle_hash at scale. Support
    only ever DECREASES under edge removal (monotone), so survivor
    sets shrink and the iteration converges. ``k < 3`` is rejected
    because support-0 edges are representable only by omission."""
    if k < 3:
        raise ValueError(
            "k-truss needs k >= 3: support-0 edges (kept by any k <= 2) "
            "are represented by omission in the support relation"
        )
    if rounds is not None and rounds < 1:
        raise ValueError("ktruss_peel needs rounds >= 1 (or None for fixpoint)")
    tri = _oriented_triangles(edges, src, dst)
    # one row per triangle, its three edges pre-normalized to
    # (least, greatest) once — every round reads these columns
    t = tri.select(
        F.least("u", "v").alias("a1"), F.greatest("u", "v").alias("b1"),
        F.least("u", "w").alias("a2"), F.greatest("u", "w").alias("b2"),
        F.least("v", "w").alias("a3"), F.greatest("v", "w").alias("b3"),
    ).localCheckpoint(eager=True)
    # upper bound on |edges represented in t| (and so on any dead set),
    # measured once on the checkpointed relation
    edge_bound = 3 * t.count()

    def support_of(t_rel: DataFrame) -> DataFrame:
        e3 = (
            t_rel.select(F.col("a1").alias("id_a"), F.col("b1").alias("id_b"))
            .unionAll(t_rel.select(F.col("a2"), F.col("b2")))
            .unionAll(t_rel.select(F.col("a3"), F.col("b3")))
        )
        return e3.groupBy("id_a", "id_b").agg(
            F.count("*").cast("bigint").alias("support")
        )

    # rounds=None -> iterate to the TRUE k-truss fixpoint (no removable
    # edge left), g6's full-variant convention: the per-round plan is
    # identical, only the stop condition changes — one 1-row emptiness
    # probe per round over the just-checkpointed dead set. max_rounds is
    # a safety cap: support peeling removes >= 1 edge per non-final
    # round, so convergence needs <= |edges-in-triangles| rounds — long
    # cascades (chains of triangles) CAN exceed a small cap, and a
    # capped exit would silently return a non-fixpoint relation under a
    # signature that promises the fixpoint. Fixpoint mode therefore
    # verifies convergence after the loop (one extra 1-row probe, only
    # when the cap was exhausted) and raises instead of lying — the
    # edge_trussness k_max convention.
    n_rounds = max_rounds if rounds is None else rounds
    converged = rounds is not None  # bounded mode never claims fixpoint
    for _ in range(n_rounds):
        dead = (
            support_of(t)
            .filter(F.col("support") < k - 2)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)  # three consumers below
        )
        if rounds is None and dead.limit(1).count() == 0:
            converged = True
            break  # fixpoint: every surviving edge has support >= k-2
        for a, b in (("a1", "b1"), ("a2", "b2"), ("a3", "b3")):
            t = t.join(
                evolving_hint(
                    dead.select(F.col("id_a").alias(a), F.col("id_b").alias(b)),
                    edge_bound,
                ),
                [a, b],
                "left_anti",
            )
        t = t.localCheckpoint(eager=True)  # flatten round lineage
    if not converged:
        # the cap ran out with removals still pending in every observed
        # round — probe the CURRENT relation once: the last round's
        # removals may themselves have landed exactly on the fixpoint
        still_dead = (
            support_of(t).filter(F.col("support") < k - 2).limit(1).count()
        )
        if still_dead:
            raise ValueError(
                f"ktruss_peel(k={k}, rounds=None) did not reach the "
                f"fixpoint within max_rounds={max_rounds} — raise "
                "max_rounds (long peel cascades need more rounds)"
            )
    return support_of(t)


def edge_trussness(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k_max: int = 64,
    rounds_per_level: int | None = None,
    truncate: bool = False,
) -> DataFrame:
    """(id_a, id_b, trussness) — the full truss DECOMPOSITION: for every
    edge in at least one triangle, the maximum k such that the edge
    belongs to the k-truss (Cohen 2008; trussness >= 3 by construction —
    triangle-free edges have trussness 2 and are omitted, matching
    edge_support's support-0-by-omission convention).

    Algorithm: ktruss_peel's enumerate-once incidence design driven to
    ascending fixpoints — the triangle relation is enumerated ONCE; for
    k = 3, 4, ... the surviving incidence relation is peeled to the
    k-truss fixpoint, and the edges that drop between the (k)- and
    (k+1)-fixpoints are assigned trussness k. Each level REUSES the
    previous level's surviving triangles (the k-truss is nested in the
    (k-1)-truss), so total work is one enumeration plus one fixpoint
    chain — the standard ascending-peel decomposition, with each round
    the same support-aggregate + three size-gated anti-joins as
    ktruss_peel. Driver traffic is one 1-row probe per peel round and
    one survivor-set diff per level; ``k_max`` caps the ascent (64 >>
    any real corpus's max support floor; the loop exits as soon as the
    triangle relation empties).

    Scale posture: identical to ktruss_peel per round; the number of
    levels is bounded by the graph's max trussness, a data property
    independent of corpus SIZE for bounded-density graphs (the address
    graph / dedup-cluster case).

    ``rounds_per_level`` bounds each level's peel to a FIXED number of
    rounds instead of the fixpoint — ktruss_peel's g4/g6 unrolled-
    iteration convention lifted to the decomposition, which keeps the
    SQL oracle expressible (each level is rounds_per_level chained
    support blocks; g14). A level whose peel converges earlier is
    identical under both modes; when it doesn't, later-dying edges
    carry one level further — a deterministic, documented staged-peel
    semantics, not an approximation of it. ``truncate=True`` reports
    the edges still alive after the ``k_max`` level as trussness
    ``k_max`` (the truncated decomposition min(trussness, k_max))
    instead of raising — the bounded-unroll companion, since a fixed
    SQL unroll cannot chase an unbounded ascent."""
    if rounds_per_level is not None and rounds_per_level < 1:
        # 0 would run zero peel rounds per level: with truncate every
        # triangle edge reports trussness k_max, without it the loop
        # raises a misleading did-not-converge error
        raise ValueError(
            f"rounds_per_level must be >= 1 or None, got {rounds_per_level}"
        )
    tri = _oriented_triangles(edges, src, dst)
    t = tri.select(
        F.least("u", "v").alias("a1"), F.greatest("u", "v").alias("b1"),
        F.least("u", "w").alias("a2"), F.greatest("u", "w").alias("b2"),
        F.least("v", "w").alias("a3"), F.greatest("v", "w").alias("b3"),
    ).localCheckpoint(eager=True)
    edge_bound = 3 * t.count()

    def support_of(t_rel: DataFrame) -> DataFrame:
        e3 = (
            t_rel.select(F.col("a1").alias("id_a"), F.col("b1").alias("id_b"))
            .unionAll(t_rel.select(F.col("a2"), F.col("b2")))
            .unionAll(t_rel.select(F.col("a3"), F.col("b3")))
        )
        return e3.groupBy("id_a", "id_b").agg(
            F.count("*").cast("bigint").alias("support")
        )

    spark = edges.sparkSession
    out = spark.createDataFrame([], "id_a bigint, id_b bigint, trussness bigint")

    # ONE support aggregate per incidence state, shared across its
    # consumers: the level-(k) survivor set and the level-(k+1) round-1
    # dead probe both read the SAME unchanged relation, so `sup` is
    # recomputed only after anti-joins actually remove triangles —
    # exactly one aggregation per REMOVING round plus the base, the
    # same count as g14's unrolled SQL oracle (a naive per-use
    # recomputation paid ~2x that: 8.2 -> ~5 s at sf0.1).
    #
    # r13 probe fusion: min(support) and the edge count ride the
    # checkpoint pass itself as observe() metrics, so the per-round
    # dead-emptiness probe and the per-level survivor-emptiness probe
    # are driver-side scalar comparisons — zero extra Spark jobs. A
    # level whose floor never reaches the current k's threshold is
    # skipped outright (its dead set is provably empty), which also
    # skips the no-op survivor diff that level would otherwise union.
    def support_ck(t_rel: DataFrame):
        obs = Observation()
        s = (
            support_of(t_rel)
            .observe(
                obs,
                F.min("support").alias("_min_sup"),
                F.count(F.lit(1)).alias("_n_edges"),
            )
            .localCheckpoint(eager=True)
        )
        m = obs.get
        return s, m["_min_sup"], m["_n_edges"]

    sup, min_sup, n_edges = support_ck(t)
    prev_edges = sup.select("id_a", "id_b")
    for k in range(3, k_max + 1):
        # peel t to this level's fixpoint (or rounds_per_level rounds —
        # a converged level breaks early either way, so bounded mode
        # only diverges on levels whose cascade outruns the bound)
        done_rounds = 0
        removed = False
        while rounds_per_level is None or done_rounds < rounds_per_level:
            done_rounds += 1
            # dead = sup.filter(support < k-2) is empty iff the observed
            # support floor already meets the threshold — no probe job
            if n_edges == 0 or min_sup >= k - 2:
                break
            # cheap derivation off the checkpointed aggregate (its three
            # anti-join consumers re-filter in-memory blocks, no shuffle)
            dead = sup.filter(F.col("support") < k - 2).select("id_a", "id_b")
            for a, b in (("a1", "b1"), ("a2", "b2"), ("a3", "b3")):
                t = t.join(
                    evolving_hint(
                        dead.select(
                            F.col("id_a").alias(a), F.col("id_b").alias(b)
                        ),
                        edge_bound,
                    ),
                    [a, b],
                    "left_anti",
                )
            # ALWAYS flatten t after removals: support_of unions three
            # projections of t, so a lazy t re-executes the growing
            # anti-join chain three times per aggregation — measured
            # interleaved 7.1-7.6 s lazy vs 5.7-5.9 s eager at sf0.1
            # (the barrier costs less than the tripled recompute)
            t = t.localCheckpoint(eager=True)
            sup, min_sup, n_edges = support_ck(t)
            removed = True
        survivors = sup.select("id_a", "id_b")
        # edges alive in the (k-1)-fixpoint but not the k-fixpoint peel
        # final at this level: trussness = k - 1 ... except at k=3 the
        # pre-peel baseline is "in a triangle at all", whose dropouts are
        # trussness-2 edges — omitted by convention, not emitted. A level
        # that removed nothing has survivors == prev_edges, so its diff
        # is empty by construction and the union is skipped.
        if removed:
            if k > 3:
                dropped = prev_edges.join(
                    evolving_hint(survivors, edge_bound),
                    ["id_a", "id_b"],
                    "left_anti",
                )
                out = out.unionByName(
                    dropped.withColumn(
                        "trussness", F.lit(k - 1).cast("bigint")
                    )
                )
            prev_edges = survivors
        if n_edges == 0:
            break
    else:
        if truncate:
            # truncated decomposition: the k_max-level survivors have
            # trussness >= k_max — report the cap, never raise
            out = out.unionByName(
                prev_edges.withColumn(
                    "trussness", F.lit(k_max).cast("bigint")
                )
            )
        else:
            raise ValueError(
                f"edge_trussness did not converge within k_max={k_max} "
                "levels — raise k_max (max trussness exceeds it)"
            )
    return out
