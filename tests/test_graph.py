"""Connected-components unit tests (the oracle query cc1 covers the
integrated dedup-clustering path; these pin the operator's semantics)."""

from __future__ import annotations

import math

import pytest

from graphsense_ethereum_etl_spark.operators.graph import (
    _star_components,
    connected_components,
)


@pytest.mark.parametrize("algorithm", ["label", "star"])
def test_chain_and_island(spark, algorithm):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src bigint, dst bigint"
    )
    out = {
        r["id"]: r["component"]
        for r in connected_components(edges, algorithm=algorithm).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


@pytest.mark.parametrize("algorithm", ["label", "star"])
def test_direction_independence(spark, algorithm):
    edges = spark.createDataFrame([(5, 2), (2, 9)], "src bigint, dst bigint")
    out = {
        r["id"]: r["component"]
        for r in connected_components(edges, algorithm=algorithm).collect()
    }
    assert out == {2: 2, 5: 2, 9: 2}


def test_star_matches_label_on_random_graph(spark):
    # deterministic pseudo-random edge soup: mixed components, repeated
    # edges, both directions
    edges = spark.createDataFrame(
        [((i * 37) % 60, (i * 53 + 11) % 60) for i in range(80)],
        "src bigint, dst bigint",
    )
    label = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    star = {
        r["id"]: r["component"]
        for r in connected_components(edges, algorithm="star").collect()
    }
    assert star == label


def test_star_converges_logarithmically_on_chain(spark):
    """The adversarial case for label propagation: a path graph of n nodes
    has diameter n-1, so min-label needs ~n rounds; large-star/small-star
    must finish in O(log n)."""
    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    labels, rounds = _star_components(edges, "src", "dst", max_iter=50)
    out = {r["id"]: r["component"] for r in labels.collect()}
    assert out == {i: 0 for i in range(n)}
    # generous constant over ceil(log2(200)) ≈ 7.6 — far below diameter 199
    assert rounds <= 3 * math.ceil(math.log2(n))


def test_bipartite_project_degree_cap_bounds_planted_hub(spark):
    """VERDICT r5 item 4: a planted high-degree right vertex must be
    EXCLUDED by degree_cap, bounding the pair count — without the cap a
    degree-d hub emits d(d-1)/2 pairs."""
    from graphsense_ethereum_etl_spark.operators.graph import (
        bipartite_project,
    )

    hub_degree = 200
    rows = [(s, 0) for s in range(hub_degree)]       # hub part 0
    rows += [(1, 1), (2, 1), (1, 2), (2, 2), (3, 2)]  # normal parts
    edges = spark.createDataFrame(rows, "s bigint, p bigint")

    capped = bipartite_project(edges, degree_cap=10)
    got = {(r["s1"], r["s2"]): r["shared"] for r in capped.collect()}
    # only the normal parts contribute: (1,2) share parts 1 and 2;
    # (1,3) and (2,3) share part 2
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}

    uncapped = bipartite_project(edges, degree_cap=None)
    assert uncapped.count() == hub_degree * (hub_degree - 1) // 2


def test_bipartite_project_dedups_multi_edges(spark):
    from graphsense_ethereum_etl_spark.operators.graph import (
        bipartite_project,
    )

    edges = spark.createDataFrame(
        [(1, 7), (1, 7), (2, 7), (2, 7)], "s bigint, p bigint"
    )
    got = bipartite_project(edges).collect()
    assert len(got) == 1
    assert got[0]["shared"] == 1  # multi-edge never inflates the weight


def test_bipartite_project_preserves_string_vertex_ids(spark):
    """r7 (ADVICE): hex-address string ids — this repo's core vertex
    domain — must survive the projection. The pre-r7 unconditional bigint
    cast turned them into NULL join keys and silently dropped every edge;
    NULL vertices are now dropped explicitly, non-NULL types preserved."""
    from graphsense_ethereum_etl_spark.operators.graph import (
        bipartite_project,
    )

    edges = spark.createDataFrame(
        [
            ("0xaa", "0x01"),
            ("0xbb", "0x01"),
            ("0xaa", "0x02"),
            ("0xbb", "0x02"),
            ("0xcc", "0x02"),
            (None, "0x02"),   # NULL vertex: dropped, never a pair
            ("0xdd", None),
        ],
        "s string, p string",
    )
    out = bipartite_project(edges)
    assert dict(out.dtypes) == {"s1": "string", "s2": "string", "shared": "bigint"}
    got = {(r["s1"], r["s2"]): r["shared"] for r in out.collect()}
    assert got == {
        ("0xaa", "0xbb"): 2,
        ("0xaa", "0xcc"): 1,
        ("0xbb", "0xcc"): 1,
    }


def _lpa_reference(edges, rounds=2):
    """Plain-Python synchronous LPA: mode neighbour label, smallest-label
    tie-break, simultaneous update — the operator's documented contract."""
    from collections import Counter

    ok = [(s, d) for s, d in edges if s is not None and d is not None]
    verts = sorted({v for e in ok for v in e})
    nbrs = {v: set() for v in verts}
    for s, d in ok:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    label = {v: v for v in verts}
    for _ in range(rounds):
        new = {}
        for v in verts:
            if not nbrs[v]:
                new[v] = label[v]
                continue
            cnt = Counter(label[n] for n in nbrs[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        label = new
    return label


def test_label_propagation_matches_python_reference(spark):
    """Two planted communities joined by one bridge edge: LPA must keep
    them separate where min-label CC would merge everything. Checked
    against the plain-Python reference on the exact contract, including
    self-loop-only vertices (keep own label) and NULL-endpoint drops."""
    from graphsense_ethereum_etl_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    import itertools

    # two 4-cliques joined by one bridge: dense enough that the in-clique
    # mode beats the bridge label (a triangle is NOT — the round-1 all-tie
    # lets the bridge label leak in)
    clique_a = list(itertools.combinations([1, 2, 3, 4], 2))
    clique_b = list(itertools.combinations([10, 11, 12, 13], 2))
    edges = (
        clique_a + clique_b
        + [
            (4, 10),        # bridge
            (20, 20),       # self-loop-only vertex: appears, keeps own label
            (None, 1), (2, None),  # NULL endpoints: dropped entirely
            (1, 2),         # multi-edge (counts once)
        ]
    )
    df = spark.createDataFrame(
        [e for e in edges], "src bigint, dst bigint"
    )
    for rounds in (1, 2, 4):
        got = {
            r["id"]: r["community"]
            for r in label_propagation(df, rounds=rounds).collect()
        }
        want = _lpa_reference(edges, rounds=rounds)
        assert got == want, f"rounds={rounds}"
    # the communities stay distinct across the bridge (CC would merge them)
    two = _lpa_reference(edges, rounds=2)
    assert two[1] == two[2] == two[3] == two[4] == 1
    assert two[10] == two[11] == two[12] == two[13] == 10
    assert two[20] == 20
    cc = {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert cc[13] == 1  # min-label flooding crosses the bridge


def test_label_propagation_empty_and_dense(spark):
    from graphsense_ethereum_etl_spark.operators.graph import label_propagation

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    assert label_propagation(empty).count() == 0
    # random-ish dense graph vs reference (regression net for argmax ties)
    edges = [((i * 7) % 13, (i * 11 + 3) % 13) for i in range(40)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["id"]: r["community"] for r in label_propagation(df, rounds=3).collect()
    }
    assert got == _lpa_reference(edges, rounds=3)


def test_triangle_counts_matches_bruteforce_on_random_graphs(spark):
    """Compact-forward with degree orientation vs itertools brute force on
    random multigraphs (duplicate edges, both orientations, self-loops):
    per-vertex counts must match exactly — the orientation argument says
    each triangle is counted once, this checks it."""
    import itertools
    import random

    from graphsense_ethereum_etl_spark.operators.graph import triangle_counts

    for seed in range(5):
        rng = random.Random(seed)
        n = rng.randint(5, 14)
        raw = [
            (rng.randint(0, n - 1), rng.randint(0, n - 1))
            for _ in range(rng.randint(5, 45))
        ]
        simple = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
        adj = {v: set() for e in simple for v in e}
        for a, b in simple:
            adj[a].add(b)
            adj[b].add(a)
        want: dict[int, int] = {}
        for x, y, z in itertools.combinations(sorted(adj), 3):
            if y in adj[x] and z in adj[x] and z in adj[y]:
                for v in (x, y, z):
                    want[v] = want.get(v, 0) + 1
        df = spark.createDataFrame(raw, "src bigint, dst bigint")
        got = {
            r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()
        }
        assert got == want, f"seed {seed}: {got} vs {want}"


def test_edge_support_matches_bruteforce_on_random_graphs(spark):
    """edge_support (the k-truss primitive) vs itertools brute force on
    random multigraphs: per-edge triangle membership must match exactly,
    edges in no triangle absent."""
    import itertools
    import random

    from graphsense_ethereum_etl_spark.operators.graph import edge_support

    for seed in range(5):
        rng = random.Random(1000 + seed)
        n = rng.randint(5, 14)
        raw = [
            (rng.randint(0, n - 1), rng.randint(0, n - 1))
            for _ in range(rng.randint(5, 45))
        ]
        simple = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
        adj = {v: set() for e in simple for v in e}
        for a, b in simple:
            adj[a].add(b)
            adj[b].add(a)
        want: dict[tuple[int, int], int] = {}
        for x, y, z in itertools.combinations(sorted(adj), 3):
            if y in adj[x] and z in adj[x] and z in adj[y]:
                for e in ((x, y), (x, z), (y, z)):
                    want[e] = want.get(e, 0) + 1
        df = spark.createDataFrame(raw, "src bigint, dst bigint")
        got = {
            (r["id_a"], r["id_b"]): r["support"]
            for r in edge_support(df).collect()
        }
        assert got == want, f"seed {seed}: {got} vs {want}"


def test_ktruss_peel_matches_bruteforce_on_random_graphs(spark):
    """ktruss_peel vs an independent pure-Python peel over random
    multigraphs (with self-loops/dupes the operator must drop): after
    ``rounds`` support-peels, the surviving subgraph's per-edge support
    must match exactly — including graphs where round 2 CASCADES."""
    import random

    from graphsense_ethereum_etl_spark.operators.graph import ktruss_peel

    def py_support(edges):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {e: len(adj[e[0]] & adj[e[1]]) for e in edges}

    def py_truss(edges, k, rounds):
        e = set(edges)
        for _ in range(rounds):
            s = py_support(e)
            e = {ed for ed in e if s[ed] >= k - 2}
        return {ed: s2 for ed, s2 in py_support(e).items() if s2 > 0}

    for seed in range(5):
        rng = random.Random(2000 + seed)
        n = rng.randint(6, 13)
        raw = [
            (rng.randint(0, n - 1), rng.randint(0, n - 1))
            for _ in range(rng.randint(12, 60))
        ]
        simple = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
        for k, rounds in ((3, 1), (3, 2), (4, 2)):
            want = py_truss(simple, k, rounds)
            df = spark.createDataFrame(raw, "src bigint, dst bigint")
            got = {
                (r["id_a"], r["id_b"]): r["support"]
                for r in ktruss_peel(df, k=k, rounds=rounds).collect()
            }
            assert got == want, (seed, k, rounds, got, want)


def test_ktruss_peel_rejects_bad_params(spark):
    import pytest

    from graphsense_ethereum_etl_spark.operators.graph import ktruss_peel

    df = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="k >= 3"):
        ktruss_peel(df, k=2)
    with pytest.raises(ValueError, match="rounds >= 1"):
        ktruss_peel(df, k=3, rounds=0)


def test_ktruss_fixpoint_matches_python_fixpoint(spark):
    """rounds=None iterates to the TRUE k-truss (no removable edge
    left) — compared against a pure-Python peel-to-fixpoint, on graphs
    where 2 fixed rounds are NOT yet converged."""
    import random

    from graphsense_ethereum_etl_spark.operators.graph import ktruss_peel

    def py_support(edges):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {e: len(adj[e[0]] & adj[e[1]]) for e in edges}

    def py_fixpoint(edges, k):
        e = set(edges)
        while True:
            s = py_support(e)
            keep = {ed for ed in e if s[ed] >= k - 2}
            if keep == e:
                return {ed: c for ed, c in s.items() if c > 0}
            e = keep

    checked_nontrivial = False
    for seed in range(4):
        rng = random.Random(3000 + seed)
        n = rng.randint(8, 14)
        raw = [
            (rng.randint(0, n - 1), rng.randint(0, n - 1))
            for _ in range(rng.randint(20, 70))
        ]
        simple = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
        for k in (3, 4):
            want = py_fixpoint(simple, k)
            df = spark.createDataFrame(raw, "src bigint, dst bigint")
            got = {
                (r["id_a"], r["id_b"]): r["support"]
                for r in ktruss_peel(df, k=k, rounds=None).collect()
            }
            assert got == want, (seed, k, got, want)
            checked_nontrivial = checked_nontrivial or bool(want)
    assert checked_nontrivial  # at least one non-empty truss exercised


def test_edge_trussness_matches_python_decomposition(spark):
    """edge_trussness vs a pure-Python ascending-fixpoint decomposition:
    every in-triangle edge gets max{k : edge in k-truss}; trussness-2
    (triangle-free) edges omitted."""
    import random

    from graphsense_ethereum_etl_spark.operators.graph import edge_trussness

    def support(e):
        adj = {}
        for a, b in e:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {ed: len(adj[ed[0]] & adj[ed[1]]) for ed in e}

    def py_trussness(simple):
        out = {}
        cur = set(simple)
        prev = None
        k = 3
        while True:
            while True:
                s = support(cur)
                keep = {ed for ed in cur if s[ed] >= k - 2}
                if keep == cur:
                    break
                cur = keep
            if prev is not None:
                for ed in prev - cur:
                    out[ed] = k - 1
            prev = cur
            if not cur:
                return out
            k += 1

    for seed in range(4):
        rng = random.Random(4000 + seed)
        n = rng.randint(6, 12)
        raw = [
            (rng.randint(0, n - 1), rng.randint(0, n - 1))
            for _ in range(rng.randint(15, 66))
        ]
        simple = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
        want = py_trussness(simple)
        df = spark.createDataFrame(raw, "src bigint, dst bigint")
        got = {
            (r["id_a"], r["id_b"]): r["trussness"]
            for r in edge_trussness(df).collect()
        }
        assert got == want, (seed, got, want)
        if want:
            assert min(want.values()) >= 3


def test_ktruss_fixpoint_cap_exhaustion_raises(spark):
    """A max_rounds cap exhausted BEFORE convergence must raise, not
    silently return a non-fixpoint relation under a signature that
    promises the fixpoint (r11 ADVICE #1). The graph is a searched
    37-edge cascade whose k=4 parallel peel needs 7 rounds; the same
    call with the default cap converges fine. A cap that lands exactly
    ON the fixpoint (cascade depth == max_rounds) must NOT raise —
    the post-loop probe distinguishes 'ran out' from 'just finished'."""
    import pytest as _pytest

    from graphsense_ethereum_etl_spark.operators.graph import ktruss_peel

    cascade = [
        (0, 2), (0, 3), (0, 5), (0, 8), (0, 9), (0, 10), (1, 2), (1, 3),
        (1, 6), (1, 12), (2, 7), (2, 9), (2, 11), (3, 5), (3, 7), (3, 8),
        (3, 9), (3, 10), (3, 11), (4, 6), (4, 7), (4, 10), (4, 11), (5, 7),
        (5, 9), (5, 11), (5, 12), (6, 7), (6, 9), (6, 10), (6, 11), (6, 12),
        (7, 9), (8, 10), (9, 12), (10, 11), (11, 12),
    ]
    df = spark.createDataFrame(cascade, "src bigint, dst bigint")
    with _pytest.raises(ValueError, match="did not reach the fixpoint"):
        ktruss_peel(df, k=4, rounds=None, max_rounds=2)
    # exactly-at-depth cap: 7 removal rounds reach the fixpoint; the
    # 7-round cap exhausts the loop but the final probe finds no dead
    # edge, so no raise — and the result matches the uncapped run
    capped = {
        (r["id_a"], r["id_b"]): r["support"]
        for r in ktruss_peel(df, k=4, rounds=None, max_rounds=7).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["support"]
        for r in ktruss_peel(df, k=4, rounds=None).collect()
    }
    assert capped == full
    # bounded mode never claims the fixpoint: same tiny cap, no raise
    assert ktruss_peel(df, k=4, rounds=2).count() >= 0


def test_edge_trussness_bounded_and_truncated_modes(spark):
    """g14's registered semantics: rounds_per_level bounds each level's
    peel (the g4/g6 fixed-iteration convention — SQL-oracle
    expressible), truncate=True reports k_max-level survivors at the
    cap instead of raising. Checked against a pure-Python staged peel;
    fixpoint+truncate must equal min(full trussness, k_max)."""
    import random

    from graphsense_ethereum_etl_spark.operators.graph import edge_trussness

    def support(e):
        adj = {}
        for a, b in e:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {ed: len(adj[ed[0]] & adj[ed[1]]) for ed in e}

    def py_staged(simple, k_max, rounds):
        # mirror the operator: relation = edges in >= 1 triangle; each
        # round drops sub-threshold edges, then support-0 edges vanish
        # from the relation (the support_of omission convention)
        s = support(simple)
        cur = {ed for ed in simple if s[ed] > 0}
        prev, out = set(cur), {}
        for k in range(3, k_max + 1):
            for _ in range(rounds):
                s = support(cur)
                dead = {ed for ed in cur if s[ed] < k - 2}
                if not dead:
                    break
                cur -= dead
                s2 = support(cur)
                cur = {ed for ed in cur if s2[ed] > 0}
            surv = set(cur)
            if k > 3:
                for ed in prev - surv:
                    out[ed] = k - 1
            prev = surv
            if not surv:
                return out
        for ed in prev:
            out[ed] = k_max  # truncated: trussness >= k_max reports cap
        return out

    def py_full(simple):
        out, cur, prev, k = {}, set(simple), None, 3
        while True:
            while True:
                s = support(cur)
                keep = {ed for ed in cur if s[ed] >= k - 2}
                if keep == cur:
                    break
                cur = keep
            if prev is not None:
                for ed in prev - cur:
                    out[ed] = k - 1
            prev = cur
            if not cur:
                return out
            k += 1

    checked = False
    for seed in range(4):
        rng = random.Random(5000 + seed)
        n = rng.randint(6, 12)
        raw = [
            (rng.randint(0, n - 1), rng.randint(0, n - 1))
            for _ in range(rng.randint(15, 66))
        ]
        simple = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
        df = spark.createDataFrame(raw, "src bigint, dst bigint")
        for k_max, rounds in ((4, 1), (5, 2)):
            want = py_staged(simple, k_max, rounds)
            got = {
                (r["id_a"], r["id_b"]): r["trussness"]
                for r in edge_trussness(
                    df, k_max=k_max, rounds_per_level=rounds, truncate=True
                ).collect()
            }
            assert got == want, (seed, k_max, rounds, got, want)
            checked = checked or bool(want)
        # fixpoint peel + truncation == min(full trussness, k_max)
        full = py_full(simple)
        capped = {ed: min(t, 4) for ed, t in full.items()}
        got = {
            (r["id_a"], r["id_b"]): r["trussness"]
            for r in edge_trussness(df, k_max=4, truncate=True).collect()
        }
        assert got == capped, (seed, got, capped)
    assert checked
    # r12 ADVICE #2: rounds_per_level=0 would run zero peel rounds per
    # level (truncate: everything reports k_max; else a misleading
    # did-not-converge raise) — reject it up front like merges<0
    for bad in (0, -1):
        with pytest.raises(ValueError, match="rounds_per_level"):
            edge_trussness(df, rounds_per_level=bad)
