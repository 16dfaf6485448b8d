"""Property-based tests (hypothesis) for the codec-like scalar operators
(SURVEY.md §5.3): hex round-trip, bucket monotonicity/boundaries, prefix
length, None-safety. Batched: hypothesis generates the corpus, one Spark job
checks all cases (per-example Spark jobs would be pathologically slow).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from graphsense_ethereum_etl_spark.functions.columns import (
    array_join_sep,
    block_bucket,
    hex_prefix,
    hex_to_bin,
    topic0_with_default,
)

hex_payload = st.text(alphabet="0123456789abcdef", max_size=64).filter(
    lambda s: len(s) % 2 == 0
)


@settings(max_examples=30, deadline=None)
@given(st.lists(hex_payload, min_size=1, max_size=20))
def test_hex_roundtrip(spark, payloads):
    df = spark.createDataFrame([(p, "0x" + p) for p in payloads], "raw string, h string")
    out = df.select("raw", F.lower(F.hex(hex_to_bin("h"))).alias("rt")).collect()
    for r in out:
        assert r["rt"] == r["raw"]


def test_hex_to_bin_none_and_empty(spark):
    df = spark.createDataFrame([(None,), ("0x",)], "h string")
    rows = df.select(hex_to_bin("h").alias("b")).collect()
    assert rows[0]["b"] is None
    assert bytes(rows[1]["b"]) == b""


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=50))
def test_bucket_floor_semantics(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "block_id long")
    rows = df.select("block_id", block_bucket("block_id").alias("g")).collect()
    for r in rows:
        assert r["g"] == r["block_id"] // 1000


def test_bucket_boundaries(spark):
    df = spark.createDataFrame([(0,), (999,), (1000,), (1001,)], "block_id long")
    got = dict((r["block_id"], r["g"]) for r in df.select("block_id", block_bucket("block_id").alias("g")).collect())
    assert got == {0: 0, 999: 0, 1000: 1, 1001: 1}


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="0123456789abcdef", min_size=10, max_size=64), min_size=1, max_size=20))
def test_prefix_length(spark, hashes):
    df = spark.createDataFrame([("0x" + h, h) for h in hashes], "h string, raw string")
    for r in df.select("raw", hex_prefix("h", 5).alias("p")).collect():
        assert r["p"] == r["raw"][:5]
        assert len(r["p"]) == 5


def test_array_join_none_safety(spark):
    df = spark.createDataFrame(
        [(1, [0, 2, 1]), (2, []), (3, None)], "id int, arr array<int>"
    )
    rows = {r["id"]: r["j"] for r in df.select("id", array_join_sep("arr", ",").alias("j")).collect()}
    assert rows == {1: "0,2,1", 2: "", 3: None}


def test_topic0_defaults(spark):
    df = spark.createDataFrame(
        [(1, ["0xaa"]), (2, []), (3, None)], "id int, topics array<string>"
    )
    cass = {r["id"]: r["t"] for r in df.select("id", topic0_with_default("topics", "0x").alias("t")).collect()}
    assert cass == {1: "0xaa", 2: "0x", 3: "0x"}
    csv = {r["id"]: r["t"] for r in df.select("id", topic0_with_default("topics", None).alias("t")).collect()}
    assert csv == {1: "0xaa", 2: None, 3: None}


@given(
    st.lists(
        st.integers(min_value=0, max_value=10**38 - 1), min_size=1, max_size=20
    )
)
@settings(max_examples=20, deadline=None)
def test_uint256_binary_roundtrip(spark, values):
    """§7.4.1 lossless companion: DECIMAL(38,0) → 32-byte big-endian binary
    → DECIMAL(38,0) is the identity over the full decimal range, and the
    encoding is exactly 32 bytes (what a CQL varint reader expects)."""
    from decimal import Decimal

    from graphsense_ethereum_etl_spark.functions.columns import (
        bin32_to_uint,
        uint_to_bin32,
    )

    df = spark.createDataFrame(
        [(Decimal(v),) for v in values], "v decimal(38,0)"
    )
    out = df.select(
        "v",
        uint_to_bin32("v").alias("b"),
        bin32_to_uint(uint_to_bin32("v")).alias("back"),
    ).collect()
    for r in out:
        assert len(r["b"]) == 32
        assert int.from_bytes(r["b"], "big") == int(r["v"])
        assert r["back"] == r["v"]


def test_uint256_binary_none_safe(spark):
    from graphsense_ethereum_etl_spark.functions.columns import uint_to_bin32

    df = spark.createDataFrame([(None,)], "v decimal(38,0)")
    assert df.select(uint_to_bin32("v").alias("b")).collect()[0]["b"] is None


def test_redact_pii_leaves_no_matches(spark):
    """After redaction, the Java-side output must contain no match of either
    pattern under PYTHON's regex engine (a third implementation agreeing is
    strong evidence the patterns are engine-portable), and placeholders must
    appear exactly where PII was present."""
    import re

    from graphsense_ethereum_etl_spark.functions.text import (
        EMAIL_RE,
        IPV4_RE,
        redact_pii,
    )

    cases = [
        "plain text no pii at all",
        "mail me at a.b-c_d%e+f@sub.domain.co today",
        "two emails x@y.io and z@w.org!",
        "ip 10.0.0.1 then 255.255.255.255 end",
        "email-with-ip-ish user10.0.0.1@host.com trailing 1.2.3.4",
        "(parens) <brackets@example.com> [1.2.3.4]",
        "borderline 999.999.999.999 and a@b.cd",
        "no-tld a@b fails, bare 1.2.3 fails",
        "",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, t string")
    out = {r["i"]: r["red"] for r in df.select("i", redact_pii("t").alias("red")).collect()}
    for i, case in enumerate(cases):
        red = out[i]
        assert not re.search(EMAIL_RE, red), (case, red)
        assert not re.search(IPV4_RE, red), (case, red)
        if re.search(EMAIL_RE, case):
            assert "<EMAIL>" in red
        if re.search(IPV4_RE, re.sub(EMAIL_RE, "<EMAIL>", case)):
            assert "<IP>" in red
        if not re.search(EMAIL_RE, case) and not re.search(IPV4_RE, case):
            assert red == case  # no false positives


def test_dup_shingle_ratio_bounds_and_values(spark):
    from graphsense_ethereum_etl_spark.functions.text import dup_shingle_ratio

    cases = {
        0: ("", 0.0),                      # empty
        1: ("one two", 0.0),               # shorter than k
        2: ("a b c d e", 0.0),             # all distinct 3-grams
        3: ("a b c a b c a b c", round(4 / 7, 6)),  # heavy repetition
        4: ("x x x x x x", round(3 / 4, 6)),        # degenerate loop
    }
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in cases.items()], "i long, t string"
    )
    got = {
        r["i"]: r["ratio"]
        for r in df.select("i", dup_shingle_ratio("t").alias("ratio")).collect()
    }
    for i, (_, want) in cases.items():
        assert got[i] == want, (i, got[i], want)
        assert 0.0 <= got[i] <= 1.0


def test_check_constraints_counts_planted_violations(spark):
    """Every rule kind counts its planted violations exactly; the whole
    report comes from one aggregation pass."""
    from graphsense_ethereum_etl_spark.operators.quality import (
        check_constraints,
    )

    df = spark.createDataFrame(
        [
            (1, "ok", 10, "A", "1-GOOD"),
            (2, None, 500, "B", "9-BAD"),   # null col, range, set, regex
            (2, "dup", 20, "A", "2-FINE"),  # duplicate key
            (None, "x", -5, "C", "3-OK"),   # null key, range, set
        ],
        "k bigint, s string, v bigint, cat string, fmt string",
    )
    rep = {
        (r["rule"], r["col"]): (r["n_violations"], r["passed"])
        for r in check_constraints(
            df,
            [
                {"rule": "not_null", "col": "s"},
                {"rule": "unique", "col": "k"},
                {"rule": "in_range", "col": "v", "lo": 0, "hi": 100},
                {"rule": "in_set", "col": "cat", "values": ["A", "B"]},
                {"rule": "matches", "col": "fmt", "pattern": "^[1-5]-"},
            ],
        ).collect()
    }
    assert rep[("not_null", "s")] == (1, False)
    # k: values 1,2,2,NULL -> n=4, distinct=2 -> 2 violations (dup + null)
    assert rep[("unique", "k")] == (2, False)
    assert rep[("in_range", "v")] == (2, False)
    assert rep[("in_set", "cat")] == (1, False)
    assert rep[("matches", "fmt")] == (1, False)


def test_check_constraints_clean_table_passes(spark):
    from graphsense_ethereum_etl_spark.operators.quality import (
        check_constraints,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, s string")
    rep = check_constraints(
        df,
        [{"rule": "unique", "col": "k"}, {"rule": "not_null", "col": "s"}],
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in rep)


def test_check_constraints_empty_rules_is_empty_report(spark):
    """ADVICE r5: an empty rule set returns an empty report with the full
    report schema instead of IndexError (the CLI validate path with an
    empty rules.json)."""
    from graphsense_ethereum_etl_spark.operators.quality import (
        check_constraints,
    )

    df = spark.createDataFrame([(1,)], "k bigint")
    rep = check_constraints(df, [])
    assert rep.columns == ["rule", "col", "n_rows", "n_violations", "passed"]
    assert rep.count() == 0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),   # left vertex
            st.integers(min_value=0, max_value=5),   # right vertex
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=6),           # degree cap
)
def test_bipartite_project_matches_bruteforce(spark, edges, cap):
    """bipartite_project == the brute-force one-mode projection computed in
    plain Python (dedup edges, drop right vertices with degree > cap, count
    shared neighbors per left pair)."""
    from collections import defaultdict
    from itertools import combinations

    from graphsense_ethereum_etl_spark.operators.graph import (
        bipartite_project,
    )

    dedup = sorted(set(edges))
    deg = defaultdict(set)
    for s, p in dedup:
        deg[p].add(s)
    expected = defaultdict(int)
    for p, members in deg.items():
        if len(members) > cap:
            continue
        for s1, s2 in combinations(sorted(members), 2):
            expected[(s1, s2)] += 1
    df = spark.createDataFrame(dedup, "s bigint, p bigint")
    got = {
        (r["s1"], r["s2"]): r["shared"]
        for r in bipartite_project(df, degree_cap=cap).collect()
    }
    assert got == dict(expected)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_bigram_commonness_matches_python_reference(spark, texts):
    """bigram_commonness == a plain-Python bigram model on the same corpus
    (pair counts, prefix counts, per-doc integer sums)."""
    from collections import Counter

    from graphsense_ethereum_etl_spark.operators.corpus import (
        bigram_commonness,
    )

    def toks(t):
        t = t.strip()
        return t.split() if t else [""]  # split('') yields [''] in Spark

    corpus_pairs = Counter()
    doc_pairs = {}
    for i, t in enumerate(texts):
        w = toks(t)
        ps = list(zip(w, w[1:]))
        doc_pairs[i] = ps
        corpus_pairs.update(ps)
    prefix = Counter()
    for (w1, _), c in corpus_pairs.items():
        prefix[w1] += c
    # r7 row conservation: bigram-less docs appear with zeroed counts
    expected = {
        i: (
            len(ps),
            sum(corpus_pairs[p] for p in ps),
            sum(prefix[p[0]] for p in ps),
        )
        for i, ps in doc_pairs.items()
    }
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_pair_cnt"], r["sum_prefix_cnt"])
        for r in bigram_commonness(df).collect()
    }
    assert got == expected


def test_kmeans_kernel_matches_sql_formulation(spark):
    """r7: _kmeans_assign_one_round has two physical formulations — the
    SQL explode-join (small k, the oracle's shape) and the Arrow kernel
    (large k, no O(n·d·k) row blow-up). They must be BIT-identical:
    same quantization double-math, same int64 distance algebra, same
    (dist, c) tie-break — including on ragged vectors (dist sums over the
    dim intersection), zero vectors, and NULL/empty embeddings (dropped
    by both, the posexplode contract)."""
    import random

    from graphsense_ethereum_etl_spark.queries import _kmeans_assign_one_round

    rng = random.Random(7)
    rows = []
    for vid in range(120):
        if vid % 17 == 0:
            rows.append((vid, None))            # NULL embedding: dropped
        elif vid % 23 == 0:
            rows.append((vid, []))              # empty: dropped
        elif vid % 11 == 0:
            rows.append((vid, [rng.uniform(-1, 1) for _ in range(3)]))  # ragged
        else:
            rows.append((vid, [rng.uniform(-1, 1) for _ in range(8)]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    for k in (4, 16, 40):
        sql_rows = sorted(
            tuple(r)
            for r in _kmeans_assign_one_round(emb, k, use_kernel=False).collect()
        )
        kern_rows = sorted(
            tuple(r)
            for r in _kmeans_assign_one_round(emb, k, use_kernel=True).collect()
        )
        assert sql_rows == kern_rows, f"formulations diverged at k={k}"
        assert len(sql_rows) > 0


def test_kmeans_formulations_agree_on_null_ids_and_elements(spark):
    """r8 (r7 ADVICE): a NULL vec_id with a valid embedding crashed the
    Arrow kernel (int(NaN)) while the SQL formulation emitted a NULL-id
    row, and a NULL element INSIDE an embedding crashed np.asarray where
    SQL SUM silently skipped the dimension. Both formulations now share
    one input contract — such rows are dropped up front — and must stay
    bit-identical on inputs that carry them."""
    import random

    from graphsense_ethereum_etl_spark.queries import _kmeans_assign_one_round

    rng = random.Random(11)
    rows = []
    for vid in range(80):
        vec = [rng.uniform(-1, 1) for _ in range(6)]
        if vid % 13 == 5:
            rows.append((None, vec))            # NULL id: dropped by both
        elif vid % 13 == 7:
            bad = list(vec)
            bad[2] = None                       # NULL element: dropped
            rows.append((vid, bad))
        else:
            rows.append((vid, vec))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    for k in (4, 40):
        sql_rows = sorted(
            tuple(r)
            for r in _kmeans_assign_one_round(emb, k, use_kernel=False).collect()
        )
        kern_rows = sorted(
            tuple(r)
            for r in _kmeans_assign_one_round(emb, k, use_kernel=True).collect()
        )
        assert sql_rows == kern_rows, f"formulations diverged at k={k}"
        assert len(sql_rows) > 0
        assert all(r[0] is not None for r in sql_rows)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=["Lu", "Ll", "Nd"]),
            min_size=1,
            max_size=8,
        ),
        min_size=0,
        max_size=20,
    )
)
def test_hashed_embedding_invariants(spark, token_lists):
    """Feature-hash embedding (functions/text.py::hashed_embedding):
    (a) fixed width dim regardless of input; (b) mass conservation —
    sum(|v_i|) <= n_tokens (equality iff no in-bucket sign cancellation)
    and sum(v_i) == sum of token signs; (c) deterministic — the same text
    twice gives identical vectors; (d) permutation-invariant (bag of
    words: token order cannot matter)."""
    import random

    from graphsense_ethereum_etl_spark.functions.text import hashed_embedding

    text = " ".join(token_lists)
    shuffled = token_lists[:]
    random.Random(7).shuffle(shuffled)
    rows = [(1, text), (2, text), (3, " ".join(shuffled))]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["v"]
        for r in df.select(
            "doc_id", hashed_embedding("text", dim=8).alias("v")
        ).collect()
    }
    n = len(token_lists)
    for v in got.values():
        assert len(v) == 8
        assert sum(abs(x) for x in v) <= n
    assert got[1] == got[2]  # deterministic
    assert got[3] == got[1]  # bag-of-words permutation invariance


def test_hashed_embedding_null_empty_zero_vector(spark):
    from graphsense_ethereum_etl_spark.functions.text import hashed_embedding

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  \t ")], "doc_id bigint, text string"
    )
    for r in df.select(hashed_embedding("text", dim=4).alias("v")).collect():
        assert r["v"] == [0, 0, 0, 0]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=0,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_label_propagation_matches_reference_on_random_graphs(
    spark, edges, rounds
):
    """Deterministic synchronous LPA equals the plain-Python reference on
    arbitrary small multigraphs — self-loops, multi-edges, isolated-by-
    self-loop vertices, any round count (the argmax tie-break and
    simultaneous-update semantics are the properties under test)."""
    from collections import Counter

    from graphsense_ethereum_etl_spark.operators.graph import label_propagation

    verts = sorted({v for e in edges for v in e})
    nbrs = {v: set() for v in verts}
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    label = {v: v for v in verts}
    for _ in range(rounds):
        label = {
            v: (
                max(
                    Counter(label[n] for n in nbrs[v]).items(),
                    key=lambda kv: (kv[1], -kv[0]),
                )[0]
                if nbrs[v]
                else label[v]
            )
            for v in verts
        }

    df = spark.createDataFrame(
        [(s, d) for s, d in edges], "src bigint, dst bigint"
    ) if edges else spark.createDataFrame([], "src bigint, dst bigint")
    got = {
        r["id"]: r["community"]
        for r in label_propagation(df, rounds=rounds).collect()
    }
    assert got == label


# ---------------------------------------------------------------------------
# profile_table (r8): one-pass column profiler
# ---------------------------------------------------------------------------


def test_profile_table_exact_counts_on_planted_frame(spark):
    """Hand-computable fixture: NULLs, duplicates, and string lengths all
    land in the right cells; n_distinct ignores NULLs (SQL semantics) and
    avg_len averages non-NULL values only."""
    from graphsense_ethereum_etl_spark.operators.quality import profile_table

    df = spark.createDataFrame(
        [
            (1, "aa", 1.5),
            (2, "bbbb", 1.5),
            (2, None, None),
            (None, "aa", 2.5),
        ],
        "k bigint, s string, x double",
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert set(got) == {"k", "s", "x"}
    assert all(r.n_rows == 4 for r in got.values())
    assert (got["k"].n_nulls, got["k"].n_distinct, got["k"].avg_len) == (1, 2, None)
    assert (got["s"].n_nulls, got["s"].n_distinct) == (1, 2)
    assert got["s"].avg_len == round((2 + 4 + 2) / 3, 6)
    assert (got["x"].n_nulls, got["x"].n_distinct, got["x"].avg_len) == (1, 2, None)


def test_profile_table_empty_frame_and_all_null_column(spark):
    """Empty table: zero rows/nulls/distinct, NULL avg_len (no crash —
    the r7 empty-input bug class). All-NULL string column: n_distinct 0,
    avg_len NULL."""
    from graphsense_ethereum_etl_spark.operators.quality import profile_table

    empty = spark.createDataFrame([], "k bigint, s string")
    got = {r["column"]: r for r in profile_table(empty).collect()}
    assert set(got) == {"k", "s"}
    assert all((r.n_rows, r.n_nulls, r.n_distinct, r.avg_len) == (0, 0, 0, None)
               for r in got.values())

    allnull = spark.createDataFrame([(1, None), (2, None)], "k bigint, s string")
    s = {r["column"]: r for r in profile_table(allnull).collect()}["s"]
    assert (s.n_nulls, s.n_distinct, s.avg_len) == (2, 0, None)


def test_profile_table_approx_mode_drops_expand(spark):
    """exact_distinct=False must (a) plan WITHOUT Expand — the whole
    profile is one map-side-combinable pass — and (b) stay within HLL
    tolerance of the exact counts."""
    from graphsense_ethereum_etl_spark.operators.quality import profile_table
    from graphsense_ethereum_etl_spark.plans import executed_plan

    df = spark.range(0, 2000).selectExpr(
        "id AS k", "CAST(id % 37 AS STRING) AS s"
    )
    exact = {r["column"]: r.n_distinct for r in profile_table(df).collect()}
    approx_df = profile_table(df, exact_distinct=False)
    plan_exact = executed_plan(profile_table(df))
    plan_approx = executed_plan(approx_df)
    assert "Expand" in plan_exact  # the documented exact-mode cost
    assert "Expand" not in plan_approx
    approx = {r["column"]: r.n_distinct for r in approx_df.collect()}
    for c in exact:
        assert abs(approx[c] - exact[c]) <= max(2, 0.1 * exact[c]), (c, exact[c], approx[c])


def test_profile_table_validates_params(spark):
    from graphsense_ethereum_etl_spark.operators.quality import profile_table

    df = spark.createDataFrame([(1,)], "k bigint")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        profile_table(df, columns=[])
    with _pytest.raises(ValueError):
        profile_table(df, columns=["nope"])
