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


def test_word_ngrams_count_property(spark):
    """len(grams) == max(0, n_tokens - n + 1) for any doc and n."""
    import pyspark.sql.functions as F

    texts = [
        " ".join(f"w{i}" for i in range(k)) for k in (0, 1, 4, 5, 6, 17)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    for n in (2, 5):
        got = {
            r["doc_id"]: len(r["g"])
            for r in df.select(
                "doc_id", word_ngrams("text", n).alias("g")
            ).collect()
        }
        for i, t in enumerate(texts):
            k = len(t.split())
            assert got[i] == max(0, k - n + 1), (n, k, got[i])


def test_hash_sample_nested_and_rate_bounds(spark):
    """Salted-bucket sampling is NESTED across rates (sample(r1) ⊆
    sample(r2) for r1 <= r2 — the property that lets a pipeline grow its
    sample without resampling) and rejects out-of-range rates."""
    import pytest as _pytest

    from graphsense_ethereum_etl_spark.operators.corpus import hash_sample

    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    s10 = {r["doc_id"] for r in hash_sample(docs, 0.1).collect()}
    s30 = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    assert s10 <= s30
    assert 0.05 < len(s10) / 2000 < 0.15
    assert 0.25 < len(s30) / 2000 < 0.35
    # different salt ⇒ statistically different sample (not identical)
    s10b = {r["doc_id"] for r in hash_sample(docs, 0.1, salt="other").collect()}
    assert s10 != s10b
    with _pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_dedup_keepers_exact_invariants(spark):
    """Every cluster has exactly one keeper; identical texts share a
    cluster; the keeper is the minimum id."""
    from graphsense_ethereum_etl_spark.operators.corpus import dedup_keepers

    df = spark.createDataFrame(
        [
            (1, "same text here"),
            (2, "same  TEXT here"),  # normalizes equal (case+whitespace)
            (3, "different entirely"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_keepers(df, "exact").collect()}
    assert rows[1]["cluster_id"] == rows[2]["cluster_id"]
    assert rows[1]["keep"] and not rows[2]["keep"]
    assert rows[3]["keep"] and rows[3]["cluster_size"] == 1


def test_cosine_pairs_within_string_block_key(spark):
    """r8 (r7 ADVICE): a non-integral blocking key must group on the RAW
    key and carry it through to the cluster column — the r7 GEMM rewrite
    cast block_col to bigint, so a string key (which the docstring
    advertises) cast to NULL and silently yielded ZERO pairs."""
    df = spark.createDataFrame(
        [
            (1, "news", [1.0, 0.0]),
            (2, "news", [1.0, 0.0]),
            (3, "web", [1.0, 0.0]),  # other block: must not pair with 1/2
        ],
        "vec_id long, blk string, embedding array<double>",
    )
    out = cosine_pairs_within(df, block_col="blk", threshold=0.5)
    assert dict(out.dtypes)["cluster"] == "string"
    rows = out.collect()
    assert [(r["id_a"], r["id_b"], r["cluster"]) for r in rows] == [
        (1, 2, "news")
    ]


def test_cosine_pairs_within_duplicate_ids_no_self_pairs(spark):
    """r8 (r7 ADVICE): upper-triangle selection was positional (jj > ii),
    so duplicate ids within a block emitted id_a == id_b pairs; the
    contract is strict VALUE ordering id_a < id_b, under which equal ids
    never pair with each other but still pair with distinct ids."""
    df = spark.createDataFrame(
        [
            (7, 0, [1.0, 0.0]),
            (7, 0, [1.0, 0.0]),  # duplicate id, identical vector
            (9, 0, [1.0, 0.0]),
        ],
        "vec_id long, blk int, embedding array<double>",
    )
    rows = cosine_pairs_within(df, block_col="blk", threshold=0.5).collect()
    assert all(r["id_a"] < r["id_b"] for r in rows)
    # each of the two id=7 rows pairs with id=9; no (7, 7) pair
    assert sorted((r["id_a"], r["id_b"]) for r in rows) == [(7, 9), (7, 9)]


# ---------------------------------------------------------------------------
# weighted_sample (r8): A-ES via integer max-of-w-tickets
# ---------------------------------------------------------------------------


def _py_ticket(doc_id: int, j: int, salt: str = "wsample") -> int:
    import hashlib

    h = hashlib.md5(f"{doc_id}:{j}:{salt}".encode()).hexdigest()
    return int(h[:8], 16)


def test_weighted_sample_key_matches_python_reference(spark):
    """The engine's A-ES key must equal max_{j=1..w} md5-ticket computed
    independently in Python — the exact integer contract the oracle and
    the distribution argument both rest on."""
    from graphsense_ethereum_etl_spark.operators.corpus import weighted_sample

    rows = [(i, (i * 7) % 5 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, w int")
    out = weighted_sample(df, k=40, weight_col="w").collect()
    assert len(out) == 40
    for r in out:
        w = dict(rows)[r.doc_id]
        assert r.sample_key == max(_py_ticket(r.doc_id, j) for j in range(1, w + 1))


def test_weighted_sample_topk_deterministic_and_weight_monotone(spark):
    """Same input → same kept set; and the kept set is the true top-k of
    the per-row keys (verified against the Python reference ranking)."""
    from graphsense_ethereum_etl_spark.operators.corpus import weighted_sample

    rows = [(i, 1 + (i % 8)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, w int")
    kept1 = sorted(r.doc_id for r in weighted_sample(df, k=25, weight_col="w").collect())
    kept2 = sorted(r.doc_id for r in weighted_sample(df, k=25, weight_col="w").collect())
    assert kept1 == kept2
    ref = sorted(
        ((max(_py_ticket(i, j) for j in range(1, w + 1)), -i), i) for i, w in rows
    )[-25:]
    assert kept1 == sorted(i for _, i in ref)


def test_weighted_sample_clamps_and_null_weights(spark):
    """NULL weight → 1 ticket; weights clamp into [1, max_weight]; NULL ids
    are dropped (no stable identity)."""
    from graphsense_ethereum_etl_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame(
        [(1, None), (2, -5), (3, 999), (None, 4)],
        "doc_id bigint, w int",
    )
    out = {r.doc_id: r.sample_key for r in
           weighted_sample(df, k=10, weight_col="w", max_weight=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] == _py_ticket(1, 1)
    assert out[2] == _py_ticket(2, 1)
    assert out[3] == max(_py_ticket(3, j) for j in range(1, 4))


def test_weighted_sample_rejects_bad_params(spark):
    from graphsense_ethereum_etl_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame([(1, 1)], "doc_id bigint, w int")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        weighted_sample(df, k=0, weight_col="w")
    with _pytest.raises(ValueError):
        weighted_sample(df, k=1, weight_col="w", max_weight=0)


# ---------------------------------------------------------------------------
# grouped_split (r8): leakage-safe split assignment
# ---------------------------------------------------------------------------


def test_grouped_split_leakage_safety_and_determinism(spark):
    """THE invariant: every group maps to exactly one split, including the
    NULL group; assignment is reproducible and matches the md5 convention."""
    import hashlib

    from graphsense_ethereum_etl_spark.operators.corpus import grouped_split

    rows = [(i, f"dom{i % 7}" if i % 11 else None) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = grouped_split(df).collect()
    assert len(out) == 120
    per_group: dict = {}
    for r in out:
        per_group.setdefault(r.source, set()).add(r.split)
    assert all(len(s) == 1 for s in per_group.values()), per_group
    for g, splits in per_group.items():
        key = (g if g is not None else "\x01null") + ":split"
        b = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 100
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert splits == {want}, (g, b, splits)


def test_grouped_split_cut_validation_and_boundaries(spark):
    from graphsense_ethereum_etl_spark.operators.corpus import grouped_split

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, source string")
    import pytest as _pytest

    for bad in [(0, 50), (60, 50), (50, 101)]:
        with _pytest.raises(ValueError):
            grouped_split(df, cuts=bad)
    # cuts=(100, 100): everything is train — the degenerate-but-legal edge
    assert grouped_split(df, cuts=(100, 100)).collect()[0].split == "train"


def test_weighted_sample_fractional_weights_round_not_truncate(spark):
    """r8 ADVICE: a DOUBLE weight of 0.9 must behave as w=1 via rounding
    (the old cast('int') truncated to 0 first), 2.5 rounds HALF_UP to 3,
    and a non-numeric weight column is rejected outright."""
    from graphsense_ethereum_etl_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame(
        [(1, 0.9), (2, 2.5), (3, 7.4)], "doc_id bigint, w double"
    )
    out = {r.doc_id: r.sample_key for r in weighted_sample(df, k=3, weight_col="w").collect()}
    assert out[1] == _py_ticket(1, 1)
    assert out[2] == max(_py_ticket(2, j) for j in range(1, 4))  # 2.5 -> 3
    assert out[3] == max(_py_ticket(3, j) for j in range(1, 8))  # 7.4 -> 7

    import pytest as _pytest

    bad = spark.createDataFrame([(1, "heavy")], "doc_id bigint, w string")
    with _pytest.raises(ValueError, match="non-numeric"):
        weighted_sample(bad, k=1, weight_col="w")


def test_grouped_weighted_sample_matches_python_reference(spark):
    """Per-group A-ES: within each group the kept set is the true top-k
    by (ticket key desc, id asc), keys bit-equal to the Python reference;
    NULL groups form their own stratum; NULL ids drop."""
    from graphsense_ethereum_etl_spark.operators.corpus import (
        grouped_weighted_sample,
    )

    rows = [(i, ["a", "b", "c", None][i % 4], 1 + (i % 6)) for i in range(120)]
    rows.append((None, "a", 5))
    df = spark.createDataFrame(rows, "doc_id bigint, grp string, w int")
    got = grouped_weighted_sample(
        df, k=4, weight_col="w", group_col="grp", id_col="doc_id", salt="gws"
    ).collect()
    assert all(r.doc_id is not None for r in got)
    by_grp = {}
    for r in got:
        by_grp.setdefault(r.grp, []).append(r)
    assert set(by_grp) == {"a", "b", "c", None}
    for grp, kept in by_grp.items():
        members = [
            (i, w) for (i, g, w) in rows if g == grp and i is not None
        ]
        ref = sorted(
            (
                (
                    max(
                        _py_ticket(i, j, "gws") for j in range(1, w + 1)
                    ),
                    -i,
                ),
                i,
            )
            for i, w in members
        )[-4:]
        assert sorted(r.doc_id for r in kept) == sorted(i for _, i in ref)
        for r in kept:
            w = dict(members)[r.doc_id]
            assert r.sample_key == max(
                _py_ticket(r.doc_id, j, "gws") for j in range(1, w + 1)
            )
        assert sorted(r.sample_rank for r in kept) == list(
            range(1, len(kept) + 1)
        )


def test_token_budget_mix_properties(spark):
    """Budget is a hard per-source ceiling on the hash-ordered prefix:
    kept cum_tokens <= budget; the kept set is exactly the maximal
    prefix (verified against a Python replay); per-source budget
    overrides apply; oversized first doc -> empty source."""
    import hashlib

    from graphsense_ethereum_etl_spark.operators.corpus import token_budget_mix

    rows = [(i, ["a", "b"][i % 2], 7) for i in range(30)] + [(100, "c", 99)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, toks bigint")
    got = token_budget_mix(
        df, budget=21, token_col="toks", budgets={"b": 7}
    ).collect()
    per_src = {}
    for r in got:
        per_src.setdefault(r.source, []).append(r)
    # python replay of the contract
    def prefix(src, budget):
        members = sorted(
            (hashlib.md5(f"{i}:mixb".encode()).hexdigest(), i, t)
            for i, s_, t in rows if s_ == src
        )
        out, cum = [], 0
        for _h, i, t in members:
            cum += t
            if cum > budget:
                break
            out.append((i, cum))
        return out

    assert sorted((r.doc_id, r.cum_tokens) for r in per_src.get("a", [])) == sorted(prefix("a", 21))
    assert sorted((r.doc_id, r.cum_tokens) for r in per_src.get("b", [])) == sorted(prefix("b", 7))
    assert "c" not in per_src  # 99 > 21: oversized first doc, empty source
    assert all(r.cum_tokens <= (7 if r.source == "b" else 21) for r in got)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        token_budget_mix(df, budget=-1, token_col="toks")


def test_bpe_token_counts_hand_example(spark):
    """bpe_token_counts vs a hand-worked example: corpus 'aa aa ab' /
    'a aa b' / NULL. Training vocabulary (>= 2 chars): aa(f=2), ab(f=1).
    Round 1 argmax = (a,a) [cnt 2]; after merging, the only pair left is
    (a,b) [cnt 1] -> round 2 rule. Tokens: every word collapses to ONE
    token under both rules; single-char words are one token always;
    NULL-text docs conserve rows as (0,0)."""
    from graphsense_ethereum_etl_spark.operators.corpus import (
        bpe_token_counts,
    )

    docs = spark.createDataFrame(
        [(1, "aa aa ab"), (2, "a aa b"), (3, None)],
        "doc_id bigint, text string",
    )

    def counts(merges):
        return {
            r["doc_id"]: (r["n_words"], r["n_tokens"])
            for r in bpe_token_counts(docs, merges=merges).collect()
        }

    assert counts(2) == {1: (3, 3), 2: (3, 3), 3: (0, 0)}
    # one merge: (a,a) only — 'ab' stays two tokens
    assert counts(1) == {1: (3, 4), 2: (3, 3), 3: (0, 0)}
    # zero merges: tokens == characters
    assert counts(0) == {1: (3, 6), 2: (3, 4), 3: (0, 0)}
    # unlearnable rounds stop early instead of wiping the relation:
    # all-single-char corpus has an EMPTY training vocabulary
    single = spark.createDataFrame(
        [(1, "a b a"), (2, "c")], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_token_counts(single, merges=3).collect()
    }
    assert got == {1: (3, 3), 2: (1, 1)}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="merges"):
        bpe_token_counts(docs, merges=-1)
