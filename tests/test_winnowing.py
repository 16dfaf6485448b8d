"""Winnowing fingerprint tests (operators/dedup.py::winnowing_fingerprints /
winnowing_pairs — Schleimer/Wilkerson/Aiken SIGMOD'03)."""

from __future__ import annotations

import hashlib

from graphsense_ethereum_etl_spark.operators.dedup import (
    _WINNOW_B,
    winnowing_fingerprints,
    winnowing_pairs,
)

K, W = 8, 4


def _ref_fingerprints(text: str, k: int = K, w: int = W) -> set[int]:
    """Independent pure-Python reference: same normalization, same md5
    gram hash, same min-hash-rightmost-tie selection."""
    import re

    s = re.sub(r"\s+", " ", text.strip().lower())
    if len(s) < k:
        return set()
    hashes = [
        int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(s) - k + 1)
    ]
    out = set()
    n_g = len(hashes)
    for j in range(max(n_g - w + 1, 1)):
        window = hashes[j : j + w]
        m = min(window)
        # rightmost occurrence of the min in this window
        for off in range(len(window) - 1, -1, -1):
            if window[off] == m:
                out.add(m)
                break
    return out


def test_matches_pure_python_reference(spark):
    texts = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, "aaaaaaaaaaaaaaaaaaaa"),  # constant text: heavy hash ties
        (3, "ab " * 30),  # periodic text: periodic ties
        (4, "short"),  # < k chars: no fingerprints
        (5, "exactlyeight"),  # k <= len < k + w - 1: fewer grams than window
    ]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    got: dict[int, set[int]] = {}
    for r in winnowing_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r.doc_id, set()).add(r.h)
    for doc_id, text in texts:
        assert got.get(doc_id, set()) == _ref_fingerprints(text), doc_id


def test_shared_substring_guarantee(spark):
    """The winnowing guarantee: any shared substring of length >= w+k-1
    contributes at least one identical fingerprint to both documents."""
    shared = "zqxjkvbnmwpfhd leuyrtois"  # w+k-1 = 11 <= len(shared)
    df = spark.createDataFrame(
        [
            (0, f"first document prefix {shared} first suffix text"),
            (1, f"totally different opening here {shared} and other ending"),
        ],
        "doc_id bigint, text string",
    )
    fp = winnowing_fingerprints(df, k=K, w=W)
    a = {r.h for r in fp.filter("doc_id = 0").collect()}
    b = {r.h for r in fp.filter("doc_id = 1").collect()}
    assert a & b, "shared 24-char substring must yield a common fingerprint"
    pairs = winnowing_pairs(df, k=K, w=W, min_shared=1, max_df=None).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(0, 1)]


def test_max_df_drops_boilerplate(spark):
    """A banner line present in EVERY doc is excluded by max_df, so docs
    that share only the banner produce no pair."""
    banner = "copyright 2026 example corp all rights reserved banner"
    rows = [(i, f"{banner} unique body {i} " + "x" * (20 + 3 * i)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    with_banner = winnowing_pairs(df, min_shared=1, max_df=None).count()
    without = winnowing_pairs(df, min_shared=1, max_df=3).count()
    assert with_banner > 0 and without == 0


def test_key_packing_bounds():
    """Key arithmetic headroom: the packed key stays inside exact-int64."""
    assert (2**32) * _WINNOW_B < 2**53  # also double-exact, belt and braces


def test_over_length_document_raises(spark, monkeypatch):
    """The B position-packing bound is enforced, not advisory (ADVICE
    r11): a document with >= B grams fails loudly instead of silently
    aliasing positions into wrong fingerprints. B is shrunk via
    monkeypatch so the exact boundary (n_g = B - 1 computes, n_g = B
    raises) is cheap to exercise; the production 2^20 path is the same
    expression with a bigger literal."""
    import pytest

    from graphsense_ethereum_etl_spark.operators import dedup as dd

    monkeypatch.setattr(dd, "_WINNOW_B", 64)
    big = spark.createDataFrame(
        [(0, "x" * (64 - 1 + K))], "doc_id bigint, text string"  # n_g = 64
    )
    with pytest.raises(Exception, match="_WINNOW_B"):
        dd.winnowing_fingerprints(big, k=K, w=W).count()
    ok = spark.createDataFrame(
        [(0, "x" * (64 - 2 + K))], "doc_id bigint, text string"  # n_g = 63
    )
    assert dd.winnowing_fingerprints(ok, k=K, w=W).count() > 0
