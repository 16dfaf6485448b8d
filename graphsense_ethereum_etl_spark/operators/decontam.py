"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (GPT-3 §C / PaLM / Llama reports):
any training document containing an n-gram (n≈8-13 for real corpora) that
also occurs in an eval benchmark is held out or dropped so downstream
eval numbers aren't contaminated by memorization.

Design for 100 TB:
  - the EVAL side is tiny (benchmarks are MBs) → its distinct n-gram set is
    computed once and BROADCAST; the corpus side streams through a
    broadcast-hash join without ever shuffling document text;
  - corpus n-grams are generated per-row with Catalyst array expressions
    (transform over sequence + slice + concat_ws) — no Python, no explode
    until after the per-row gram array is built, and the exploded stream
    carries only (doc_id, gram) pairs, never the text;
  - only MATCHED (doc_id, gram) pairs reach the final per-document count
    aggregation, which is map-side-combined — for a clean corpus the
    post-join cardinality is ~0 regardless of corpus size.

Determinism: grams are plain whitespace-token windows joined with a single
space — identical in any engine — so the operator is fully
oracle-checkable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(text_col: str, n: int) -> F.Column:
    """Array of word n-grams of `text_col` (whitespace-tokenized, grams
    joined with a single space). Documents shorter than n tokens yield an
    empty array. Pure Catalyst: split → sequence → slice → concat_ws."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-corpus-document contamination report against `eval_set`.

    Returns one row per corpus document that shares at least one word
    n-gram with ANY eval document: (id_col, n_grams, n_hit_grams) where
    n_grams counts the document's distinct grams and n_hit_grams how many
    of them occur in the eval set. Callers drop or hold out rows where
    n_hit_grams > 0 (or apply a threshold for fuzzy variants).

    The eval gram set is distinct-ed then broadcast — the corpus is never
    shuffled; only matched (id, gram) pairs are aggregated.
    """
    grams = word_ngrams(text_col, n)
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
    )
    eval_grams = (
        eval_set.select(F.explode(grams).alias("gram")).distinct()
    )
    doc_totals = corpus.select(
        F.col(id_col),
        F.size(F.array_distinct(grams)).cast("bigint").alias("n_grams"),
    )
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_hit_grams"))
    )
    # hits is the SMALL side (contaminated docs only — ~empty for a clean
    # corpus); broadcast it so the corpus-sized totals frame streams through
    # without an exchange.
    return doc_totals.join(F.broadcast(hits), id_col).select(
        F.col(id_col).cast("bigint").alias(id_col), "n_grams", "n_hit_grams"
    )
