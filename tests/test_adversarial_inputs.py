"""Adversarial-input harness over the public operator surface (r7).

Three consecutive rounds of external review found silent-drop / crash
classes on edge inputs (NULL text, empty batches, empty rule sets,
inverted date ranges, zero-norm vectors). This file systematizes the
check instead of waiting for the next review to find the next one:
every public DataFrame operator in ``operators/*.py`` runs against a
fixed adversarial fixture set — empty frame, all-NULL payload column,
empty string, whitespace-only, single row — and must

  (a) not crash, and
  (b) satisfy its declared row contract:
        per_doc   — output id set == input id set (row conservation)
        subset    — output ids  ⊆ input ids, drop DOCUMENTED in the
                    registry entry (pair generators, filters, reports)
        count     — output row count == input row count (passthrough
                    transforms)
        no_crash  — shape asserted case-by-case below / elsewhere

``test_every_public_operator_is_registered`` walks the package by
reflection: adding a public DataFrame-taking operator without a harness
entry (or an explicit SKIP reason) fails CI — new operators cannot
dodge the harness.
"""

from __future__ import annotations

import inspect
import importlib
import pkgutil

import pytest
from pyspark.sql import functions as F

import graphsense_ethereum_etl_spark.operators as ops_pkg
from graphsense_ethereum_etl_spark.operators import (
    corpus as c_ops,
    decontam as dc_ops,
    dedup as dd_ops,
    graph as g_ops,
    joins as j_ops,
    multimodal as mm_ops,
    pipelines as p_ops,
    quality as q_ops,
    rates as r_ops,
    similarity as s_ops,
)

# ---------------------------------------------------------------- fixtures

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string"
DOC_VARIANTS = {
    "empty": [],
    "null_text": [(1, None, "en", "a"), (2, None, "de", "b")],
    "empty_text": [(1, "", "en", "a"), (2, "", "en", "a")],
    "whitespace": [(1, " \n\t ", "en", "a"), (2, "  ", "en", "a")],
    "single": [(7, "the quick brown fox jumps", "en", "a")],
}

EMB_SCHEMA = "vec_id bigint, embedding array<float>"
_V = [1.0, 0.0, 2.0, 0.0, 1.0, 0.0, 0.0, 1.0]
_Z = [0.0] * 8
EMB_VARIANTS = {
    "empty": [],
    "single": [(1, _V)],
    "zero_vec": [(1, _Z), (2, _V)],
    "dup": [(1, _V), (2, list(_V))],
}

EDGE_SCHEMA = "src bigint, dst bigint"
EDGE_VARIANTS = {
    "empty": [],
    "single": [(1, 2)],
    "self_loop": [(3, 3)],
    "null_vertex": [(1, None), (None, 2), (4, 5)],
}

BIP_SCHEMA = "s string, p string"
BIP_VARIANTS = {
    "empty": [],
    "single": [("0xaa", "p1")],
    "null_vertex": [("0xaa", None), (None, "p1"), ("0xbb", "p2")],
}

MEDIA_VARIANTS = {
    "empty": [],
    "null_payload": [(1, None), (2, b"RIFFxxxx")],
    "zero_bytes": [(1, b""), (2, b"")],
    "single": [(9, b"\x89PNG\r\n\x1a\n truncated-garbage")],
}

RATE_SCHEMA = "date string, fiat_values map<string,float>"
RATE_VARIANTS = {
    "empty": [],
    "single": [("2020-01-02", {"USD": 2.0})],
}

VALUE_SCHEMA = "vid bigint, d date, value double"


def docs_df(spark, variant):
    return spark.createDataFrame(DOC_VARIANTS[variant], DOC_SCHEMA)


def docs_vec_df(spark, variant):
    # docs-with-vectors fixtures ride the embedding variants, re-keyed as docs
    rows = [(vid, "txt %d" % vid, emb) for vid, emb in EMB_VARIANTS[variant]]
    return spark.createDataFrame(rows, "doc_id bigint, text string, embedding array<float>")


def emb_df(spark, variant):
    return spark.createDataFrame(EMB_VARIANTS[variant], EMB_SCHEMA)


def media_df(spark, variant):
    raw = spark.createDataFrame(
        MEDIA_VARIANTS[variant], "media_id bigint, payload binary"
    )
    return mm_ops.attach_media_columns(raw, "media_id", "payload", mime="image/png")


def ids_of(df, col):
    return sorted(r[0] for r in df.select(col).collect())


# ------------------------------------------------------------- registry
#
# name → dict(
#   input:    fixture family ("docs" | "docs_vec" | "emb" | "edges" |
#             "bip" | "media" | custom marker handled in the test body)
#   call:     (spark, df) -> DataFrame
#   contract: "per_doc" (ids conserved) | "subset" (ids ⊆ input; `documented`
#             required) | "count" (row count conserved) | "no_crash"
#   id_out:   output column carrying ids for per_doc/subset checks
#   id_cols:  for pair outputs, both columns checked ⊆ input ids
#   documented: WHY a drop is legitimate (required for "subset")
# )

OPS = {
    # ---- corpus ----
    "corpus.score_documents": dict(
        input="docs", call=lambda sp, d: c_ops.score_documents(d),
        contract="per_doc", id_out="doc_id"),
    "corpus.dedup_keepers[exact]": dict(
        input="docs", call=lambda sp, d: c_ops.dedup_keepers(d, method="exact"),
        contract="per_doc", id_out="doc_id"),
    "corpus.dedup_keepers[minhash]": dict(
        input="docs", call=lambda sp, d: c_ops.dedup_keepers(d, method="minhash"),
        contract="per_doc", id_out="doc_id"),
    "corpus.dedup_keepers[simhash]": dict(
        input="docs", call=lambda sp, d: c_ops.dedup_keepers(d, method="simhash"),
        contract="per_doc", id_out="doc_id"),
    "corpus.hash_sample": dict(
        input="docs", call=lambda sp, d: c_ops.hash_sample(d, rate=0.5),
        contract="subset", id_out="doc_id",
        documented="sampling IS a filter; kept set is the deterministic hash bucket"),
    "corpus.pack_sequences": dict(
        input="docs", call=lambda sp, d: c_ops.pack_sequences(d, seq_len=4),
        contract="per_doc", id_out="doc_id"),
    "corpus.chunk_documents": dict(
        input="docs", call=lambda sp, d: c_ops.chunk_documents(d, chunk_tokens=3, stride=2),
        contract="per_doc_multi", id_out="doc_id"),
    "corpus.negative_pairs": dict(
        input="docs", call=lambda sp, d: c_ops.negative_pairs(d, k=2),
        contract="subset", id_out="doc_id",
        documented="self-pairs drop by construction; docstring says 'up to k rows'"),
    "corpus.dedup_lines": dict(
        input="docs", call=lambda sp, d: c_ops.dedup_lines(d, min_count=2),
        contract="per_doc", id_out="doc_id"),
    "corpus.semantic_dedup_keepers": dict(
        input="docs_vec", call=lambda sp, d: c_ops.semantic_dedup_keepers(d, n_clusters=2),
        contract="per_doc", id_out="doc_id"),
    "corpus.bpe_token_counts": dict(
        input="docs",
        call=lambda sp, d: c_ops.bpe_token_counts(d, merges=2),
        contract="per_doc", id_out="doc_id"),  # NULL/empty-text docs
    # conserve rows as (0,0); unlearnable merge rounds stop early
    "corpus.bigram_commonness": dict(
        input="docs", call=lambda sp, d: c_ops.bigram_commonness(d),
        contract="per_doc", id_out="doc_id"),
    "corpus.domain_cap": dict(
        input="docs", call=lambda sp, d: c_ops.domain_cap(d, k=2),
        contract="subset", id_out="doc_id",
        documented="a cap IS a filter; rk <= k per domain is the contract"),
    "corpus.domain_cap[salted]": dict(
        input="docs", call=lambda sp, d: c_ops.domain_cap(d, k=2, salt_buckets=4),
        contract="subset", id_out="doc_id",
        documented="a cap IS a filter; rk <= k per domain is the contract"),
    "corpus.weighted_sample": dict(
        input="docs",
        call=lambda sp, d: c_ops.weighted_sample(
            d.withColumn("w", F.length(F.coalesce("text", F.lit("")))),
            k=2, weight_col="w"),
        contract="subset", id_out="doc_id",
        documented="sampling IS a filter (top-k by A-ES key); NULL ids drop "
                   "by the no-stable-identity contract"),
    "corpus.grouped_weighted_sample": dict(
        input="docs",
        call=lambda sp, d: c_ops.grouped_weighted_sample(
            d.withColumn("w", F.length(F.coalesce("text", F.lit("")))),
            k=2, weight_col="w", group_col="source"),
        contract="subset", id_out="doc_id",
        documented="sampling IS a filter (per-group top-k by A-ES key); "
                   "NULL ids drop by the no-stable-identity contract"),
    "corpus.token_budget_mix": dict(
        input="docs",
        call=lambda sp, d: c_ops.token_budget_mix(
            d.withColumn("toks", F.length(F.coalesce("text", F.lit("")))),
            budget=10, token_col="toks"),
        contract="subset", id_out="doc_id",
        documented="a budget IS a filter (hash-ordered prefix per source); "
                   "NULL ids drop by the no-stable-order contract"),
    "corpus.grouped_split": dict(
        input="docs", call=lambda sp, d: c_ops.grouped_split(d),
        contract="per_doc", id_out="doc_id"),
    # ---- decontam ----
    "decontam.ngram_contamination": dict(
        input="docs",
        call=lambda sp, d: dc_ops.ngram_contamination(d, d, n=2),
        contract="subset", id_out="doc_id",
        documented="docstring: one row per corpus doc sharing >=1 gram with the eval set"),
    # ---- dedup ----
    "dedup.exact_duplicates": dict(
        input="docs", call=lambda sp, d: dd_ops.exact_duplicates(d),
        contract="subset", id_out="canonical_id",
        documented="one row per DISTINCT content by design (canonical keeper)"),
    "dedup.minhash_signatures": dict(
        input="docs", call=lambda sp, d: dd_ops.minhash_signatures(d, num_hashes=4),
        contract="subset", id_out="doc_id",
        documented="docs with no shingles (NULL/short text) have no signature; "
                   "drop documented in the operator docstring"),
    "dedup.lsh_candidate_pairs": dict(
        input="docs", call=lambda sp, d: dd_ops.lsh_candidate_pairs(d, num_hashes=4, bands=2),
        contract="pairs", id_cols=("id_a", "id_b")),
    "dedup.ngram_jaccard_pairs": dict(
        input="docs", call=lambda sp, d: dd_ops.ngram_jaccard_pairs(d, threshold=0.5),
        contract="pairs", id_cols=("id_a", "id_b")),
    "dedup.ngram_jaccard_pairs_bucketed": dict(
        input="docs", call=None,  # handled in test body (needs a unique table)
        contract="pairs", id_cols=("id_a", "id_b")),
    "dedup.edit_distance_pairs": dict(
        input="docs", call=lambda sp, d: dd_ops.edit_distance_pairs(d, max_distance=2),
        contract="pairs", id_cols=("id_a", "id_b")),
    "dedup.passjoin_candidate_pairs": dict(
        input="docs", call=lambda sp, d: dd_ops.passjoin_candidate_pairs(d, max_distance=1),
        # documented output contract: (id_s, id_r, ps, pr, *group_cols) —
        # pre-verification candidates keep the index/probe role names
        contract="pairs", id_cols=("id_s", "id_r")),
    "dedup.edit_distance_pairs_passjoin": dict(
        input="docs", call=lambda sp, d: dd_ops.edit_distance_pairs_passjoin(d, max_distance=1),
        contract="pairs", id_cols=("id_a", "id_b")),
    "dedup.dupspan_coverage": dict(
        input="docs", call=lambda sp, d: dd_ops.dupspan_coverage(d, k=2),
        contract="per_doc", id_out="doc_id"),
    "dedup.winnowing_fingerprints": dict(
        input="docs", call=lambda sp, d: dd_ops.winnowing_fingerprints(d),
        contract="subset", id_out="doc_id",
        documented="docs shorter than k normalized chars (NULL/empty/"
                   "whitespace text included) have no fingerprints; drop "
                   "documented in the operator docstring"),
    "dedup.winnowing_pairs": dict(
        input="docs",
        call=lambda sp, d: dd_ops.winnowing_pairs(d, min_shared=1, max_df=None),
        contract="pairs", id_cols=("id_a", "id_b")),
    "dedup.simhash": dict(
        input="docs", call=lambda sp, d: dd_ops.simhash(d),
        contract="per_doc", id_out="doc_id"),
    "dedup.simhash_hamming_pairs": dict(
        input="docs", call=lambda sp, d: dd_ops.simhash_hamming_pairs(d, max_hamming=3),
        contract="pairs", id_cols=("id_a", "id_b")),
    "dedup.fingerprint_hamming_pairs": dict(
        input="docs",
        call=lambda sp, d: dd_ops.fingerprint_hamming_pairs(
            dd_ops.simhash(d).withColumnRenamed("simhash", "fingerprint")),
        contract="pairs", id_cols=("id_a", "id_b")),
    "dedup.bloom_build": dict(
        # NULL-text docs fingerprint to a NULL fp (md5(NULL) is NULL —
        # the streaming gate's convention): the filter must absorb them
        # (pre-fix they produced a NULL word row that crashed the probe).
        input="docs",
        call=lambda sp, d: dd_ops.bloom_build(
            d.select(F.md5("text").alias("fp")), m_bits=256, k_hashes=2),
        contract="no_crash"),
    "dedup.bloom_probe": dict(
        # Self-probe: every doc row survives with the gate column added;
        # NULL fps report possibly_seen=false instead of NULL.
        input="docs",
        call=lambda sp, d: dd_ops.bloom_probe(
            d.withColumn("fp", F.md5("text")),
            dd_ops.bloom_build(
                d.select(F.md5("text").alias("fp")),
                m_bits=256, k_hashes=2),
            m_bits=256, k_hashes=2),
        contract="per_doc", id_out="doc_id"),
    # ---- graph ----
    "graph.connected_components[label]": dict(
        input="edges", call=lambda sp, d: g_ops.connected_components(d),
        contract="no_crash"),
    "graph.connected_components[star]": dict(
        input="edges", call=lambda sp, d: g_ops.connected_components(d, algorithm="star"),
        contract="no_crash"),
    "graph.label_propagation": dict(
        input="edges", call=lambda sp, d: g_ops.label_propagation(d),
        contract="no_crash"),
    "graph.bipartite_project": dict(
        input="bip", call=lambda sp, d: g_ops.bipartite_project(d, left="s", right="p"),
        contract="no_crash"),
    "graph.bipartite_project[cap]": dict(
        input="bip", call=lambda sp, d: g_ops.bipartite_project(d, left="s", right="p", degree_cap=2),
        contract="no_crash"),
    "graph.triangle_counts": dict(
        input="edges", call=lambda sp, d: g_ops.triangle_counts(d),
        contract="no_crash"),  # dedicated test below (graph-op pattern)
    "graph.edge_support": dict(
        input="edges", call=lambda sp, d: g_ops.edge_support(d),
        contract="no_crash"),  # shares the triangle kernel's contract
    "graph.ktruss_peel": dict(
        input="edges", call=lambda sp, d: g_ops.ktruss_peel(d, k=3, rounds=1),
        contract="no_crash"),  # same kernel + incidence peel; NULL/self-
    # loop/dupe handling inherited from _oriented_triangles
    "graph.ktruss_peel[fixpoint]": dict(
        input="edges",
        call=lambda sp, d: g_ops.ktruss_peel(d, k=4, rounds=None),
        contract="no_crash"),  # triangle-free fixtures: the fixpoint
    # probe sees an empty dead set round 1 and must exit clean (r12
    # cap-guard must NOT fire on vacuous convergence)
    "graph.edge_trussness": dict(
        input="edges", call=lambda sp, d: g_ops.edge_trussness(d),
        contract="no_crash"),  # ascending-fixpoint chain over the same
    # incidence relation; inherits the kernel's edge contract
    "graph.edge_trussness[bounded]": dict(
        input="edges",
        call=lambda sp, d: g_ops.edge_trussness(
            d, k_max=4, rounds_per_level=1, truncate=True
        ),
        contract="no_crash"),  # g14's registered mode on degenerate
    # inputs: truncation must emit nothing when no triangle survives
    # ---- joins ----
    "joins.asof_join": dict(input="custom", call=None, contract="no_crash"),
    "joins.bucketized_range_join": dict(input="custom", call=None, contract="no_crash"),
    "joins.salted_join": dict(input="custom", call=None, contract="no_crash"),
    # ---- multimodal ----
    "multimodal.attach_media_columns": dict(
        input="media", call=lambda sp, d: d,
        contract="per_doc_media", id_out="media_id"),
    "multimodal.extract_features[fake]": dict(
        input="media", call=lambda sp, d: mm_ops.extract_features(d, extractor="fake"),
        contract="per_doc_media", id_out="media_id"),
    "multimodal.extract_features[real]": dict(
        input="media", call=lambda sp, d: mm_ops.extract_features(d, extractor="real"),
        contract="per_doc_media", id_out="media_id"),
    "multimodal.resize_media": dict(
        input="media", call=lambda sp, d: mm_ops.resize_media(d, 4, 4),
        contract="per_doc_media", id_out="media_id"),
    "multimodal.sample_frames": dict(
        input="media", call=lambda sp, d: mm_ops.sample_frames(d, every_n_bytes=4),
        contract="subset_media", id_out="media_id",
        documented="zero-byte payloads yield zero frames (nothing to sample)"),
    "multimodal.audio_hash": dict(
        input="media", call=lambda sp, d: mm_ops.audio_hash(d),
        contract="per_doc_media", id_out="media_id"),
    "multimodal.video_frame_hashes": dict(
        input="media", call=lambda sp, d: mm_ops.video_frame_hashes(d),
        contract="subset_media", id_out="media_id",
        documented="undecodable/empty payloads yield zero frame rows; "
                   "per-media presence comes from perceptual_hash"),
    "multimodal.perceptual_hash": dict(
        input="media", call=lambda sp, d: mm_ops.perceptual_hash(d),
        contract="per_doc_media", id_out="media_id"),
    "multimodal.audio_frame_energies": dict(
        input="media", call=lambda sp, d: mm_ops.audio_frame_energies(d, frame_len=4),
        contract="subset_media", id_out="media_id",
        documented="non-WAV/corrupt payloads decode to zero frames by contract"),
    "multimodal.audio_activity_segments": dict(
        input="media",
        call=lambda sp, d: mm_ops.audio_activity_segments(
            mm_ops.audio_frame_energies(d, frame_len=4), threshold_per_sample=0),
        contract="subset_media", id_out="media_id",
        documented="segments exist only for clips with active frames; "
                   "undecodable payloads have no frames at all"),
    # ---- pipelines ----
    "pipelines.transform_blocks": dict(input="custom", call=None, contract="no_crash"),
    "pipelines.transform_transactions": dict(input="custom", call=None, contract="no_crash"),
    "pipelines.transform_traces": dict(input="custom", call=None, contract="no_crash"),
    "pipelines.transform_logs": dict(input="custom", call=None, contract="no_crash"),
    "pipelines.enrich_transactions": dict(input="custom", call=None, contract="no_crash"),
    "pipelines.latest_block": dict(input="custom", call=None, contract="no_crash"),
    # ---- quality ----
    "quality.check_constraints": dict(input="custom", call=None, contract="no_crash"),
    "quality.grouped_outliers": dict(
        input="docs",
        call=lambda sp, d: q_ops.grouped_outliers(
            d.withColumn("v", F.length(F.coalesce("text", F.lit("")))),
            "v", "source"),
        contract="per_doc", id_out="doc_id"),
    "quality.profile_table": dict(
        input="docs", call=lambda sp, d: q_ops.profile_table(d),
        contract="no_crash",
        documented="output is one row per COLUMN (4 for the docs schema), "
                   "not per input row — shape pinned in test_properties.py"),
    # ---- rates ----
    "rates.rates_long_to_map": dict(input="custom", call=None, contract="no_crash"),
    "rates.densify_rates": dict(input="custom", call=None, contract="no_crash"),
    "rates.convert_to_fiat": dict(input="custom", call=None, contract="no_crash"),
    "rates.latest_rate_date": dict(input="custom", call=None, contract="no_crash"),
    # ---- similarity ----
    "similarity.brute_force_topk": dict(
        input="emb", call=lambda sp, d: s_ops.brute_force_topk(d, d, k=3),
        contract="pairs", id_cols=("query_id", "cand_id")),
    "similarity.blocked_cosine_pairs": dict(
        input="emb", call=lambda sp, d: s_ops.blocked_cosine_pairs(d, threshold=0.5, n_blocks=2),
        contract="pairs", id_cols=("id_a", "id_b")),
    "similarity.sign_lsh_signatures": dict(
        input="emb", call=lambda sp, d: s_ops.sign_lsh_signatures(d, n_bands=2, band_planes=3, dim=8),
        contract="subset", id_out="vec_id",
        documented="one row per (vector, band) — ids repeat per band, none invented"),
    "similarity.lsh_ann_pairs": dict(
        input="emb", call=lambda sp, d: s_ops.lsh_ann_pairs(d, n_bands=2, band_planes=3, dim=8),
        contract="pairs", id_cols=("id_a", "id_b")),
    "similarity.cosine_pairs_within": dict(
        input="emb", call=None,  # needs a block column; test body
        contract="pairs", id_cols=("id_a", "id_b")),
    "similarity.ivf_centroids": dict(
        input="emb", call=lambda sp, d: s_ops.ivf_centroids(d, n_clusters=4),
        contract="no_crash"),
    "similarity.ivf_topk": dict(
        input="emb", call=lambda sp, d: s_ops.ivf_topk(d, d, n_clusters=2, nprobe=2, k=3),
        contract="pairs", id_cols=("query_id", "cand_id")),
    "similarity.pq_codebooks": dict(
        input="emb",
        call=lambda sp, d: s_ops.pq_codebooks(d, dim=8, m=4, n_codes=4),
        contract="no_crash"),
    "similarity.pq_topk": dict(
        input="emb",
        call=lambda sp, d: s_ops.pq_topk(d, d, dim=8, m=4, n_codes=4, k=3, rerank=2),
        contract="pairs", id_cols=("query_id", "cand_id")),
    "similarity.diverse_topk": dict(
        input="emb",
        call=lambda sp, d: s_ops.diverse_topk(
            d.withColumn("label", F.col("vec_id") % 2), d, k=3),
        contract="pairs", id_cols=("query_id", "cand_id")),
    "similarity.ivfpq_topk": dict(
        input="emb",
        call=lambda sp, d: s_ops.ivfpq_topk(
            d, d, dim=8, n_clusters=2, nprobe=2, m=4, n_codes=4, k=3),
        contract="pairs", id_cols=("query_id", "cand_id")),
    "similarity.ivfpq_refine": dict(
        input="emb",
        call=lambda sp, d: s_ops.ivfpq_refine(
            d, d,
            s_ops.ivfpq_topk(
                d, d, dim=8, n_clusters=2, nprobe=2, m=4, n_codes=4, k=3
            ),
            k=2),
        contract="pairs", id_cols=("query_id", "cand_id")),
}

# Public callables in operators/*.py that the generic harness does NOT
# drive, each with the reason (the completeness test enforces this map).
SKIPS = {
    # codecs.py: bytes-level kernels (no DataFrame in/out); adversarial
    # bytes are covered by test_codec_kernels_adversarial_bytes below and
    # tests/test_codecs.py.
    "codecs.sniff_mime": "bytes kernel — covered by adversarial-bytes test",
    "codecs.png_decode": "bytes kernel — raises ValueError on garbage by contract",
    "codecs.png_encode": "ndarray kernel — tested in test_codecs.py",
    "codecs.pnm_decode": "bytes kernel — raises ValueError on garbage by contract",
    "codecs.pnm_encode": "ndarray kernel — tested in test_codecs.py",
    "codecs.pnm_stream_frames": "bytes kernel — covered by adversarial-bytes test",
    "codecs.wav_info": "bytes kernel — raises on garbage by contract",
    "codecs.wav_decode": "bytes kernel — raises on garbage by contract",
    "codecs.wav_encode": "ndarray kernel — tested in test_codecs.py",
    "codecs.audio_fingerprint": "ndarray kernel — covered by adversarial-bytes test",
    "codecs.decode_image": "bytes kernel — raises ValueError/NotImplementedError by contract",
    "codecs.media_features": "bytes kernel — covered by adversarial-bytes test",
    "codecs.resize_nearest": "ndarray kernel — tested in test_codecs.py",
    "codecs.dhash": "ndarray kernel — tested in test_codecs.py",
    # Column-expression helpers (return a Column, not a DataFrame):
    "decontam.word_ngrams": "Column helper — exercised via ngram_contamination",
    # Pure int→int sizing formula (no DataFrame); pinned by the sim3
    # docstring contract (n=500 → 6) and the shuffle-byte audit.
    "similarity.lsh_planes_for": "scalar sizing helper — no frame in/out",
    # Needs a labeled two-class train/test fixture the generic docs
    # variants cannot provide (degenerate splits raise by contract) —
    # covered by test_centroid_classifier_adversarial below.
    "corpus.centroid_classifier": "dedicated adversarial test (labeled fixture)",
    # Index-at-rest pair (writes/reads a directory, not a pure
    # DataFrame→DataFrame op); equivalence to ivfpq_topk — which IS
    # harnessed — plus determinism and pruning are pinned in
    # tests/test_similarity.py.
    "similarity.build_ivfpq_index": "persists to disk — tested in test_similarity.py",
    "similarity.ivfpq_search": "reads a persisted index — tested in test_similarity.py",
    # r13 index-lifecycle family (all read/mutate a persisted root, not
    # pure frame→frame ops); frozen-reference equality, crash-injection
    # exactly-once replay, sticky retirement, orphan reclaim, time
    # travel, and the stats panel are pinned in tests/test_similarity.py
    # + tests/test_streaming_ann.py.
    "similarity.ivfpq_add": "mutates a persisted index — tested in "
        "test_similarity.py/test_streaming_ann.py",
    "similarity.ivfpq_remove": "mutates a persisted index — tested in "
        "test_similarity.py",
    "similarity.compact_ivfpq_index": "rewrites a persisted index — tested "
        "in test_similarity.py/test_streaming_ann.py",
    "similarity.ivfpq_index_history": "path→list helper over the manifest "
        "dir — tested in test_similarity.py",
    "similarity.ivfpq_index_stats": "reads a persisted index — tested in "
        "test_similarity.py",
    # Index-at-rest pair (bucketed managed table + meta sidecar);
    # equivalence-to-lsh_candidate_pairs, plan shape, probe-then-admit,
    # fresh-catalog re-registration, and param validation are pinned in
    # tests/test_dedup.py.
    "dedup.build_minhash_index": "persists a bucketed table — tested in test_dedup.py",
    "dedup.minhash_probe": "reads a persisted index — tested in test_dedup.py",
    "dedup.compact_minhash_index": "rewrites a persisted bucketed table — "
        "20-admit proliferation/compaction/retirement lifecycle tested in "
        "test_dedup.py",
}


def _run_contract(spec, out, in_ids):
    contract = spec["contract"]
    if contract in ("per_doc", "per_doc_media"):
        assert ids_of(out, spec["id_out"]) == sorted(in_ids), (
            "row-conservation violated: a per-doc operator dropped or "
            "invented ids")
    elif contract in ("subset", "subset_media"):
        got = set(ids_of(out, spec["id_out"]))
        assert got <= set(in_ids), "operator INVENTED ids not in the input"
    elif contract == "pairs":
        rows = out.select(*spec["id_cols"]).collect()
        for r in rows:
            for v in r:
                assert v in in_ids, f"pair output references unknown id {v}"
    elif contract == "no_crash":
        out.collect()
    else:  # per_doc_multi: ids conserved as a SET, multiplicity free
        assert sorted(set(ids_of(out, spec["id_out"]))) == sorted(in_ids)


@pytest.mark.parametrize("variant", list(DOC_VARIANTS))
@pytest.mark.parametrize(
    "name", [n for n, s in OPS.items() if s["input"] == "docs" and s["call"]]
)
def test_docs_operators_adversarial(spark, name, variant):
    spec = OPS[name]
    docs = docs_df(spark, variant)
    in_ids = [r[0] for r in DOC_VARIANTS[variant]]
    out = spec["call"](spark, docs)
    _run_contract(spec, out, in_ids)


@pytest.mark.parametrize("variant", list(DOC_VARIANTS))
def test_ngram_jaccard_bucketed_adversarial(spark, variant, tmp_path_factory):
    import shutil

    docs = docs_df(spark, variant)
    table = f"adv_dd2b_{variant}"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")

    def _cleanup():
        for suffix in ("_prefix", "_sets"):
            spark.sql(f"DROP TABLE IF EXISTS {table}{suffix}")
            shutil.rmtree(f"{warehouse}/{table}{suffix}", ignore_errors=True)

    _cleanup()  # leftovers from a prior crashed run shadow the location
    try:
        out = dd_ops.ngram_jaccard_pairs_bucketed(
            spark, docs, table, num_buckets=2, threshold=0.5
        )
        in_ids = [r[0] for r in DOC_VARIANTS[variant]]
        _run_contract(OPS["dedup.ngram_jaccard_pairs_bucketed"], out, in_ids)
    finally:
        _cleanup()


@pytest.mark.parametrize("variant", list(EMB_VARIANTS))
@pytest.mark.parametrize(
    "name", [n for n, s in OPS.items() if s["input"] == "emb" and s["call"]]
)
def test_embedding_operators_adversarial(spark, name, variant):
    spec = OPS[name]
    emb = emb_df(spark, variant)
    in_ids = [r[0] for r in EMB_VARIANTS[variant]]
    out = spec["call"](spark, emb)
    _run_contract(spec, out, in_ids)


@pytest.mark.parametrize("variant", list(EMB_VARIANTS))
def test_cosine_pairs_within_adversarial(spark, variant):
    from pyspark.sql import functions as F

    emb = emb_df(spark, variant).withColumn("blk", F.lit(0))
    out = s_ops.cosine_pairs_within(emb, block_col="blk", threshold=0.5)
    in_ids = [r[0] for r in EMB_VARIANTS[variant]]
    _run_contract(OPS["similarity.cosine_pairs_within"], out, in_ids)


@pytest.mark.parametrize("variant", list(EMB_VARIANTS))
def test_docs_vec_operators_adversarial(spark, variant):
    dv = docs_vec_df(spark, variant)
    in_ids = [r[0] for r in EMB_VARIANTS[variant]]
    out = c_ops.semantic_dedup_keepers(dv, n_clusters=2)
    _run_contract(OPS["corpus.semantic_dedup_keepers"], out, in_ids)


@pytest.mark.parametrize("variant", list(EDGE_VARIANTS))
@pytest.mark.parametrize("algorithm", ["label", "star"])
def test_connected_components_adversarial(spark, variant, algorithm):
    edges = spark.createDataFrame(EDGE_VARIANTS[variant], EDGE_SCHEMA)
    comp = g_ops.connected_components(edges, algorithm=algorithm)
    rows = comp.collect()
    verts = {
        v for e in EDGE_VARIANTS[variant] for v in e if v is not None
    }
    got = {r["id"] for r in rows}
    assert got <= verts, "components invented vertices"
    for r in rows:
        assert r["component"] is not None, "NULL component label"


@pytest.mark.parametrize("variant", list(EDGE_VARIANTS))
def test_label_propagation_adversarial(spark, variant):
    edges = spark.createDataFrame(EDGE_VARIANTS[variant], EDGE_SCHEMA)
    out = g_ops.label_propagation(edges, rounds=2).collect()
    verts = {
        v for e in EDGE_VARIANTS[variant] for v in e if v is not None
    }
    # NULL-endpoint edges drop the whole edge; the surviving vertex of a
    # half-NULL edge only appears if some fully-non-NULL edge carries it
    assert {r["id"] for r in out} <= verts, "LPA invented vertices"
    for r in out:
        assert r["community"] is not None, "NULL community label"
    if variant == "self_loop":  # self-loop-only vertex keeps its own label
        assert {(r["id"], r["community"]) for r in out} == {(3, 3)}


@pytest.mark.parametrize("variant", list(BIP_VARIANTS))
@pytest.mark.parametrize("cap", [None, 2])
def test_bipartite_project_adversarial(spark, variant, cap):
    edges = spark.createDataFrame(BIP_VARIANTS[variant], BIP_SCHEMA)
    out = g_ops.bipartite_project(edges, left="s", right="p", degree_cap=cap)
    rights = {p for _s, p in BIP_VARIANTS[variant] if p is not None}
    for r in out.collect():
        assert r[0] in rights and r[1] in rights, "projection invented vertices"


@pytest.mark.parametrize("variant", list(MEDIA_VARIANTS))
@pytest.mark.parametrize(
    "name", [n for n, s in OPS.items() if s["input"] == "media" and s["call"]]
)
def test_media_operators_adversarial(spark, name, variant):
    spec = OPS[name]
    media = media_df(spark, variant)
    in_ids = [r[0] for r in MEDIA_VARIANTS[variant]]
    out = spec["call"](spark, media)
    _run_contract(spec, out, in_ids)


# ------------------------------------------------- custom-shaped operators


def test_asof_join_adversarial(spark):
    left = spark.createDataFrame([], "k string, lts bigint, lv string")
    right = spark.createDataFrame([], "k string, rts bigint, rv string")
    one_l = spark.createDataFrame([("a", 5, "x")], "k string, lts bigint, lv string")
    one_r = spark.createDataFrame([("a", 3, "y")], "k string, rts bigint, rv string")
    for lf, rt in [(left, right), (one_l, right), (left, one_r), (one_l, one_r)]:
        out = j_ops.asof_join(lf, rt, by="k", left_ts="lts", right_ts="rts",
                              right_cols=["rv"])
        assert out.count() == lf.count(), "asof_join must conserve left rows"
    # NULL timestamp on the left: row must survive (with NULL match or not),
    # never silently drop.
    null_l = spark.createDataFrame(
        [("a", None, "x"), ("a", 9, "z")], "k string, lts bigint, lv string")
    out = j_ops.asof_join(null_l, one_r, by="k", left_ts="lts",
                          right_ts="rts", right_cols=["rv"])
    assert out.count() == 2, "asof_join dropped a NULL-timestamp left row"


def test_salted_join_adversarial(spark):
    fact = spark.createDataFrame([], "k bigint, f string")
    dim = spark.createDataFrame([], "k bigint, d string")
    one_f = spark.createDataFrame([(1, "f")], "k bigint, f string")
    one_d = spark.createDataFrame([(1, "d")], "k bigint, d string")
    assert j_ops.salted_join(fact, dim, on="k").count() == 0
    assert j_ops.salted_join(one_f, dim, on="k").count() == 0
    assert j_ops.salted_join(one_f, one_d, on="k").count() == 1
    assert j_ops.salted_join(one_f, dim, on="k", how="left").count() == 1, (
        "left salted join must conserve fact rows with no dim match")
    nf = spark.createDataFrame([(None, "f"), (1, "f2")], "k bigint, f string")
    assert j_ops.salted_join(nf, one_d, on="k", how="left").count() == 2, (
        "left salted join dropped a NULL-key fact row")


def test_pipeline_transforms_adversarial(spark):
    empty_blocks = spark.createDataFrame(
        [], "number bigint, hash string, parent_hash string")
    null_blocks = spark.createDataFrame(
        [(5, None, None)], "number bigint, hash string, parent_hash string")
    for dialect in ("cassandra", "csv"):
        assert p_ops.transform_blocks(empty_blocks, dialect).count() == 0
        assert p_ops.transform_blocks(null_blocks, dialect).count() == 1

    empty_tx = spark.createDataFrame([], "hash string, block_number bigint")
    null_tx = spark.createDataFrame([(None, 5)], "hash string, block_number bigint")
    for dialect in ("cassandra", "csv"):
        assert p_ops.transform_transactions(empty_tx, dialect).count() == 0
        assert p_ops.transform_transactions(null_tx, dialect).count() == 1

    tr_schema = "transaction_hash string, block_number bigint, trace_address array<int>"
    for rows in ([], [(None, 5, None)], [("0xab", 7, [0, 2])]):
        df = spark.createDataFrame(rows, tr_schema)
        for dialect in ("cassandra", "csv"):
            assert p_ops.transform_traces(df, dialect).count() == len(rows)

    lg_schema = "transaction_hash string, block_number bigint, topics array<string>"
    for rows in ([], [(None, 5, None)], [("0xab", 7, [])], [("0xcd", 8, ["0x11"])]):
        df = spark.createDataFrame(rows, lg_schema)
        for dialect in ("cassandra", "csv"):
            assert p_ops.transform_logs(df, dialect).count() == len(rows)


def test_enrich_and_latest_block_adversarial(spark):
    from pyspark.sql import functions as F

    txs = spark.createDataFrame([("0xaa", 1)], "hash string, block_number bigint")
    receipts_schema = (
        "transaction_hash string, cumulative_gas_used bigint, gas_used bigint, "
        "contract_address string, root string, status bigint, "
        "effective_gas_price bigint")
    empty_r = spark.createDataFrame([], receipts_schema)
    # inner join: tx without receipt drops — the DOCUMENTED contract
    # (enrichment is defined over (tx, receipt) pairs; a missing receipt is
    # upstream corruption the ingest loop surfaces by count mismatch).
    assert p_ops.enrich_transactions(txs, empty_r).count() == 0
    empty_b = spark.createDataFrame([], "block_id bigint")
    row = p_ops.latest_block(empty_b).collect()
    assert len(row) == 1 and row[0]["max_block_id"] is None


def test_check_constraints_adversarial(spark):
    empty = spark.createDataFrame([], "a bigint, b string")
    rules = [
        {"rule": "not_null", "col": "a"},
        {"rule": "unique", "col": "a"},
        {"rule": "in_range", "col": "a", "lo": 0, "hi": 10},
    ]
    rep = q_ops.check_constraints(empty, rules).collect()
    assert len(rep) == 3
    for r in rep:
        assert r["n_rows"] == 0 and r["n_violations"] == 0 and r["passed"]
    assert q_ops.check_constraints(empty, []).count() == 0


def test_rates_adversarial(spark):
    import datetime as dt

    empty = spark.createDataFrame([], RATE_SCHEMA)
    one = spark.createDataFrame(RATE_VARIANTS["single"], RATE_SCHEMA)
    end = dt.date(2020, 1, 4)
    assert r_ops.densify_rates(empty, end, "USD").count() == 0
    dense = {r["day"]: r["rate"] for r in r_ops.densify_rates(one, end, "USD").collect()}
    assert len(dense) == 3  # 01-02 .. 01-04 inclusive
    # end_date BEFORE the only rate: no interval, no crash, no duplicate days
    assert r_ops.densify_rates(one, dt.date(2020, 1, 1), "USD").count() == 0

    vals = spark.createDataFrame(
        [(1, dt.date(2020, 1, 1), 10.0),   # before first rate -> NULL rate
         (2, dt.date(2020, 1, 3), 10.0),   # covered
         (3, None, 10.0)],                 # NULL date -> row survives, NULL rate
        VALUE_SCHEMA)
    out = {r["vid"]: r for r in r_ops.convert_to_fiat(
        vals, one, value_col="value", date_col="d", currency="USD", end_date=end
    ).collect()}
    assert len(out) == 3, "convert_to_fiat dropped a fact row"
    assert out[1]["fiat_value"] is None
    assert out[2]["fiat_value"] == 20.0
    assert out[3]["fiat_value"] is None
    # empty rates: every fact row survives with NULL conversion
    out2 = r_ops.convert_to_fiat(
        vals, empty, value_col="value", date_col="d", currency="USD", end_date=end)
    assert out2.count() == 3
    assert r_ops.latest_rate_date(empty) is None

    long_empty = spark.createDataFrame([], "date string, currency string, rate double")
    assert r_ops.rates_long_to_map(long_empty).count() == 0
    long_null = spark.createDataFrame(
        [("2020-01-01", "USD", None), ("2020-01-01", "EUR", 1.5)],
        "date string, currency string, rate double")
    m = r_ops.rates_long_to_map(long_null).collect()
    assert len(m) == 1 and m[0]["fiat_values"]["EUR"] == 1.5


def test_codec_kernels_adversarial_bytes():
    """Bytes-level kernels: garbage must be *classified*, not crash the
    classifier; decoders raise ValueError-family errors by contract."""
    import numpy as np
    from graphsense_ethereum_etl_spark.operators import codecs

    for payload in (b"", b"\x00", b"\x89PNG\r\n\x1a\n", b"RIFF1234WAVE", b"P6 garbage"):
        mime = codecs.sniff_mime(payload)
        assert isinstance(mime, str)
    assert codecs.pnm_stream_frames(b"") == []
    try:
        feats = codecs.media_features(b"")
        assert len(feats) == 4
    except ValueError:
        pass  # documented contract: unknown container raises ValueError
    assert codecs.audio_fingerprint(np.zeros(0, dtype=np.int16)) >= 0
    assert codecs.audio_fingerprint(np.zeros(100, dtype=np.int16)) >= 0


# ------------------------------------------------------------ completeness


def test_every_public_operator_is_registered():
    """Reflection gate: every public function in operators/*.py must appear
    in OPS (harnessed) or SKIPS (reason on file). Adding an operator without
    registering it here fails CI."""
    registered = {n.split("[")[0] for n in OPS}
    missing = []
    for m in pkgutil.iter_modules(ops_pkg.__path__):
        mod = importlib.import_module(
            f"graphsense_ethereum_etl_spark.operators.{m.name}")
        for name, fn in vars(mod).items():
            if name.startswith("_") or not callable(fn):
                continue
            if getattr(fn, "__module__", None) != mod.__name__:
                continue
            if not inspect.isfunction(fn):
                continue
            key = f"{m.name}.{name}"
            if key not in registered and key not in SKIPS:
                missing.append(key)
    assert not missing, (
        "public operators without an adversarial-harness entry "
        f"(add to OPS or SKIPS with a reason): {sorted(missing)}")


def test_centroid_classifier_adversarial(spark):
    """Dedicated harness for corpus.centroid_classifier (generic docs
    variants can't provide a labeled two-class split): NULL/empty/
    whitespace text featurizes to the zero vector and still classifies
    (held-out ids conserved, margin defined); a training split missing
    either class raises by contract instead of shipping a one-class
    gate."""
    from graphsense_ethereum_etl_spark.functions.text import hashed_embedding
    from pyspark.sql import functions as F

    rows = [
        (1, "aa bb cc", 1, True),
        (2, None, 0, True),          # NULL text trains as a zero vector
        (3, "", 1, True),
        (4, " \t ", 0, True),
        (5, "aa bb", 1, False),      # held out
        (6, None, 0, False),         # held out, zero-vector inference
    ]
    ex = spark.createDataFrame(
        rows, "doc_id bigint, text string, label int, is_train boolean"
    ).select(
        "doc_id",
        hashed_embedding("text", 8).alias("features"),
        "label",
        "is_train",
    )
    out = c_ops.centroid_classifier(ex)
    got = {r["doc_id"]: r for r in out.collect()}
    assert sorted(got) == [5, 6]
    assert all(got[i]["pred"] in (0, 1) and got[i]["margin"] is not None
               for i in got)

    one_class = ex.filter(F.col("label") == 1)
    with pytest.raises(ValueError, match="both classes"):
        c_ops.centroid_classifier(one_class)

    empty = ex.filter(F.lit(False))
    with pytest.raises(ValueError, match="both classes"):
        c_ops.centroid_classifier(empty)


@pytest.mark.parametrize("variant", list(EDGE_VARIANTS))
def test_triangle_counts_adversarial(spark, variant):
    edges = spark.createDataFrame(EDGE_VARIANTS[variant], EDGE_SCHEMA)
    out = g_ops.triangle_counts(edges).collect()
    verts = {
        v for e in EDGE_VARIANTS[variant] for v in e if v is not None
    }
    assert {r["id"] for r in out} <= verts, "triangles invented vertices"
    # none of the fixtures contains a triangle (empty/single/self-loop/
    # NULL-endpoint): the contract output is EMPTY, not a crash
    assert out == []


def test_bucketized_range_join_adversarial(spark):
    """NULL point values and NULL interval bounds must drop (no cell, no
    residual match — never a crash or a phantom row); empties compose."""
    import graphsense_ethereum_etl_spark.operators.joins as j_ops

    pts = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -5.0)], "pid bigint, v double"
    )
    iv = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, None, 10.0), (2, -10.0, None)],
        "iid bigint, lo double, hi double",
    )
    out = j_ops.bucketized_range_join(pts, iv, "v", "lo", "hi", 4.0)
    assert sorted((r.pid, r.iid) for r in out.collect()) == [(1, 0)]
    empty_p = spark.createDataFrame([], "pid bigint, v double")
    empty_i = spark.createDataFrame([], "iid bigint, lo double, hi double")
    assert j_ops.bucketized_range_join(empty_p, iv, "v", "lo", "hi", 4.0).count() == 0
    assert j_ops.bucketized_range_join(pts, empty_i, "v", "lo", "hi", 4.0).count() == 0


@pytest.mark.parametrize("variant", list(EDGE_VARIANTS))
def test_truss_modes_adversarial(spark, variant):
    """r12 modes on degenerate inputs: ktruss_peel's fixpoint cap-guard
    must not fire on vacuous convergence (triangle-free -> empty dead
    set round 1), and g14's bounded+truncated decomposition must emit
    nothing when no triangle exists — never crash, never invent
    edges."""
    edges = spark.createDataFrame(EDGE_VARIANTS[variant], EDGE_SCHEMA)
    assert g_ops.ktruss_peel(edges, k=4, rounds=None).collect() == []
    assert (
        g_ops.edge_trussness(
            edges, k_max=4, rounds_per_level=1, truncate=True
        ).collect()
        == []
    )
