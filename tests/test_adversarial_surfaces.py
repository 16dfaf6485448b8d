"""Adversarial-input harness, round 2 of coverage (r8, VERDICT r7 item 4):
the r7 harness walks ``operators/*.py``; this file applies the same
reflection-gated discipline to the three surfaces it left out —
``functions/text.py`` (column expressions), ``sinks.py`` (writers:
empty-frame writes, zero-partition compaction, stale locations), and
``streaming/structured.py`` (the batch-evaluable streaming transforms).
The same gate design: every public callable in each module must carry a
harness entry or an explicit SKIP reason, so new functions can't dodge it.

Row contracts here are deliberately the DECLARED ones — e.g. Spark's
``split('', '\\s+') == ['']`` quirk means empty text has token_count 1 in
BOTH engines (documented in functions/text.py), so the harness asserts
bounds and crash-freedom, not a prettier-but-wrong zero.
"""

from __future__ import annotations

import importlib
import inspect

import pytest

import graphsense_ethereum_etl_spark.functions.text as tx
import graphsense_ethereum_etl_spark.sinks as sk
import graphsense_ethereum_etl_spark.streaming.structured as st
from pyspark.sql import functions as F

# --------------------------------------------------------------- fixtures

TEXT_VARIANTS = {
    "empty_frame": [],
    "null_text": [(1, None), (2, None)],
    "empty_text": [(1, ""), (2, "")],
    "whitespace": [(1, " \n\t "), (2, "  ")],
    "punct_only": [(1, "!!! ??? ..."), (2, "@@@")],
    "single": [(7, "The quick brown fox email a@b.co 10.0.0.1")],
}


def text_df(spark, variant):
    return spark.createDataFrame(TEXT_VARIANTS[variant], "doc_id bigint, text string")


EVENT_SCHEMA = "ts timestamp, event_type string, user_id bigint"
EVENT_VARIANTS = {
    "empty": [],
    "null_ts": [(None, "click", 1), ("2024-01-01 00:00:00", "click", 2)],
    "null_key": [("2024-01-01 00:00:00", None, None),
                 ("2024-01-01 00:30:00", "view", 3)],
    "single": [("2024-01-01 00:00:00", "click", 1)],
}


def events_df(spark, variant):
    rows = [
        (None if ts is None else __import__("datetime").datetime.fromisoformat(ts), et, u)
        for ts, et, u in EVENT_VARIANTS[variant]
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


# ---------------------------------------------------- functions/text.py
#
# name → (column builder over the 'text' column, value contract applied to
# every output row). Contracts: "any" (no crash), "nonneg_or_null" (count
# ≥ 0 when present), "ratio_or_null" (in [0,1] when present),
# "array_or_null", "string_or_null".

TEXT_OPS = {
    "tokens": (lambda: tx.tokens("text"), "array_or_null"),
    "token_count": (lambda: tx.token_count("text"), "nonneg_or_null"),
    "distinct_token_count": (lambda: tx.distinct_token_count("text"), "nonneg_or_null"),
    "bpe_ish_tokens": (lambda: tx.bpe_ish_tokens("text"), "array_or_null"),
    "bpe_ish_token_count": (lambda: tx.bpe_ish_token_count("text"), "nonneg_or_null"),
    "shingles": (lambda: tx.shingles("text", 3), "array_or_null"),
    "normalized_text": (lambda: tx.normalized_text("text"), "string_or_null"),
    "fingerprint": (lambda: tx.fingerprint("text"), "string_or_null"),
    "redact_pii": (lambda: tx.redact_pii("text"), "string_or_null"),
    "dup_shingle_ratio": (lambda: tx.dup_shingle_ratio("text", 3), "ratio_or_null"),
    "alpha_ratio": (lambda: tx.alpha_ratio("text"), "ratio_or_null"),
    "mean_token_length": (lambda: tx.mean_token_length("text"), "nonneg_or_null"),
    "stopword_score": (lambda: tx.stopword_score("text", "en"), "nonneg_or_null"),
    "lang_id": (lambda: tx.lang_id("text"), "string_or_null"),
    "hashed_embedding": (lambda: tx.hashed_embedding("text", 8), "array_or_null"),
    "hashed_embedding_tokens": (
        # the tokens-array variant hashed_embedding delegates to (rag1's
        # chunk featurization): drive it through the same text variants
        # via an inline tokenize so NULL/empty text exercises the
        # zero-vector contract
        lambda: tx.hashed_embedding_tokens(
            F.filter(
                F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
                lambda t: t != "",
            ),
            8,
        ),
        "array_or_null",
    ),
    # canonical_url over the TEXT variants: arbitrary non-URL text must
    # never crash the regexes (it degrades to '://' scaffolding strings —
    # garbage-in-garbage-out; the real-URL contracts live in
    # test_text_functions.py's edge-case/idempotence unit)
    "canonical_url": (lambda: tx.canonical_url("text"), "string_or_null"),
    # the Gopher-rule verdict bundle (cur1's stage-1 gate): a pure Catalyst
    # predicate — any text variant must yield a bool or NULL, never crash
    "gopher_keep": (lambda: tx.gopher_keep("text"), "bool_or_null"),
}

TEXT_SKIPS: dict[str, str] = {}


@pytest.mark.parametrize("variant", list(TEXT_VARIANTS))
@pytest.mark.parametrize("name", list(TEXT_OPS))
def test_text_functions_adversarial(spark, name, variant):
    builder, contract = TEXT_OPS[name]
    df = text_df(spark, variant)
    rows = df.select("doc_id", builder().alias("v")).collect()
    # column expressions are per-row: row conservation is structural, but
    # assert it anyway so a future rewrite into a join/agg can't drop rows
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r[0] for r in TEXT_VARIANTS[variant]
    )
    for r in rows:
        v = r["v"]
        if v is None:
            continue
        if contract == "nonneg_or_null":
            assert float(v) >= 0, f"{name} produced negative count {v}"
        elif contract == "ratio_or_null":
            assert 0.0 <= float(v) <= 1.0, f"{name} ratio out of [0,1]: {v}"
        elif contract == "array_or_null":
            assert isinstance(v, list)
        elif contract == "string_or_null":
            assert isinstance(v, str)
        elif contract == "bool_or_null":
            assert isinstance(v, bool)


def test_text_surface_is_registered():
    registered = set(TEXT_OPS) | set(TEXT_SKIPS)
    missing = [
        n
        for n, fn in vars(tx).items()
        if inspect.isfunction(fn)
        and not n.startswith("_")
        and fn.__module__ == tx.__name__
        and n not in registered
    ]
    assert not missing, f"text functions without a harness entry: {missing}"


# ------------------------------------------------------------- sinks.py

ROWS_SCHEMA = "block_id bigint, block_id_group bigint, topic0 string"


def _rows_df(spark, n):
    return spark.createDataFrame(
        [(i, i // 10, f"t{i % 3}") for i in range(n)], ROWS_SCHEMA
    )


@pytest.mark.parametrize("n", [0, 1, 25])
def test_write_partitioned_parquet_adversarial(spark, tmp_path, n):
    path = str(tmp_path / "p")
    sk.write_partitioned_parquet(_rows_df(spark, n), path, table="log")
    assert spark.read.parquet(path).count() == n


def test_write_partitioned_parquet_missing_partition_col(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "block_id bigint, topic0 string")
    path = str(tmp_path / "np")
    sk.write_partitioned_parquet(df, path, table="log")  # degrades, no crash
    assert spark.read.parquet(path).count() == 1


@pytest.mark.parametrize("n", [0, 1, 25])
def test_write_partitioned_csv_adversarial(spark, tmp_path, n):
    path = str(tmp_path / "c")
    sk.write_partitioned_csv(_rows_df(spark, n), path, table="log")
    back = (
        spark.read.schema(ROWS_SCHEMA)
        .options(header="true", sep="|", quote="\x00", compression="gzip")
        .csv(path)
    )
    # partitionBy moves block_id_group into dir names; count is the contract
    assert back.drop("block_id_group").count() == n


@pytest.mark.parametrize("n", [0, 1, 25])
def test_write_bucketed_adversarial(spark, n):
    table = f"adv_bucket_{n}"
    try:
        for _ in range(2):  # overwrite must be rebuild-idempotent
            sk.write_bucketed(_rows_df(spark, n), table, "block_id", 2)
            assert spark.table(table).count() == n
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_write_configuration_roundtrip(spark, tmp_path):
    path = str(tmp_path / "conf")
    sk.write_configuration(spark, path, "eth")
    [r] = spark.read.parquet(path).collect()
    assert (r["block_bucket_size"], r["tx_prefix_length"]) == (1000, 5)


def test_zorder_value_contract(spark):
    with pytest.raises(ValueError, match="no min/max"):
        sk.zorder_value(["a"], [None], [None])
    df = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    [r] = df.select(sk.zorder_value(["a", "b"], [0.0, 0.0], [4.0, 4.0]).alias("z")).collect()
    assert r["z"] is not None


@pytest.mark.parametrize("n", [0, 1, 25])
def test_write_zordered_adversarial(spark, tmp_path, n):
    path = str(tmp_path / "z")
    sk.write_zordered(_rows_df(spark, n), path, ["block_id", "block_id_group"])
    assert spark.read.parquet(path).count() == n


def test_write_zordered_all_null_column(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "a bigint, b bigint"
    )
    path = str(tmp_path / "zn")
    sk.write_zordered(df, path, ["b"])  # no range → degrade to plain write
    assert spark.read.parquet(path).count() == 2


@pytest.mark.parametrize("n", [0, 1, 25])
def test_compact_partitions_adversarial(spark, tmp_path, n):
    path = str(tmp_path / "cp")
    sk.write_partitioned_parquet(_rows_df(spark, n), path, table="log")
    files = sk.compact_partitions(spark, path, target_records_per_file=10)
    assert spark.read.parquet(path).count() == n
    if n == 0:
        assert files == 0


SINK_SKIPS = {
    "write_cassandra": "needs spark-cassandra-connector + live cluster "
                       "(error path unit-tested in test_sources_sinks.py)",
    "table_location": "path-resolution helper (no frame in/out) — "
                      "db-qualified/fresh-session/orphan-cleanup contracts "
                      "pinned in test_dedup.py's index lifecycle tests",
}


def test_sink_surface_is_registered():
    covered = {
        "write_partitioned_parquet", "write_partitioned_csv",
        "write_bucketed", "write_configuration", "zorder_value",
        "write_zordered", "compact_partitions",
    }
    missing = [
        n
        for n, fn in vars(sk).items()
        if inspect.isfunction(fn)
        and not n.startswith("_")
        and fn.__module__ == sk.__name__
        and n not in covered
        and n not in SINK_SKIPS
    ]
    assert not missing, f"sink functions without a harness entry: {missing}"


# -------------------------------------------- streaming/structured.py
#
# The four batch-evaluable transforms run on batch frames here (their
# streaming semantics are covered by tests/test_stateful.py /
# test_streaming_*.py; watermarks are no-ops in batch).


@pytest.mark.parametrize("variant", list(EVENT_VARIANTS))
def test_windowed_event_counts_adversarial(spark, variant):
    out = st.windowed_event_counts(events_df(spark, variant)).collect()
    in_keys = {e[1] for e in EVENT_VARIANTS[variant]}
    assert {r["event_type"] for r in out} <= in_keys
    assert all(r["cnt"] >= 1 for r in out)
    # tumbling: every TIMESTAMPED row lands in exactly one group. NULL event
    # times are dropped by declared contract (they belong to no window —
    # matches streaming watermark semantics; see the function docstring),
    # so the conservation bound excludes them.
    timestamped = sum(1 for e in EVENT_VARIANTS[variant] if e[0] is not None)
    assert sum(r["cnt"] for r in out) == timestamped


@pytest.mark.parametrize("variant", list(EVENT_VARIANTS))
def test_windowed_event_counts_sliding_adversarial(spark, variant):
    out = st.windowed_event_counts(
        events_df(spark, variant), window="1 hour", slide="30 minutes"
    ).collect()
    in_keys = {e[1] for e in EVENT_VARIANTS[variant]}
    assert {r["event_type"] for r in out} <= in_keys


@pytest.mark.parametrize("variant", list(EVENT_VARIANTS))
def test_sessionized_event_counts_adversarial(spark, variant):
    out = st.sessionized_event_counts(events_df(spark, variant)).collect()
    in_users = {e[2] for e in EVENT_VARIANTS[variant]}
    assert {r["user_id"] for r in out} <= in_users
    assert all(r["n_events"] >= 1 for r in out)


@pytest.mark.parametrize("variant", list(EVENT_VARIANTS))
def test_stream_stream_interval_join_adversarial(spark, variant):
    left = events_df(spark, variant)
    right = events_df(spark, "single")
    out = st.stream_stream_interval_join(left, right, key="event_type").collect()
    # inner interval join: no invented keys, no NULL-key matches
    in_keys = {e[1] for e in EVENT_VARIANTS[variant] if e[1] is not None}
    for r in out:
        assert r[1] in in_keys


@pytest.mark.parametrize("variant", list(EVENT_VARIANTS))
def test_dedup_stream_within_watermark_batch_adversarial(spark, variant):
    out = st.dedup_stream_within_watermark(
        events_df(spark, variant), key_cols=["event_type"]
    ).collect()
    in_rows = EVENT_VARIANTS[variant]
    keys = [e[1] for e in in_rows]
    assert len(out) == len(set(keys)) if in_rows else len(out) == 0


# Every public function in streaming/*.py must be named here — either in
# STREAM_COVERED (adversarially driven above) or STREAM_SKIPS (with the
# test file that owns it). The completeness gate below walks the WHOLE
# streaming package (r8: it previously walked only structured.py, which
# is how bloomgate's NULL-fp crash shipped unharnessed for a session).
STREAM_COVERED = {
    "structured.windowed_event_counts",
    "structured.sessionized_event_counts",
    "structured.stream_stream_interval_join",
    "structured.dedup_stream_within_watermark",
}

STREAM_SKIPS = {
    "ann_ingest.run_streaming_ann_add": "streaming driver loop — "
        "stream-equals-manual, resume, and crash-injection exactly-once "
        "contracts in test_streaming_ann.py",
    "ann_ingest.stream_progress": "manifest-token reader — exercised by "
        "every resume test in test_streaming_ann.py",
    "cdf.apply_mv_delta": "gap/regression/delta-init/replay/lock contracts — "
        "deterministic race tests + 3-seed two-instance interleave soak in "
        "test_streaming_cdf.py",
    "cdf.mv_applied_version": "pointer reader — exercised by every MV race "
        "test in test_streaming_cdf.py",
    "cdf.vacuum_mv": "generation GC — retained/debris/lock contracts in "
        "test_streaming_cdf.py::test_vacuum_mv_keeps_published_and_drops_debris",
    "structured.stream_raw_blocks": "needs a live streaming source — covered "
        "by test_stateful.py / sources/datasource tests",
    "structured.run_stream_merge": "streaming driver loop — covered by "
        "CDC-merge stream tests in test_stateful.py",
    "structured.run_stream_to_parquet": "streaming driver loop — covered by "
        "stream tests",
    "bloomgate.ensure_gate_params": "create/verify/mismatch contracts — "
        "test_streaming_bloomgate.py + CLI refuse test in test_cli.py",
    "bloomgate.read_bloom": "missing/empty/corrupt dirs — "
        "test_streaming_bloomgate.py",
    "bloomgate.bloom_gate_batch": "NULL-text/dup/replay contracts — "
        "test_streaming_bloomgate.py (+ the dedup.bloom_* operator harness "
        "in test_adversarial_inputs.py)",
    "bloomgate.run_streaming_bloom_gate": "streaming driver loop — "
        "crash/resume e2e in test_streaming_bloomgate.py + CLI e2e in "
        "test_cli.py",
    "cdf.run_streaming_cdf": "streaming driver loop — history/resume/"
        "tail-follow/merge-commit tests in test_streaming_cdf.py",
    "cdf.run_streaming_mv": "streaming driver loop — commit-tracking/"
        "resume/replay-idempotence tests in test_streaming_cdf.py",
    "cdf.read_streaming_mv": "pointer read — test_streaming_cdf.py",
    "incremental.latest_ingested_block": "resume contract — "
        "test_incremental.py (empty/missing sink cases)",
    "incremental.resolve_range": "empty-range guards — test_incremental.py",
    "incremental.run_incremental": "micro-batch driver loop — crash/resume/"
        "idempotence tests in test_incremental.py + CLI e2e",
    "incremental.transform_and_write_batch": "batch body — golden pipeline "
        "tests via run_incremental",
    "incremental.update_bucket_rollup": "rollup maintenance — "
        "test_incremental.py replay tests",
    "incremental.update_sketch_rollup": "HLL union algebra/replay — "
        "test_incremental.py",
    "incremental.update_topk_rollup": "per-bucket replay safety — "
        "test_incremental.py",
    "incremental.sketch_rollup_hook": "CLI --rollup crash/resume e2e — "
        "test_cli.py",
    "incremental.run_streaming_ingest": "streaming driver loop — "
        "test_stateful.py / datasource tests",
    "incremental.invalidate_from": "reorg path — test_catalog_reorg.py + "
        "versioned soak",
    "neardup.near_dup_gate_batch": "batch-equivalence + NULL handling — "
        "test_streaming_neardup.py",
    "neardup.run_streaming_neardup_gate": "streaming driver loop — "
        "crash/resume in test_streaming_neardup.py",
    "stateful.running_user_totals": "state-recovery test — test_stateful.py",
    "stateful.streaming_first_seen": "state store contract — "
        "test_stateful.py",
}


def test_streaming_surface_is_registered():
    import importlib
    import pkgutil

    import graphsense_ethereum_etl_spark.streaming as stream_pkg

    missing = []
    for m in pkgutil.iter_modules(stream_pkg.__path__):
        mod = importlib.import_module(
            f"graphsense_ethereum_etl_spark.streaming.{m.name}"
        )
        for n, fn in vars(mod).items():
            if (
                inspect.isfunction(fn)
                and not n.startswith("_")
                and fn.__module__ == mod.__name__
            ):
                key = f"{m.name}.{n}"
                if key not in STREAM_COVERED and key not in STREAM_SKIPS:
                    missing.append(key)
    assert not missing, (
        f"streaming functions without a harness entry: {sorted(missing)}"
    )
