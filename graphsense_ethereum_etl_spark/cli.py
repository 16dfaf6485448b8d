"""Command-line driver — the user-facing surface of the engine.

Reference parity: the reference's primary entry points are argparse CLIs
(``eth_cassandra_streaming.py:470-547`` builds the parser, ``:562-658`` the
ingest loop; the CSV variant at ``eth_csv_export.py:380-455,457-607``). This
module exposes the same lifecycle over the Spark engine::

    python -m graphsense_ethereum_etl_spark ingest \
        -w http://node:8545 -o /data/eth -s 0 -e 100000 -b 1000

Subcommands:

``ingest``
    Micro-batch extract → transform → partitioned write with sink-derived
    resume (continue-from-latest unless ``-s`` forces a start, exactly the
    reference's semantics at ``eth_cassandra_streaming.py:588-599`` /
    ``README.md:68-70``), children-before-marker crash consistency, and a
    final ``configuration`` metadata write (K3,
    ``eth_cassandra_streaming.py:653-656``).
``info``
    Print last-synced (node head) and last-ingested (sink resume scan)
    block and exit — the reference's ``-i/--info`` flag (``:589-592``).
``invalidate``
    Chain-reorg handling: drop every bucket partition at/after a block
    across all entity tables (SURVEY.md §7.4.4; no reference equivalent —
    the reference must re-ingest into Cassandra and rely on upserts).
``changes``
    Change data feed of a versioned table (``versioned.py::read_changes``):
    one-shot diff between two committed versions, or ``--stream`` follow
    mode (``streaming/cdf.py`` — checkpointed exactly-once version
    accounting, per-version parquet export) — the incremental-reprocessing
    handle for downstream consumers (re-embed only changed docs, re-run
    dedup only on touched buckets). No reference equivalent.
``corpus``
    Training-corpus curation over any documents parquet: ``dedup``
    (exact / minhash / simhash keeper resolution), ``decontaminate``
    (n-gram overlap vs an eval set), ``score`` (quality/lang/token
    columns), ``sample`` (deterministic hash sample), ``pack``
    (concat-then-split sequence packing bookkeeping), ``chunk``
    (sliding-window token chunks); ``dedup --method semantic`` runs
    SemDeDup over an embedding column. No reference equivalent — the
    LLM-pipeline surface of the engine.
``flagship``
    Run the SURVEY.md §7.2 flagship enrichment slice (the registered,
    oracle-certified ``flagship_enrichment`` query — what the external
    driver smoke-checks) against any testdata tier and print a summary.

Provider URIs: ``http(s)://…`` talks JSON-RPC 2.0 batch to a real node;
``synthetic://<head>`` serves the deterministic generator chain
(sources/generator.py) so the full CLI lifecycle runs hermetically — demos,
tests, and throughput benchmarks need no node.
"""

from __future__ import annotations

import time
from argparse import ArgumentParser, Namespace
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import SparkSession

from .operators.pipelines import CASSANDRA, CSV
from .streaming.incremental import (
    IngestStats,
    invalidate_from,
    latest_ingested_block,
    resolve_range,
    run_incremental,
)

SYNTHETIC_SCHEME = "synthetic://"


def build_parser() -> ArgumentParser:
    """Argument surface mirroring the reference's ``create_parser``
    (eth_cassandra_streaming.py:470-547); sink flags replace the Cassandra
    cluster flags (``-d/--db_nodes``, ``-k/--keyspace``) since the Spark
    engine's sink is a path + format, not a session."""
    parser = ArgumentParser(
        prog="graphsense_ethereum_etl_spark",
        description="Ethereum ETL on Spark: ingest, info, invalidate",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    ingest = sub.add_parser(
        "ingest", help="micro-batch ingest with sink-derived resume"
    )
    ingest.add_argument(
        "-w",
        "--provider-uri",
        dest="provider_uri",
        required=True,
        help="JSON-RPC node URI, or synthetic://<head> for the "
        "deterministic generator chain",
    )
    ingest.add_argument(
        "-o",
        "--sink-root",
        dest="sink_root",
        required=True,
        help="sink directory (one subdir per entity table)",
    )
    ingest.add_argument(
        "-s",
        "--start-block",
        dest="start_block",
        type=int,
        default=None,
        help="start block (default: continue from last ingested block)",
    )
    ingest.add_argument(
        "-e",
        "--end-block",
        dest="end_block",
        type=int,
        default=None,
        help="end block (default: last available block)",
    )
    ingest.add_argument(
        "-b",
        "--batch-size",
        dest="batch_size",
        type=int,
        default=1000,
        help="blocks per micro-batch; rounded up to a bucket multiple so "
        "each batch overwrites whole partitions (default: 1000)",
    )
    ingest.add_argument(
        "-p",
        "--previous-day",
        dest="prev_day",
        action="store_true",
        help="only ingest blocks strictly before today's UTC midnight "
        "(exchange rates for the current day may not exist yet)",
    )
    ingest.add_argument(
        "-i",
        "--info",
        action="store_true",
        help="display block information and exit",
    )
    ingest.add_argument(
        "-t",
        "--timeout",
        dest="timeout",
        type=float,
        default=3600.0,
        help="JSON-RPC timeout in seconds (default: 3600)",
    )
    ingest.add_argument(
        "--bucket-size",
        dest="bucket_size",
        type=int,
        default=1000,
        help="block_id_group bucket size (default: 1000, schema.cql parity)",
    )
    ingest.add_argument(
        "--rpc-batch-size",
        dest="rpc_batch_size",
        type=int,
        default=50,
        help="JSON-RPC calls per HTTP round-trip (default: 50)",
    )
    ingest.add_argument(
        "--sink-format",
        dest="sink_format",
        choices=["parquet", "versioned"],
        default="parquet",
        help="parquet: dynamic partition overwrite; versioned: atomic "
        "manifest-pointer commits (default: parquet)",
    )
    ingest.add_argument(
        "--dialect",
        dest="dialect",
        choices=[CASSANDRA, CSV],
        default=CASSANDRA,
        help="transform dialect: cassandra (binary columns, ','-joined "
        "trace paths) or csv (hex strings, '|'-joined trace paths)",
    )
    ingest.add_argument(
        "--stream",
        action="store_true",
        help="Structured Streaming mode: the ethrpc stream source drives "
        "foreachBatch; resume lives in the stream checkpoint",
    )
    ingest.add_argument(
        "--checkpoint",
        dest="checkpoint",
        default=None,
        help="checkpoint dir for --stream (default: <sink-root>/_checkpoint)",
    )
    ingest.add_argument(
        "--max-blocks-per-batch",
        dest="max_blocks_per_batch",
        type=int,
        default=None,
        help="--stream rate limit: cap blocks per micro-batch (catch-up "
        "after downtime drains in ceil(pending/cap) batches)",
    )
    ingest.add_argument(
        "--rollup",
        dest="rollups",
        action="append",
        default=None,
        metavar="TABLE.COLUMN[:hll|:topk]",
        help="maintain a sketch rollup per block bucket for this raw "
        "column, updated in lockstep with every ingest batch; repeatable. "
        "Default/:hll = HLL distinct count (transactions.from_address = "
        "unique senders) at <sink-root>/rollup_<table>_<column>; :topk = "
        "heavy hitters (most frequent values) at "
        "<sink-root>/rollup_<table>_<column>_topk. Crash-safe: the hook "
        "runs before the batch's marker commit, so a failed update is "
        "replayed on resume — HLL absorbs the duplicate by union "
        "idempotence, topk by whole-bucket partition overwrite",
    )
    ingest.add_argument(
        "--rollup-lg-k",
        dest="rollup_lg_k",
        type=int,
        default=12,
        help="HLL sketch precision for --rollup (default: 12)",
    )
    ingest.add_argument(
        "--rollup-topk-capacity",
        dest="rollup_topk_capacity",
        type=int,
        default=64,
        help="tracked-item capacity for --rollup ...:topk sketches "
        "(Misra-Gries error <= bucket_rows/capacity; default: 64)",
    )

    info = sub.add_parser("info", help="print head / resume state and exit")
    info.add_argument("-w", "--provider-uri", dest="provider_uri", required=True)
    info.add_argument("-o", "--sink-root", dest="sink_root", required=True)
    info.add_argument("-t", "--timeout", dest="timeout", type=float, default=3600.0)
    info.add_argument(
        "--sink-format",
        dest="sink_format",
        choices=["parquet", "versioned"],
        default="parquet",
    )

    rates = sub.add_parser(
        "ingest-rates",
        help="exchange-rates CSV → exchange_rates table (schema.cql:79-82)",
    )
    rates.add_argument(
        "--csv",
        dest="rates_csv",
        required=True,
        help="long-form CSV with columns date,currency,rate",
    )
    rates.add_argument("-o", "--sink-root", dest="sink_root", required=True)

    inv = sub.add_parser(
        "invalidate", help="drop bucket partitions at/after a block (reorg)"
    )
    inv.add_argument("-o", "--sink-root", dest="sink_root", required=True)
    inv.add_argument(
        "--from-block", dest="from_block", type=int, required=True
    )
    inv.add_argument("--bucket-size", dest="bucket_size", type=int, default=1000)
    inv.add_argument(
        "--sink-format",
        dest="sink_format",
        choices=["parquet", "versioned"],
        default="parquet",
    )

    snap = sub.add_parser(
        "snapshot",
        help="inspect / vacuum the cross-entity snapshot catalog of a "
        "versioned sink (one atomic pointer per consistent "
        "block/transaction/trace/log height)",
    )
    snap.add_argument("-o", "--sink-root", dest="sink_root", required=True)
    snap.add_argument(
        "--version", dest="cat_version", type=int, default=None,
        help="inspect a historic catalog version (default: published)",
    )
    snap.add_argument(
        "--asof", dest="asof_height", type=int, default=None,
        help="resolve the catalog AS OF a block height (latest committed "
        "doc at-or-before it) and inspect that version — mutually "
        "exclusive with --version",
    )
    snap.add_argument(
        "--asof-ts", dest="asof_ts", type=int, default=None,
        help="resolve the catalog AS OF a unix timestamp: monotone block "
        "timestamps map it to a height through the newest catalog's "
        "block pin, then as --asof — mutually exclusive with "
        "--version/--asof",
    )
    snap.add_argument(
        "--vacuum-keep", dest="vacuum_keep", type=int, default=None,
        help="trim catalog docs to the newest N and vacuum each table "
        "down to the versions those docs still reference",
    )

    chg = sub.add_parser(
        "changes",
        help="change data feed of a versioned table between two committed "
        "versions (inserts/deletes; updates surface as delete+insert "
        "pairs); costs only the partitions whose data dirs changed",
    )
    chg.add_argument(
        "--table-root",
        dest="table_root",
        required=True,
        help="versioned table root (e.g. <sink-root>/transaction)",
    )
    chg.add_argument(
        "--from-version",
        dest="from_version",
        type=int,
        default=None,
        help="batch: diff base version (required); --stream: first "
        "version to emit on a fresh checkpoint (default: only versions "
        "committed after the stream starts)",
    )
    chg.add_argument(
        "--to-version",
        dest="to_version",
        type=int,
        default=None,
        help="defaults to the latest committed version",
    )
    chg.add_argument(
        "--partition-col", dest="partition_col", default="block_id_group"
    )
    chg.add_argument(
        "--output",
        dest="output",
        default=None,
        help="write the full feed as parquet here; without it only the "
        "per-type summary prints (--stream: one v=<version> subdir per "
        "commit, overwrite-idempotent under replay)",
    )
    chg.add_argument(
        "--stream",
        dest="stream",
        action="store_true",
        help="follow mode (streaming/cdf.py): drain every version "
        "committed since the checkpoint (or --from-version on first "
        "run) through a Structured Streaming availableNow pass — "
        "exactly-once version accounting across invocations",
    )
    chg.add_argument(
        "--checkpoint",
        dest="checkpoint",
        default=None,
        help="--stream: checkpoint dir (required) owning the version "
        "cursor",
    )

    explain = sub.add_parser(
        "explain",
        help="print the physical plan of a registry query (plan review "
        "tooling: check pushdown, broadcasts, exchange counts)",
    )
    explain.add_argument(
        "query",
        help="registry query name (see `explain list`), or 'list'",
    )
    explain.add_argument(
        "--sf-dir", dest="sf_dir", default="/root/testdata/sf0.01",
        help="testdata directory the plan is resolved against",
    )
    explain.add_argument(
        "--mode",
        choices=["simple", "extended", "formatted", "cost"],
        default="formatted",
    )

    flagship = sub.add_parser(
        "flagship",
        help="run the SURVEY.md §7.2 flagship enrichment slice "
        "end-to-end (the registered flagship_enrichment query) and print "
        "a summary",
    )
    flagship.add_argument(
        "--sf-dir", dest="sf_dir", default="/root/testdata/sf0.001",
        help="testdata directory to run against",
    )
    flagship.add_argument(
        "-o", "--output", dest="output", default=None,
        help="optional parquet path for the result",
    )

    corpus = sub.add_parser(
        "corpus",
        help="training-corpus curation: dedup / decontaminate / score / sample",
    )
    corpus.add_argument(
        "operation",
        choices=[
            "dedup", "decontaminate", "score", "sample", "pack", "chunk",
            "dedup-lines", "negatives", "validate", "lm-score", "ann",
            "ann-build", "ann-search", "ann-add", "ann-compact", "ann-stats",
            "embed", "dupspan", "classify",
            "dedup-gate", "wsample", "split", "profile",
            "dedup-index", "dedup-probe", "dedup-compact", "outliers",
            "mix", "tokenize", "curate",
        ],
        help="which curation pass to run over the input documents table",
    )
    corpus.add_argument(
        "-i", "--input", dest="input", required=True, help="documents parquet path"
    )
    corpus.add_argument(
        "-o", "--output", dest="output", default=None,
        help="output parquet path (required for every operation except "
        "dedup-index, whose output IS the --index-table)",
    )
    corpus.add_argument(
        "--method",
        choices=["exact", "minhash", "simhash", "semantic"],
        default="exact",
        help="dedup clustering method (semantic expects an embedding column)",
    )
    corpus.add_argument(
        "--eval-set",
        dest="eval_set",
        help="decontaminate: parquet path of the benchmark/eval documents",
    )
    corpus.add_argument(
        "--ngram", type=int, default=8, help="decontaminate: word n-gram size"
    )
    corpus.add_argument(
        "--rate", type=float, default=0.1, help="sample: keep fraction in [0,1]"
    )
    corpus.add_argument(
        "--salt", default="sample", help="sample: determinism salt"
    )
    corpus.add_argument("--text-col", dest="text_col", default="text")
    corpus.add_argument("--id-col", dest="id_col", default="doc_id")
    corpus.add_argument("--vec-col", dest="vec_col", default="embedding")
    corpus.add_argument(
        "--filter-dir", dest="filter_dir", default=None,
        help="dedup-gate: append-only Bloom word directory (the gate's "
        "constant-size cross-run state; share it across pipelines to "
        "union their dedup scopes)",
    )
    corpus.add_argument(
        "--checkpoint", dest="checkpoint", default=None,
        help="dedup-gate: streaming checkpoint — re-invocations process "
        "only input files not yet seen",
    )
    corpus.add_argument(
        "--m-bits", dest="m_bits", type=int, default=65536,
        help="dedup-gate: Bloom filter size in bits",
    )
    corpus.add_argument(
        "--k-hashes", dest="k_hashes", type=int, default=4,
        help="dedup-gate: probe bits per fingerprint",
    )
    corpus.add_argument(
        "--n-clusters", dest="n_clusters", type=int, default=16,
        help="semantic dedup: k-means block count; ann ivf/ivfpq: "
        "inverted-list count",
    )
    corpus.add_argument(
        "--threshold", type=float, default=0.9,
        help="semantic dedup: cosine near-dup threshold",
    )
    corpus.add_argument(
        "--seq-len", dest="seq_len", type=int, default=256,
        help="pack: tokens per training sequence",
    )
    corpus.add_argument(
        "--bpe-merges", dest="bpe_merges", type=int, default=2,
        help="tokenize: BPE merge rules to train before counting tokens "
        "(0 = plain character counts per word)",
    )
    corpus.add_argument(
        "--shard-col", dest="shard_col", default="source",
        help="pack: shard/partition column",
    )
    corpus.add_argument(
        "--chunk-tokens", dest="chunk_tokens", type=int, default=32,
        help="chunk: tokens per chunk",
    )
    corpus.add_argument(
        "--stride", type=int, default=8, help="chunk: chunk stride in tokens"
    )
    corpus.add_argument(
        "--min-count", dest="min_count", type=int, default=3,
        help="dedup-lines: corpus frequency at which a line is boilerplate",
    )
    corpus.add_argument(
        "--rules",
        help="validate: JSON file with a list of constraint rules "
        "(operators/quality.py rule forms)",
    )
    corpus.add_argument(
        "--fail-on-violation",
        dest="fail_on_violation",
        action="store_true",
        help="validate: exit non-zero if any rule fails (CI-gate mode)",
    )
    corpus.add_argument(
        "--negatives-per-doc", dest="negatives_per_doc", type=int, default=3,
        help="negatives: pseudo-random partners per document",
    )
    corpus.add_argument(
        "--line-tokens", dest="line_tokens", type=int, default=None,
        help="dedup-lines: treat k-token segments as lines "
        "(default: split on real newlines)",
    )
    corpus.add_argument(
        "--no-broadcast-model",
        dest="broadcast_model",
        action="store_false",
        help="lm-score: probe the bigram model with a co-partitioned hash "
        "join instead of a broadcast (for vocabularies beyond broadcast "
        "reach)",
    )
    corpus.add_argument(
        "--queries",
        dest="queries",
        default=None,
        help="ann: parquet of query vectors (same id/vec columns); "
        "defaults to the input itself (all-pairs self-search)",
    )
    corpus.add_argument(
        "--ann-method",
        dest="ann_method",
        choices=["brute", "ivf", "pq", "ivfpq"],
        default="brute",
        help="ann: exact baseline, inverted lists (compute cut), product "
        "quantization (memory cut), or the IVF-PQ composition",
    )
    corpus.add_argument(
        "--k", type=int, default=10, help="ann: neighbors per query"
    )
    corpus.add_argument(
        "--diverse-col", dest="diverse_col", default=None,
        help="ann (brute only): diversity constraint — at most one result "
        "per value of this candidate column per query (context "
        "diversification, operators/similarity.py::diverse_topk)",
    )
    corpus.add_argument(
        "--dim", type=int, default=None,
        help="ann pq/ivfpq: embedding dimension (default: inferred from "
        "the first row)",
    )
    corpus.add_argument(
        "--nprobe", type=int, default=2, help="ann ivf/ivfpq: lists probed"
    )
    corpus.add_argument(
        "--pq-m", dest="pq_m", type=int, default=8,
        help="ann pq/ivfpq: subspace count (codes per vector)",
    )
    corpus.add_argument(
        "--n-codes", dest="n_codes", type=int, default=16,
        help="ann pq/ivfpq: codewords per subspace",
    )
    corpus.add_argument(
        "--rerank", type=int, default=None,
        help="ann pq: exact-rescore the top-R ADC shortlist per query",
    )
    corpus.add_argument(
        "--embed-dim", dest="embed_dim", type=int, default=16,
        help="embed: feature-hash vector width",
    )
    corpus.add_argument(
        "--span-k", dest="span_k", type=int, default=5,
        help="dupspan: duplicated-window width in tokens",
    )
    corpus.add_argument(
        "--label-col", dest="label_col", default="label",
        help="classify: 0/1 label column",
    )
    corpus.add_argument(
        "--train-col", dest="train_col", default="is_train",
        help="classify: boolean train-split column",
    )
    corpus.add_argument(
        "--feature-col", dest="feature_col", default=None,
        help="classify: integer feature-vector column (default: hash-embed "
        "--text-col at --embed-dim on the fly)",
    )
    corpus.add_argument(
        "--weight-col", dest="weight_col", default=None,
        help="wsample: integer weight column (A-ES inclusion probability "
        "tracks it; default: document length in characters)",
    )
    corpus.add_argument(
        "--max-weight", dest="max_weight", type=int, default=64,
        help="wsample: weight clamp (tickets per row are O(weight))",
    )
    corpus.add_argument(
        "--group-col", dest="group_col", default="source",
        help="split: leakage group — every row sharing it lands in the "
        "same split; outliers: robust stats computed within each group",
    )
    corpus.add_argument(
        "--cuts", default="80,90",
        help="split: percent cut points 'train,val' (e.g. 80,90 = "
        "80/10/10 train/val/test)",
    )
    corpus.add_argument(
        "--columns", default=None,
        help="profile: comma-separated column subset (default: all)",
    )
    corpus.add_argument(
        "--approx-distinct", dest="approx_distinct", action="store_true",
        help="profile: HLL distinct counts instead of exact "
        "(drops the multi-distinct Expand — the 100-TB mode)",
    )
    corpus.add_argument(
        "--index-table", dest="index_table", default=None,
        help="dedup-index/dedup-probe/dedup-compact: bucketed managed-table "
        "name of the persisted MinHash band index (survives sessions via "
        "its _mh_meta.json sidecar)",
    )
    corpus.add_argument(
        "--value-col", dest="value_col", default="n_chars",
        help="outliers: numeric column to flag on",
    )
    corpus.add_argument(
        "--token-budget", dest="token_budget", type=int, default=None,
        help="mix: per-source token budget (hash-ordered prefix kept "
        "while the running total fits)",
    )
    corpus.add_argument(
        "--budgets", dest="budgets", default=None,
        help="mix: per-source overrides as src=budget,src=budget",
    )
    corpus.add_argument(
        "--token-col", dest="token_col", default="n_chars",
        help="mix: token-count column the budget is measured in",
    )
    corpus.add_argument(
        "--mad-k", dest="mad_k", type=float, default=5.0,
        help="outliers: flag |x - median| > k * MAD",
    )
    corpus.add_argument(
        "--approx", action="store_true",
        help="outliers: approx_percentile instead of exact (the 100-TB "
        "form; rank error <= 1e-4)",
    )
    corpus.add_argument(
        "--retire-ids", dest="retire_ids", default=None,
        help="dedup-compact: parquet of doc ids whose band keys are dropped "
        "during the rewrite (retirement of deleted documents); ann-compact: "
        "parquet of vector ids tombstoned (ivfpq_remove) before the rewrite",
    )
    corpus.add_argument(
        "--admit", action="store_true",
        help="dedup-probe: append the batch's band keys to the index after "
        "probing (probe-then-admit), so later batches dedup against it",
    )

    mv = sub.add_parser(
        "mv",
        help="maintain a COUNT/SUM materialized view of a versioned table "
        "from its change feed (never rescans the base table); repeated "
        "invocations on one checkpoint roll the view forward exactly once "
        "per commit",
    )
    mv.add_argument(
        "--table-root", dest="table_root", required=True,
        help="versioned table root",
    )
    mv.add_argument(
        "--mv-root", dest="mv_root", required=True,
        help="view root: one immutable parquet dir per applied version "
        "plus an atomically-swapped _CURRENT pointer",
    )
    mv.add_argument(
        "--group", required=True,
        help="comma-separated grouping columns",
    )
    mv.add_argument(
        "--sum", dest="sum_cols", default="",
        help="comma-separated measure columns to SUM (COUNT(*) is always "
        "maintained)",
    )
    mv.add_argument("--count-col", dest="count_col", default="cnt")
    mv.add_argument(
        "--partition-col", dest="partition_col", default="block_id_group"
    )
    mv.add_argument(
        "--checkpoint", dest="checkpoint", required=True,
        help="checkpoint dir owning the version cursor",
    )
    mv.add_argument(
        "--vacuum-keep", dest="vacuum_keep", type=int, default=None,
        help="after draining, delete view generations older than the "
        "newest N (and crash debris newer than the pointer)",
    )
    mv.add_argument(
        "--from-version", dest="from_version", type=int, default=0,
        help="first version to apply on a fresh checkpoint (default 0: "
        "full history — the snapshot feed seeds the view)",
    )

    return parser


def _resolve_provider(
    args: Namespace, rpc_post=None
) -> tuple[Callable, int]:
    """Build (chain_source, head) from the provider URI.

    ``synthetic://<head>`` → generator chain with a fixed head;
    anything else → JSON-RPC transport with an ``eth_blockNumber`` probe.
    ``rpc_post`` (tests) replaces the transport's HTTP POST with a
    recorded fixture — same hook the stream path uses."""
    uri: str = args.provider_uri
    if uri.startswith(SYNTHETIC_SCHEME):
        from .sources.generator import gen_chain

        head = int(uri[len(SYNTHETIC_SCHEME) :])

        def source(spark: SparkSession, lo: int, hi: int):
            return gen_chain(spark, lo, hi)

        return source, head

    from .sources.rpc import JsonRpcTransport, node_head, rpc_chain_source

    transport = JsonRpcTransport(
        uri, timeout=getattr(args, "timeout", 3600.0), post=rpc_post
    )
    rpc_bs = getattr(args, "rpc_batch_size", 50)
    return rpc_chain_source(transport, rpc_batch_size=rpc_bs), node_head(transport)


def _utc_midnight_today() -> int:
    now = datetime.now(timezone.utc)
    return int(
        datetime(now.year, now.month, now.day, tzinfo=timezone.utc).timestamp()
    )


def print_block_info(last_synced: int, last_ingested: int | None) -> None:
    """eth_cassandra_streaming.py:550-559 parity."""
    print(f"Last synced block: {last_synced:,}")
    if last_ingested is None:
        print("Last ingested block: None")
    else:
        print(f"Last ingested block: {last_ingested:,}")


def cmd_ingest(args: Namespace, spark: SparkSession, rpc_post=None) -> IngestStats:
    on_batch = None
    if getattr(args, "rollups", None):
        from .streaming.incremental import sketch_rollup_hook

        on_batch = sketch_rollup_hook(
            spark,
            args.sink_root,
            args.rollups,
            bucket_size=args.bucket_size,
            lg_k=args.rollup_lg_k,
            topk_capacity=getattr(args, "rollup_topk_capacity", 64),
        )
    if args.stream:
        if args.provider_uri.startswith(SYNTHETIC_SCHEME):
            raise SystemExit(
                "--stream needs a JSON-RPC provider (the ethrpc stream "
                "source probes eth_blockNumber); the synthetic chain is "
                "batch-only"
            )
        from .streaming.incremental import run_streaming_ingest

        stats = run_streaming_ingest(
            spark,
            args.provider_uri,
            args.sink_root,
            checkpoint=args.checkpoint or f"{args.sink_root}/_checkpoint",
            start_block=args.start_block or 0,
            end_block=args.end_block,
            max_blocks_per_batch=args.max_blocks_per_batch,
            bucket_size=args.bucket_size,
            dialect=args.dialect,
            sink_format=args.sink_format,
            rpc_batch_size=args.rpc_batch_size,
            rpc_post=rpc_post,
            on_batch=on_batch,
        )
        print(
            f"Stream drained: {stats.batches} micro-batches, "
            f"{stats.blocks} blocks (incl. bucket re-covers)"
        )
        return stats

    source, head = _resolve_provider(args, rpc_post=rpc_post)
    if args.prev_day:
        if args.provider_uri.startswith(SYNTHETIC_SCHEME):
            raise SystemExit(
                "--previous-day needs real block timestamps; "
                "the synthetic chain has no calendar"
            )
        from .sources.rpc import JsonRpcTransport, last_block_before

        transport = JsonRpcTransport(
            args.provider_uri, timeout=args.timeout, post=rpc_post
        )
        head = last_block_before(transport, _utc_midnight_today(), head)
        if head < 0:
            print("No blocks to ingest")
            return IngestStats()

    resume = latest_ingested_block(
        spark, f"{args.sink_root}/block", args.sink_format
    )
    print_block_info(head, resume)
    if args.info:
        return IngestStats()

    rng = resolve_range(resume, head, args.start_block, args.end_block)
    if rng is None:
        print("No blocks to ingest")
        return IngestStats()
    start, end = rng
    t0 = time.perf_counter()
    print(f"Ingesting block range {start:,}:{end:,} into {args.sink_root}")
    stats = run_incremental(
        spark,
        source,
        args.sink_root,
        head=head,
        start_block=args.start_block,
        end_block=args.end_block,
        batch_size=args.batch_size,
        bucket_size=args.bucket_size,
        dialect=args.dialect,
        sink_format=args.sink_format,
        on_batch=on_batch,
    )
    dt = time.perf_counter() - t0
    rate = stats.blocks / dt if dt > 0 else float("inf")
    print(
        f"Processed block range {start:,}:{end:,} "
        f"({stats.batches} batches, {rate:.1f} blocks/s)"
    )

    from .sinks import write_configuration

    write_configuration(
        spark,
        f"{args.sink_root}/configuration",
        keyspace=args.sink_root.rstrip("/").rsplit("/", 1)[-1],
        bucket_size=args.bucket_size,
    )
    return stats


def cmd_info(args: Namespace, spark: SparkSession, rpc_post=None) -> IngestStats:
    _, head = _resolve_provider(args, rpc_post=rpc_post)
    resume = latest_ingested_block(
        spark, f"{args.sink_root}/block", args.sink_format
    )
    print_block_info(head, resume)
    return IngestStats()


def cmd_ingest_rates(args: Namespace, spark: SparkSession) -> IngestStats:
    """Long-form rates CSV → the ``exchange_rates`` table shape
    (date, fiat_values map<string,float> — schema.cql:79-82). The reference
    deprecates in-driver rates ingest (README.md:83-87) but still creates
    the table; this subcommand keeps the table's write path first-class so
    ``convert_to_fiat`` (operators/rates.py) has an engine-native source."""
    from .operators.rates import rates_long_to_map

    long_df = spark.read.option("header", "true").csv(args.rates_csv)
    out = rates_long_to_map(long_df)
    out.coalesce(1).write.mode("overwrite").parquet(
        f"{args.sink_root}/exchange_rates"
    )
    n = spark.read.parquet(f"{args.sink_root}/exchange_rates").count()
    print(f"Ingested {n} exchange-rate days into {args.sink_root}/exchange_rates")
    stats = IngestStats()
    stats.rows["exchange_rates"] = n
    return stats


def cmd_invalidate(args: Namespace, spark: SparkSession) -> IngestStats:
    removed = invalidate_from(
        spark,
        args.sink_root,
        args.from_block,
        bucket_size=args.bucket_size,
        sink_format=args.sink_format,
    )
    for name in removed:
        print(f"removed {name}")
    print(f"Invalidated {len(removed)} partitions from block {args.from_block:,}")
    return IngestStats()


def cmd_snapshot(args: Namespace, spark: SparkSession) -> IngestStats:
    """Inspect or vacuum the cross-entity snapshot catalog (snapshots.py):
    prints the published (or a historic) catalog version, each entity's
    pinned table version, and its max block height read THROUGH the
    catalog — the consistent multi-table view, never a torn one."""
    from pyspark.sql import functions as F

    from .snapshots import SnapshotCatalog, has_catalog

    if not has_catalog(args.sink_root):
        print(f"no snapshot catalog at {args.sink_root}")
        return IngestStats()
    cat = SnapshotCatalog(spark, args.sink_root)
    if args.vacuum_keep is not None:
        removed = cat.vacuum(keep_catalogs=args.vacuum_keep)
        for t, dirs in sorted(removed.items()):
            print(f"vacuumed {t}: {len(dirs)} data dirs removed")
    if getattr(args, "asof_ts", None) is not None:
        if args.cat_version is not None or getattr(args, "asof_height", None) is not None:
            raise SystemExit(
                "snapshot: --asof-ts is exclusive with --version/--asof"
            )
        try:
            version = cat.version_asof_timestamp(args.asof_ts)
        except FileNotFoundError as exc:
            raise SystemExit(f"snapshot: {exc}")
        print(f"as of timestamp {args.asof_ts}: catalog version {version}")
    elif getattr(args, "asof_height", None) is not None:
        if args.cat_version is not None:
            raise SystemExit("snapshot: --asof and --version are exclusive")
        try:
            version = cat.version_asof(args.asof_height)
        except FileNotFoundError as exc:
            raise SystemExit(f"snapshot: {exc}")
        print(f"as of height {args.asof_height}: catalog version {version}")
    else:
        version = (
            args.cat_version
            if args.cat_version is not None
            else cat.current_version()
        )
    try:
        doc = cat._doc(version)
    except FileNotFoundError:
        raise SystemExit(
            f"snapshot: catalog version {version} does not exist at "
            f"{args.sink_root} (vacuumed or never committed; history: "
            f"{cat.history()})"
        )
    print(f"catalog version {version} (history: {cat.history()})")
    for t in sorted(cat.tables):
        pinned = doc["tables"].get(t)
        if pinned is None:
            print(f"  {t}: never published")
            continue
        df = cat.read(t, version=version)
        height = (
            df.agg(F.max("block_id")).collect()[0][0]
            if "block_id" in df.columns
            else None
        )
        print(f"  {t}: table version {pinned}, max block {height}")
    return IngestStats()


def cmd_changes(args: Namespace, spark: SparkSession) -> IngestStats:
    """CDF read of a versioned table: one-shot diff
    (versioned.py::read_changes) or --stream follow mode
    (streaming/cdf.py::run_streaming_cdf)."""
    from pyspark.sql import functions as F

    from .versioned import VersionedTable

    if getattr(args, "stream", False):
        if not args.checkpoint:
            raise SystemExit("changes --stream requires --checkpoint")
        from .streaming.cdf import run_streaming_cdf

        seen: list[int] = []

        def handle(feed, version: int) -> None:
            if args.output:
                feed.write.mode("overwrite").parquet(
                    f"{args.output}/v={version}"
                )
                feed = spark.read.parquet(f"{args.output}/v={version}")
            counts = {
                r["_change_type"]: r["cnt"]
                for r in feed.groupBy("_change_type")
                .agg(F.count("*").alias("cnt"))
                .collect()
            }
            seen.append(version)
            print(
                f"v{version}: {counts.get('insert', 0):,} inserts, "
                f"{counts.get('delete', 0):,} deletes"
            )

        run_streaming_cdf(
            spark,
            args.table_root,
            handle,
            checkpoint=args.checkpoint,
            partition_col=args.partition_col,
            start_version=args.from_version,
        )
        print(f"Drained {len(seen)} new version(s)")
        return IngestStats()

    if args.from_version is None:
        raise SystemExit("changes requires --from-version (or --stream)")
    t = VersionedTable(spark, args.table_root, partition_col=args.partition_col)
    to_version = args.to_version
    if to_version is None:
        hist = t.history()
        if not hist:
            raise SystemExit(f"no committed versions at {args.table_root}")
        to_version = hist[-1]
    feed = t.read_changes(args.from_version, to_version)
    if args.output:
        feed.write.mode("overwrite").parquet(args.output)
        feed = spark.read.parquet(args.output)  # summarize what was written
    counts = {
        r["_change_type"]: r["cnt"]
        for r in feed.groupBy("_change_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    print(
        f"Changes v{args.from_version} -> v{to_version}: "
        f"{counts.get('insert', 0):,} inserts, "
        f"{counts.get('delete', 0):,} deletes"
        + (f" (written to {args.output})" if args.output else "")
    )
    return IngestStats()


def cmd_corpus(args: Namespace, spark: SparkSession) -> IngestStats:
    """Corpus curation passes (operators/corpus.py compositions): reads the
    input documents parquet, writes the result parquet, prints a one-line
    summary. No reference equivalent — this is the LLM-training-pipeline
    surface of the engine."""
    from .operators.corpus import dedup_keepers, hash_sample, score_documents

    if args.output is None and args.operation not in (
        "dedup-index", "dedup-compact", "ann-compact"
    ):
        raise SystemExit(f"corpus {args.operation} requires -o/--output")
    # ann-search's and ann-compact's -i names a persisted INDEX directory,
    # not a parquet table; dedup-gate reads it guarded below (an input dir
    # with no files yet is a normal state for an incremental gate, not an
    # error); dedup-compact operates on the index table itself; its -i is
    # ignored
    docs = (
        None
        if args.operation
        in ("ann-search", "ann-compact", "ann-stats", "dedup-gate",
            "dedup-compact")
        else spark.read.parquet(args.input)
    )
    if args.operation == "dedup-gate":
        # Streaming Bloom-filter dedup gate (streaming/bloomgate.py):
        # constant-size cross-run state, survivors APPEND to the output.
        # Unlike the batch passes this is incremental by construction —
        # rerunning after new files land in the input dir gates only the
        # new files against the accumulated filter.
        from .streaming.bloomgate import run_streaming_bloom_gate

        if not args.filter_dir or not args.checkpoint:
            raise SystemExit(
                "corpus dedup-gate: --filter-dir and --checkpoint are required"
            )
        try:
            docs = spark.read.parquet(args.input)
            docs.schema  # force resolution
        except Exception:
            # incremental gate invoked before any input file landed —
            # a normal pipeline state, not an error
            print(
                f"corpus dedup-gate: no input files in {args.input} yet — "
                "nothing to gate"
            )
            return IngestStats()
        stream = (
            spark.readStream.schema(docs.schema)
            # one micro-batch per input file: each file probes the filter
            # as updated by the files before it (the gate's batch-sequence
            # semantics)
            .option("maxFilesPerTrigger", 1)
            .parquet(args.input)
        )
        run_streaming_bloom_gate(
            stream,
            args.output,
            args.filter_dir,
            args.checkpoint,
            text_col=args.text_col,
            id_col=args.id_col,
            m_bits=args.m_bits,
            k_hashes=args.k_hashes,
        )
        try:
            n = spark.read.parquet(args.output).count()
        except Exception:
            n = 0  # zero survivors ever -> no output dir yet
        print(f"corpus dedup-gate: {n:,} survivor rows in {args.output}")
        return IngestStats()
    if args.operation == "dedup":
        if args.method == "semantic":
            from .operators.corpus import semantic_dedup_keepers

            out = semantic_dedup_keepers(
                docs,
                n_clusters=args.n_clusters,
                threshold=args.threshold,
                id_col=args.id_col,
                vec_col=args.vec_col,
            )
        else:
            out = dedup_keepers(
                docs, method=args.method, text_col=args.text_col, id_col=args.id_col
            )
    elif args.operation == "decontaminate":
        if not args.eval_set:
            raise SystemExit("corpus decontaminate requires --eval-set")
        from .operators.decontam import ngram_contamination

        out = ngram_contamination(
            docs,
            spark.read.parquet(args.eval_set),
            n=args.ngram,
            text_col=args.text_col,
            id_col=args.id_col,
        )
    elif args.operation == "score":
        out = score_documents(docs, text_col=args.text_col, id_col=args.id_col)
    elif args.operation == "pack":
        from .operators.corpus import pack_sequences

        out = pack_sequences(
            docs,
            seq_len=args.seq_len,
            shard_col=args.shard_col,
            text_col=args.text_col,
            id_col=args.id_col,
        )
    elif args.operation == "chunk":
        from .operators.corpus import chunk_documents

        out = chunk_documents(
            docs,
            chunk_tokens=args.chunk_tokens,
            stride=args.stride,
            text_col=args.text_col,
            id_col=args.id_col,
        )
    elif args.operation == "dedup-lines":
        from .operators.corpus import dedup_lines

        out = dedup_lines(
            docs,
            min_count=args.min_count,
            line_tokens=args.line_tokens,
            text_col=args.text_col,
            id_col=args.id_col,
        )
    elif args.operation == "negatives":
        from .operators.corpus import negative_pairs

        out = negative_pairs(
            docs, k=args.negatives_per_doc, id_col=args.id_col
        )
    elif args.operation == "lm-score":
        from .operators.corpus import bigram_commonness

        out = bigram_commonness(
            docs,
            text_col=args.text_col,
            id_col=args.id_col,
            broadcast_model=args.broadcast_model,
        )
    elif args.operation == "validate":
        import json as _json

        from .operators.quality import check_constraints

        if not args.rules:
            raise SystemExit("corpus validate requires --rules rules.json")
        with open(args.rules) as fh:
            rules = _json.load(fh)
        out = check_constraints(docs, rules)
        report = out.collect()
        for r in report:
            status = "PASS" if r["passed"] else "FAIL"
            print(
                f"{status} {r['rule']}({r['col']}): "
                f"{r['n_violations']}/{r['n_rows']} violations"
            )
        out.write.mode("overwrite").parquet(args.output)
        if args.fail_on_violation and any(not r["passed"] for r in report):
            raise SystemExit(2)
        n = len(report)
        print(f"corpus validate: wrote {n} rule rows to {args.output}")
        return IngestStats()
    elif args.operation == "embed":
        from pyspark.sql import functions as F

        from .functions.text import hashed_embedding

        out = docs.select(
            F.col(args.id_col),
            hashed_embedding(args.text_col, dim=args.embed_dim)
            .cast("array<double>")
            .alias(args.vec_col),
        )
    elif args.operation == "dupspan":
        from .operators.dedup import dupspan_coverage

        out = dupspan_coverage(
            docs, k=args.span_k, text_col=args.text_col, id_col=args.id_col
        )
    elif args.operation == "classify":
        from pyspark.sql import functions as F

        from .operators.corpus import centroid_classifier

        if args.feature_col is None:
            from .functions.text import hashed_embedding

            examples = docs.withColumn(
                "_features", hashed_embedding(args.text_col, dim=args.embed_dim)
            )
            feature_col = "_features"
        else:
            examples = docs
            feature_col = args.feature_col
        out = centroid_classifier(
            examples,
            id_col=args.id_col,
            feature_col=feature_col,
            label_col=args.label_col,
            train_col=args.train_col,
        )
    elif args.operation == "ann-build":
        from .operators.similarity import build_ivfpq_index

        dim = args.dim
        if dim is None:
            first = docs.select(args.vec_col).first()
            if first is None or first[0] is None:
                raise SystemExit("corpus ann-build: cannot infer --dim (empty input)")
            dim = len(first[0])
        build_ivfpq_index(
            docs, args.output, dim=dim, n_clusters=args.n_clusters,
            m=args.pq_m, n_codes=args.n_codes,
            id_col=args.id_col, vec_col=args.vec_col,
        )
        n = spark.read.parquet(f"{args.output}/codes").count()
        print(f"corpus ann-build: indexed {n:,} vectors at {args.output}")
        return IngestStats()
    elif args.operation == "ann-search":
        from .operators.similarity import ivfpq_search

        # -i names the INDEX here; --queries the query panel (required)
        if not args.queries:
            raise SystemExit("corpus ann-search requires --queries")
        out = ivfpq_search(
            spark, args.input, spark.read.parquet(args.queries),
            nprobe=args.nprobe, k=args.k,
        )
    elif args.operation == "ann-add":
        from .operators.similarity import ivfpq_add

        # -i is the new-vector batch; -o the existing index root (the
        # same slot ann-build wrote it to)
        stats = ivfpq_add(
            spark, args.output, docs, id_col=args.id_col, vec_col=args.vec_col
        )
        drift = (
            f"{stats['drift_ratio']:.3f}"
            if stats["drift_ratio"] is not None
            else "n/a"
        )
        print(
            f"corpus ann-add: +{stats['added']:,} vectors at {args.output} "
            f"(drift ratio {drift} vs build baseline)"
        )
        return IngestStats()
    elif args.operation == "ann-stats":
        from .operators.similarity import ivfpq_index_stats

        # -i is the index root (like ann-search); the per-cluster
        # occupancy/fit panel lands at -o
        out = ivfpq_index_stats(spark, args.input)
    elif args.operation == "ann-compact":
        from .operators.similarity import compact_ivfpq_index, ivfpq_remove

        # -i is the index root (like ann-search); --retire-ids tombstones
        # before the rewrite applies them physically
        if args.retire_ids:
            ivfpq_remove(spark, args.input, spark.read.parquet(args.retire_ids))
        info = compact_ivfpq_index(spark, args.input)
        print(
            f"corpus ann-compact: {args.input} rewritten; "
            f"{info['rows']:,} vectors, {info['files_before']} -> "
            f"{info['files_after']} files"
        )
        return IngestStats()
    elif args.operation == "ann":
        from .operators.similarity import (
            brute_force_topk,
            ivf_topk,
            ivfpq_topk,
            pq_topk,
        )

        queries = spark.read.parquet(args.queries) if args.queries else docs
        ids = dict(id_col=args.id_col, vec_col=args.vec_col)
        if args.diverse_col and args.ann_method != "brute":
            raise SystemExit(
                "corpus ann: --diverse-col requires --ann-method brute "
                "(the constrained argmax needs exact scores)"
            )
        if args.ann_method == "brute":
            if args.diverse_col:
                from .operators.similarity import diverse_topk

                out = diverse_topk(
                    docs, queries, k=args.k, group_col=args.diverse_col, **ids
                )
            else:
                out = brute_force_topk(docs, queries, k=args.k, **ids)
        elif args.ann_method == "ivf":
            out = ivf_topk(
                docs, queries, n_clusters=args.n_clusters,
                nprobe=args.nprobe, k=args.k, **ids,
            )
        else:
            dim = args.dim
            if dim is None:
                first = docs.select(args.vec_col).first()
                if first is None or first[0] is None:
                    raise SystemExit("corpus ann: cannot infer --dim (empty input)")
                dim = len(first[0])
            if args.ann_method == "pq":
                out = pq_topk(
                    docs, queries, dim=dim, m=args.pq_m,
                    n_codes=args.n_codes, k=args.k, rerank=args.rerank, **ids,
                )
            else:
                out = ivfpq_topk(
                    docs, queries, dim=dim, n_clusters=args.n_clusters,
                    nprobe=args.nprobe, m=args.pq_m,
                    n_codes=args.n_codes, k=args.k, **ids,
                )
    elif args.operation == "dedup-index":
        from .operators.dedup import build_minhash_index

        if not args.index_table:
            raise SystemExit("corpus dedup-index requires --index-table")
        build_minhash_index(
            docs, args.index_table, text_col=args.text_col, id_col=args.id_col
        )
        n = spark.table(args.index_table).count()
        print(
            f"corpus dedup-index: {n:,} band keys in table {args.index_table}"
        )
        return IngestStats()
    elif args.operation == "dedup-probe":
        from .operators.dedup import minhash_probe

        if not args.index_table:
            raise SystemExit("corpus dedup-probe requires --index-table")
        out = minhash_probe(
            docs, args.index_table, text_col=args.text_col,
            id_col=args.id_col, admit=args.admit,
        )
    elif args.operation == "dedup-compact":
        from .operators.dedup import compact_minhash_index

        if not args.index_table:
            raise SystemExit("corpus dedup-compact requires --index-table")
        retire = (
            spark.read.parquet(args.retire_ids).select(args.id_col)
            if args.retire_ids
            else None
        )
        compact_minhash_index(spark, args.index_table, retire_ids=retire)
        n = spark.table(args.index_table).count()
        print(
            f"corpus dedup-compact: {args.index_table} rewritten into its "
            f"bucket layout; {n:,} band keys"
            + (f" (retired ids from {args.retire_ids})" if args.retire_ids else "")
        )
        return IngestStats()
    elif args.operation == "outliers":
        from pyspark.sql import functions as _F

        from .operators.quality import grouped_outliers

        # one exact count_distinct pass bounds the |groups|-sized med/mad
        # relations so the attach-back broadcast is size-gated (NULL
        # groups form their own stratum, hence +1)
        n_groups = docs.agg(_F.count_distinct(args.group_col)).first()[0] + 1
        out = grouped_outliers(
            docs, args.value_col, args.group_col, k=args.mad_k,
            exact=not args.approx, n_groups_bound=n_groups,
        )
    elif args.operation == "curate":
        from .functions.text import gopher_keep
        from .operators.corpus import dedup_keepers, hash_sample

        # the cur1 funnel as a CLI pass: Gopher gate -> exact-dedup
        # keepers -> deterministic hash sample; survivors land at -o
        gated = docs.filter(gopher_keep(args.text_col))
        keepers = (
            dedup_keepers(gated, text_col=args.text_col, id_col=args.id_col)
            .filter("keep")
            .select(args.id_col)
        )
        dd = gated.join(keepers, args.id_col, "left_semi")
        out = hash_sample(dd, args.rate, id_col=args.id_col, salt=args.salt)
    elif args.operation == "mix":
        from .operators.corpus import token_budget_mix

        if args.token_budget is None:
            raise SystemExit("corpus mix requires --token-budget")
        overrides = None
        if args.budgets:
            try:
                overrides = {
                    k: int(v)
                    for k, v in (kv.split("=") for kv in args.budgets.split(","))
                }
            except ValueError:
                raise SystemExit(
                    "corpus mix: --budgets must be src=budget[,src=budget...]"
                )
        out = token_budget_mix(
            docs, budget=args.token_budget, token_col=args.token_col,
            source_col=args.group_col, id_col=args.id_col,
            budgets=overrides,
        )
    elif args.operation == "wsample":
        from pyspark.sql import functions as F

        from .operators.corpus import weighted_sample

        if args.weight_col is None:
            docs = docs.withColumn(
                "_w", F.length(F.coalesce(F.col(args.text_col), F.lit("")))
            )
            weight_col = "_w"
        else:
            weight_col = args.weight_col
        out = weighted_sample(
            docs, k=args.k, weight_col=weight_col, id_col=args.id_col,
            salt=args.salt, max_weight=args.max_weight,
        )
        if weight_col == "_w":
            out = out.drop("_w")
    elif args.operation == "split":
        from .operators.corpus import grouped_split

        try:
            lo, hi = (int(x) for x in args.cuts.split(","))
        except ValueError:
            raise SystemExit("corpus split: --cuts must be 'LO,HI' integers")
        out = grouped_split(
            docs, group_col=args.group_col, cuts=(lo, hi), salt=args.salt
        )
    elif args.operation == "tokenize":
        from .operators.corpus import bpe_token_counts

        out = bpe_token_counts(
            docs,
            merges=args.bpe_merges,
            text_col=args.text_col,
            id_col=args.id_col,
        )
    elif args.operation == "profile":
        from .operators.quality import profile_table

        cols = args.columns.split(",") if args.columns else None
        out = profile_table(
            docs, columns=cols, exact_distinct=not args.approx_distinct
        )
        for r in out.collect():
            al = f"  avg_len={r.avg_len}" if r.avg_len is not None else ""
            print(
                f"{r['column']}: rows={r.n_rows} nulls={r.n_nulls} "
                f"distinct={r.n_distinct}{al}"
            )
    else:
        out = hash_sample(docs, rate=args.rate, id_col=args.id_col, salt=args.salt)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"corpus {args.operation}: wrote {n:,} rows to {args.output}")
    return IngestStats()


def cmd_explain(args: Namespace, spark: SparkSession) -> IngestStats:
    """Plan-review tooling: resolve a registry query against real testdata
    and print its plan — the CLI form of the pushdown/broadcast checks
    tests/test_plans.py pins mechanically."""
    from .queries import REGISTRY

    if args.query == "list":
        for name in REGISTRY:
            print(name)
        return IngestStats()
    if args.query not in REGISTRY:
        raise SystemExit(
            f"unknown query {args.query!r} — `explain list` shows all "
            f"{len(REGISTRY)} registered names"
        )
    df = REGISTRY[args.query].fn(spark, args.sf_dir)
    print(df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), args.mode
    ))
    return IngestStats()


def cmd_flagship(args: Namespace, spark: SparkSession) -> IngestStats:
    """The driver smoke check, human-runnable: execute the registered
    flagship_enrichment query (source -> derive -> broadcast join ->
    grouped agg) against --sf-dir, optionally write the result, print a
    one-line summary."""
    from pyspark.sql import functions as F

    from .queries import REGISTRY

    df = REGISTRY["flagship_enrichment"].fn(spark, args.sf_dir)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        df = spark.read.parquet(args.output)
    rows = df.count()
    top = df.orderBy(F.col("revenue").desc()).limit(3).collect()
    peaks = ", ".join(
        f"bucket {r.bucket}/{r.segment}: {r.n_orders} orders" for r in top
    )
    print(
        f"flagship enrichment over {args.sf_dir}: {rows} (bucket, segment) "
        f"groups; top by revenue -> {peaks}"
        + (f"; written to {args.output}" if args.output else "")
    )
    return IngestStats()


def cmd_mv(args: Namespace, spark: SparkSession) -> IngestStats:
    """Maintained aggregate view over a versioned table's change feed
    (streaming/cdf.py::run_streaming_mv — k8's delta rule, operational
    form): each invocation drains every commit since the checkpoint and
    rolls the view forward once per version; the base table is never
    rescanned."""
    from .streaming.cdf import read_streaming_mv, run_streaming_mv

    run_streaming_mv(
        spark,
        args.table_root,
        args.mv_root,
        group_cols=args.group.split(","),
        sum_cols=[c for c in args.sum_cols.split(",") if c],
        checkpoint=args.checkpoint,
        count_col=args.count_col,
        partition_col=args.partition_col,
        start_version=args.from_version,
    )
    if args.vacuum_keep is not None:
        from .streaming.cdf import vacuum_mv

        removed = vacuum_mv(args.mv_root, keep=args.vacuum_keep)
        if removed:
            print(f"mv: vacuumed {len(removed)} old generation(s)")
    try:
        mv = read_streaming_mv(spark, args.mv_root)
        print(f"mv: view at {args.mv_root} has {mv.count():,} groups")
    except FileNotFoundError:
        print(f"mv: no versions applied yet at {args.mv_root}")
    return IngestStats()


def main(
    argv: list[str] | None = None,
    spark: SparkSession | None = None,
    rpc_post=None,
) -> IngestStats:
    """Entry point. ``spark`` is injectable for tests; the default builds
    the standard local session (session.py — AQE, UTC, Arrow). ``rpc_post``
    (tests) overrides the JSON-RPC HTTP POST with a recorded fixture."""
    args = build_parser().parse_args(argv)
    if spark is None:
        from .session import get_spark

        spark = get_spark(app_name=f"etl-{args.command}")
    if args.command == "ingest":
        return cmd_ingest(args, spark, rpc_post=rpc_post)
    if args.command == "info":
        return cmd_info(args, spark, rpc_post=rpc_post)
    if args.command == "ingest-rates":
        return cmd_ingest_rates(args, spark)
    if args.command == "explain":
        return cmd_explain(args, spark)
    if args.command == "flagship":
        return cmd_flagship(args, spark)
    if args.command == "corpus":
        return cmd_corpus(args, spark)
    if args.command == "changes":
        return cmd_changes(args, spark)
    if args.command == "snapshot":
        return cmd_snapshot(args, spark)
    if args.command == "mv":
        return cmd_mv(args, spark)
    return cmd_invalidate(args, spark)
