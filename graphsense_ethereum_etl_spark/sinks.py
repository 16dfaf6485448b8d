"""Sinks (SURVEY.md §2.12).

Primary sink: partitioned Parquet — ``partitionBy(block_id_group)`` replaces
the reference's manual Cassandra bucket keys (schema.cql:26,76,101), and
``sortWithinPartitions`` replaces its clustering order so Parquet row-group
min/max stats give the same range-scan locality (block_id) and secondary
access path (topic0) via row-group skipping.

Secondary sink: partitioned gzip CSV with the reference's per-table dialects
(K2: logs use '|' + QUOTE_NONE, eth_csv_export.py:574-580; 1000-block files
in 1M-block dirs via the derived bucket columns + maxRecordsPerFile).

The Cassandra connector itself (K1) needs the spark-cassandra-connector jar
and a live cluster — neither exists here; ``write_cassandra`` documents the
exact call and raises a clear error if the connector is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Clustering order at rest per table (schema.cql:26,76,101-102).
SORT_COLUMNS: dict[str, list[str]] = {
    "block": ["block_id"],
    "transaction": ["tx_hash_prefix", "tx_hash"],
    "trace": ["block_id", "trace_index"],
    "log": ["block_id", "topic0", "log_index"],
}

CSV_DIALECTS: dict[str, dict[str, str]] = {
    "log": {"sep": "|", "quote": " ", "escape": " "},
}


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    table: str,
    partition_col: str = "block_id_group",
    mode: str = "overwrite",
) -> None:
    """Partition-pruned, clustered Parquet write. ``block_id_group`` pruning
    replaces CQL partition keys; in-file sort order replaces clustering
    columns (row-group skipping on block_id / topic0)."""
    # clustering is an at-rest locality optimization, not a semantic
    # requirement: sort only by the clustering columns actually present so a
    # projected/partial frame writes instead of failing analysis
    sort_cols = [c for c in SORT_COLUMNS.get(table, []) if c in df.columns]
    writer_df = df
    partitioned = partition_col in df.columns
    if partitioned:
        writer_df = df.repartition(F.col(partition_col))
    if sort_cols:
        # the partition column must LEAD the clustering sort: the dynamic-
        # partition writer requires its columns sorted first and otherwise
        # injects its own non-stable sort, silently undoing the clustering
        # (regression-tested in tests/test_sources_sinks.py)
        lead = [partition_col] if partitioned else []
        writer_df = writer_df.sortWithinPartitions(*lead, *sort_cols)
    writer = writer_df.write.mode(mode)
    if partitioned:
        writer = writer.partitionBy(partition_col)
    writer.parquet(path)
    if partitioned and not _has_parquet_files(df.sparkSession, path):
        # a dynamic-partition write of an EMPTY frame emits no files at all,
        # leaving a directory that fails schema inference on read — an
        # empty micro-batch would thus corrupt the dataset for every
        # downstream reader. Driver-side file listing (no recompute) detects
        # it; a schema-only footer keeps the location readable.
        (
            df.sparkSession.createDataFrame([], df.schema)
            .repartition(1)
            .write.mode("append")
            .parquet(path)
        )


def _has_parquet_files(spark: SparkSession, path: str) -> bool:
    """True if any .parquet data file exists under ``path`` (recursive),
    via the Hadoop FS API so it works on any supported filesystem."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            return True
    return False


def write_partitioned_csv(
    df: DataFrame,
    path: str,
    table: str,
    partition_col: str | None = "block_id_group",
    max_records_per_file: int = 1000 * 200,
    mode: str = "overwrite",
) -> None:
    """Gzip CSV with the reference's per-table dialect. The reference's
    1000-block file / 1M-block dir scheme (eth_csv_export.py:563-569) maps to
    partitionBy(bucket) + maxRecordsPerFile."""
    opts = {"header": "true", "compression": "gzip", **CSV_DIALECTS.get(table, {})}
    writer = df.write.mode(mode).option("maxRecordsPerFile", str(max_records_per_file))
    for k, v in opts.items():
        writer = writer.option(k, v)
    if partition_col and partition_col in df.columns:
        writer = writer.partitionBy(partition_col)
    writer.csv(path)


def write_cassandra(df: DataFrame, keyspace: str, table: str) -> None:
    """K1 edge connector. Requires the spark-cassandra-connector package on
    the classpath and a reachable cluster; the reference's hand-rolled
    concurrency/retry loop (eth_cassandra_streaming.py:263-303) is subsumed
    by the connector's task-level parallelism + Spark task retries."""
    try:
        (
            df.write.format("org.apache.spark.sql.cassandra")
            .options(keyspace=keyspace, table=table)
            .mode("append")
            .save()
        )
    except Exception as exc:  # pragma: no cover - no cluster in harness
        raise NotImplementedError(
            "Cassandra sink needs spark-cassandra-connector + a live cluster "
            "(not present in this environment)"
        ) from exc


def write_configuration(
    spark: SparkSession, path: str, keyspace: str, bucket_size: int = 1000, prefix_len: int = 5
) -> None:
    """K3 — self-describing-dataset metadata (eth_cassandra_streaming.py:306-320):
    readers need (bucket_size, prefix_len) to reconstruct partition functions."""
    df = spark.createDataFrame(
        [(keyspace, bucket_size, prefix_len)],
        "id string, block_bucket_size int, tx_prefix_length int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def table_location(spark, table: str) -> str:
    """Storage-location URI of a catalog table. A REGISTERED table answers
    from the catalog (correct for db-qualified names and any filesystem
    scheme); an unregistered one maps to the layout the session catalog
    itself would create for a managed table: warehouse[/db.db]/tbl. The
    fallback exists because managed-table FILES outlive the in-memory
    catalog — sidecar readers and orphan-location cleanup both need the
    answer before the table is (re-)registered."""
    try:
        if spark.catalog.tableExists(table):
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
                if r[0] == "Location":
                    return r[1]
    except Exception:
        pass  # not resolvable in this session — derive the managed layout
    warehouse = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    parts = [p for p in table.lower().split(".") if p]
    if parts and parts[0] == "spark_catalog":
        parts = parts[1:]
    if len(parts) == 2 and parts[0] != "default":
        return f"{warehouse}/{parts[0]}.db/{parts[1]}"
    return f"{warehouse}/{parts[-1]}"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (the co-located-join layout, SURVEY.md §4):
    hash-bucket the rows on the join key at WRITE time so that every
    subsequent equi-join or aggregation on that key is exchange-free — the
    scan's output partitioning already satisfies the join's requirement.
    This is the Spark-native generalization of the reference's 5-hex-char
    tx_hash_prefix partitioning (eth_cassandra_streaming.py:428-429): both
    pre-hash the data so point/join access needs no data movement; bucketing
    keeps file counts bounded (num_buckets files per write task ceiling)
    where value-partitioning by prefix would create 16^5 directories.

    At 100 TB: bucket both fact tables on the same key with the same count
    (e.g. transaction and trace on block_id, 4096 buckets) and the daily
    enrichment/join jobs skip both sort-merge exchanges — typically the
    single largest shuffle in the pipeline.
    """
    spark = df.sparkSession
    if mode == "overwrite" and not spark.catalog.tableExists(table):
        # A managed-table LOCATION can outlive its catalog entry (the
        # in-memory catalog dies with the session; the warehouse dir does
        # not). saveAsTable refuses to adopt such an orphan location even
        # in overwrite mode (LOCATION_ALREADY_EXISTS) — clear it first so
        # an index rebuild in a fresh session is idempotent. Deletion goes
        # through the Hadoop FS API so non-local warehouses behave the
        # same as file: ones.
        loc = table_location(spark, table)
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(loc)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(*(sort_cols or [bucket_col]))
    )
    writer.saveAsTable(table)


def zorder_value(
    cols: list,
    mins: list[float],
    maxs: list[float],
    bits: int = 8,
):
    """Z-order (Morton) key as a pure Catalyst expression: each column is
    min/max-normalized to a ``bits``-bit integer rank, then the ranks' bits
    are interleaved. Rows close in the Z-curve are close in EVERY listed
    dimension, so sorting files by this key bounds each file's min/max range
    in all dimensions at once — multi-column row-group/file skipping, where
    a linear sort only ever skips on its leading column."""
    n = len(cols)
    z = F.lit(0).cast("bigint")
    for i, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        if lo is None or hi is None:
            raise ValueError(
                f"z-order column #{i} has no min/max (empty input or all-NULL "
                "column) — nothing to normalize; filter NULLs or skip z-ordering"
            )
        col = F.col(c) if isinstance(c, str) else c
        # NULL inputs would otherwise yield NULL Morton keys that land in an
        # arbitrary range partition: pin them to the column minimum instead.
        col = F.coalesce(col.cast("double"), F.lit(float(lo)))
        span = (hi - lo) or 1.0
        rank = F.least(
            F.lit((1 << bits) - 1),
            F.greatest(
                F.lit(0),
                ((col.cast("double") - F.lit(float(lo)))
                 * F.lit(float((1 << bits) - 1) / span)).cast("bigint"),
            ),
        )
        for b in range(bits):
            z = z + F.shiftright(rank, b).bitwiseAND(1) * F.lit(
                1 << (b * n + i)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered Parquet write (the Delta/Iceberg OPTIMIZE ZORDER
    analog, as one range-partitioned sort): one stats pass collects each
    column's min/max (a 1-row aggregate — at scale, use table-level stats),
    then rows are range-partitioned AND sorted by the Morton key so both
    file boundaries and row-group boundaries cut the Z-curve. Point/range
    predicates on ANY of ``zorder_cols`` then skip most files via Parquet
    min/max stats — the write-side generalization of the single-column
    clustering in ``write_partitioned_parquet`` (SORT_COLUMNS covers the
    primary access path; Z-order covers secondary paths like topic0 +
    block_id together)."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn{i}") for i, c in enumerate(zorder_cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx{i}") for i, c in enumerate(zorder_cols)],
    ).collect()[0]
    mins = [stats[f"mn{i}"] for i in range(len(zorder_cols))]
    maxs = [stats[f"mx{i}"] for i in range(len(zorder_cols))]
    if any(v is None for v in mins + maxs):
        # Empty input or an all-NULL z-order column: there is no range to
        # cluster on — degrade to a plain write instead of a TypeError.
        df.write.mode(mode).parquet(path)
        return
    z = zorder_value(zorder_cols, mins, maxs, bits)
    out = df.withColumn("_z", z)
    if num_files:
        out = out.repartitionByRange(num_files, F.col("_z"))
    else:
        out = out.repartitionByRange(F.col("_z"))
    out.sortWithinPartitions("_z").drop("_z").write.mode(mode).parquet(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "block_id_group",
    target_records_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-files maintenance (the operational tax of incremental ingest —
    every micro-batch writes at least one file per touched partition, and at
    1000 batches/day a 100-TB table degrades into millions of KB-scale
    files). Rewrites the dataset in place: one shuffle keyed on the
    partition column (AQE coalesces to as few tasks as data volume needs),
    optional re-sort to restore clustering (O2), atomic-ish swap via
    overwrite. Returns the number of files after compaction.

    On a real deployment this runs per-partition-predicate (compact only
    partitions whose file count exceeds a threshold) and under a table
    format with real transactions (Delta/Iceberg OPTIMIZE); the operator
    keeps the same shape.
    """
    # mergeSchema: a whole-dataset rewrite must carry the union schema
    # across partitions straddling an additive evolution, or the evolved
    # column is silently dropped from every rewritten file (r6 bug class,
    # see VersionedTable.compact / merge_into).
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if df.isEmpty():
        # nothing to compact; rewriting would round-trip an empty frame
        # through a dynamic-partition write (which emits no files) and
        # destroy the schema-only footer that keeps the location readable
        return 0
    compacted = df.repartition(F.col(partition_col))
    if sort_cols:
        # partition column leads — see write_partitioned_parquet
        compacted = compacted.sortWithinPartitions(partition_col, *sort_cols)
    tmp = path.rstrip("/") + "__compact_tmp"
    (
        compacted.write.mode("overwrite")
        .option("maxRecordsPerFile", str(target_records_per_file))
        .partitionBy(partition_col)
        .parquet(tmp)
    )
    # Swap: overwrite the original location from the compacted copy,
    # re-establishing the clustering (a bare copy would re-sort by the
    # partition column alone and shuffle the clustered order away).
    swap = spark.read.parquet(tmp).repartition(F.col(partition_col))
    if sort_cols:
        swap = swap.sortWithinPartitions(partition_col, *sort_cols)
    swap.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    # Best-effort cleanup of the staging copy via Hadoop FS (works for any
    # supported scheme, not just local paths).
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(hconf).delete(p, True)
    fs_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = fs_path.getFileSystem(hconf)
    it = fs.listFiles(fs_path, True)
    n = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            n += 1
    return n
