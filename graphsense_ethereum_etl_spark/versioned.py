"""Manifest-pointer versioned Parquet table — the transactional layer the
reference lacks entirely (SURVEY.md §7.4.4 flags reorg/late-data as needing
delete+rewrite under a transaction; the reference's Cassandra upserts sidestep
it, a file sink cannot).

Layout::

    <root>/
      _MANIFEST                  # pointer file: name of the current manifest
      _manifests/m-00000001.json # snapshot: {partition_value: data_dir, ...}
      data/<uuid>/part-*.parquet # immutable data dirs, one per (partition,
                                 # commit) — files KEEP the partition column

Why this shape (it is a minimal Delta/Iceberg):
  - every commit writes NEW immutable data dirs, then replaces the manifest,
    then atomically swaps the one-line pointer file (rename — atomic on
    POSIX/HDFS; on object stores the pointer is a single small PUT). Readers
    resolve the pointer ONCE, then read a frozen set of dirs — a reader
    racing any commit sees the complete old snapshot or the complete new
    one, never a mix, and never a partially-written dir (uncommitted dirs
    are invisible: no manifest references them).
  - chain-reorg invalidation (``invalidate_from``) and partition overwrite
    are pure MANIFEST edits — zero data IO, atomic, and trivially
    revertible (the old manifest file still exists).
  - compaction rewrites data dirs and swaps the manifest; concurrent
    readers keep their snapshot because old dirs are only removed by an
    explicit ``vacuum`` (grace = readers' max query lifetime, the
    Delta VACUUM contract).
  - manifest-level partition pruning: ``read(partitions=...)`` loads only
    the matching dirs — the same file-skipping Delta gets from its log.

Scale posture: the manifest holds one entry per live partition (a 100-TB
table at 1000-block buckets ≈ 20k entries — KB-scale JSON); commits are
O(touched partitions); no listing of the data tree is ever needed (the
manifest IS the listing, which is also why this beats raw
``partitionBy``-overwrite on object stores where LIST is slow and
rename-based overwrite is non-atomic).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_MANIFEST"
_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class VersionedTable:
    """Partitioned Parquet table with snapshot-isolated commits."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        partition_col: str = "block_id_group",
        stats_cols: list[str] | None = None,
    ) -> None:
        self.spark = spark
        self.root = root.rstrip("/")
        self.partition_col = partition_col
        # columns whose per-partition min/max are recorded in the manifest
        # at commit time (harvested from parquet FOOTERS — no data scan) and
        # used by read(between=...) for Iceberg-style data skipping.
        self.stats_cols = list(stats_cols or [])
        os.makedirs(f"{self.root}/{_MANIFEST_DIR}", exist_ok=True)
        os.makedirs(f"{self.root}/{_DATA_DIR}", exist_ok=True)

    # -- snapshot resolution ------------------------------------------------

    def _current_manifest_name(self) -> str | None:
        try:
            with open(f"{self.root}/{_POINTER}") as fh:
                return fh.read().strip() or None
        except FileNotFoundError:
            return None

    def snapshot(self) -> dict[str, str]:
        """{partition_value(str): data dir(abs path)} for the current
        version. This is the read-side anchor: resolve once, then every
        subsequent read of those dirs is immutable."""
        return {
            k: f"{self.root}/{_DATA_DIR}/{v}"
            for k, v in self._manifest_doc()["partitions"].items()
        }

    def _manifest_doc(self) -> dict:
        name = self._current_manifest_name()
        if name is None:
            return {"partitions": {}, "stats": {}, "stats_cols": []}
        with open(f"{self.root}/{_MANIFEST_DIR}/{name}") as fh:
            doc = json.load(fh)
        doc.setdefault("stats", {})  # pre-stats manifests stay readable
        doc.setdefault("stats_cols", [])
        return doc

    def _effective_stats_cols(self) -> list[str]:
        """Stats columns in force for the NEXT commit: this instance's, or
        (for stats-free instances, e.g. transform_and_write_batch's bare
        ``VersionedTable(spark, root)``) the ones persisted in the current
        manifest — so a partition overwrite through any writer recomputes
        the bounds instead of silently carrying the previous manifest's
        stale [min,max] forward into pruning decisions."""
        return self.stats_cols or self._manifest_doc()["stats_cols"]

    def stats(self) -> dict[str, dict[str, list]]:
        """{partition_value: {column: [min, max]}} recorded at commit."""
        return self._manifest_doc()["stats"]

    def _published_seq(self) -> int | None:
        name = self._current_manifest_name()
        return None if name is None else int(name.split("-")[1].split(".")[0])

    def history(self) -> list[int]:
        """COMMITTED version numbers, oldest first (vacuum trims this list
        from the front). A manifest file NEWER than the published pointer is
        crash debris — a commit that died between its manifest write and the
        pointer swap — not a committed version: it is excluded here, the
        next successful commit overwrites its file name, and ``vacuum``
        removes it."""
        published = self._published_seq()
        if published is None:
            return []
        return sorted(
            seq
            for seq in (
                int(n.split("-")[1].split(".")[0])
                for n in os.listdir(f"{self.root}/{_MANIFEST_DIR}")
            )
            if seq <= published
        )

    def read_version(self, version: int) -> DataFrame:
        """Time travel: snapshot read of a PRIOR committed version.
        Immutable data dirs make this free — the old manifest still names
        dirs that exist until ``vacuum`` drops them, so historic reads are
        valid exactly as long as the vacuum grace window (the Delta
        time-travel contract). Raises FileNotFoundError for a vacuumed or
        never-committed version.

        Reads with mergeSchema unconditionally (the r6 merge_into bug
        class, found here by the r7 randomized soak): a historic snapshot
        whose dirs straddle an additive schema evolution would otherwise
        take its schema from whichever single footer Spark samples —
        NONDETERMINISTICALLY dropping the evolved column from the time
        travel. Time travel is an audit/recovery path; correctness beats
        the single-footer planning shortcut here."""
        path = f"{self.root}/{_MANIFEST_DIR}/m-{version:08d}.json"
        with open(path) as fh:
            rel = json.load(fh)["partitions"]
        if not rel:
            return self.spark.createDataFrame([], f"{self.partition_col} bigint")
        return self.spark.read.option("mergeSchema", "true").parquet(
            *sorted(f"{self.root}/{_DATA_DIR}/{v}" for v in rel.values())
        )

    def read(
        self,
        partitions: list[int] | None = None,
        between: tuple[str, object, object] | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Snapshot read; ``partitions`` prunes at the MANIFEST level (only
        matching dirs are handed to the scan). ``between=(col, lo, hi)``
        additionally skips every partition whose recorded [min, max] for
        ``col`` cannot overlap the inclusive range — footer-derived
        data skipping on NON-partition columns, the manifest-level
        equivalent of Iceberg's column-bounds pruning. Partitions with no
        recorded stats are conservatively kept. ``merge_schema=True``
        unions the column sets of every live dir (added columns read as
        NULL in partitions committed before them — additive schema
        evolution, the Delta mergeSchema contract); leave it off for
        single-footer scan planning when the schema is known uniform."""
        snap = self.snapshot()
        if partitions is not None:
            wanted = {str(p) for p in partitions}
            snap = {k: v for k, v in snap.items() if k in wanted}
        if between is not None:
            col, lo, hi = between
            st = self.stats()
            def _overlaps(pv: str) -> bool:
                bounds = st.get(pv, {}).get(col)
                if bounds is None:
                    return True
                mn, mx = bounds
                return not (mx < lo or mn > hi)
            snap = {k: v for k, v in snap.items() if _overlaps(k)}
        if not snap:
            return self.spark.createDataFrame([], f"{self.partition_col} bigint")
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*sorted(snap.values()))

    def read_changes(self, from_version: int, to_version: int) -> DataFrame:
        """Change data feed between two committed versions: every row
        inserted or deleted going ``from_version`` → ``to_version``, with a
        ``_change_type`` column ('insert' | 'delete'; an update is its
        delete+insert pair — the Delta CDF row-level contract, derived
        here without any per-commit change log).

        What makes this O(changed data), not O(table): data dirs are
        IMMUTABLE and the manifest names one dir per partition, so a
        partition whose dir name is identical in both manifests provably
        carries identical rows and is pruned before any IO — the diff
        reads only partitions whose dir CHANGED between the versions
        (merge_into's copy-on-write already rewrites only CDC-covered
        partitions, so the feed's cost tracks the CDC rate, exactly like
        the write side). Within changed partitions the row diff is bag
        semantics (``exceptAll`` both ways — s4's INTERSECT/EXCEPT ALL
        engine surface), so duplicate rows count correctly. A
        compaction/Z-order rewrite renames dirs without changing rows:
        those partitions are scanned (dir identity is the only pruning
        key) and contribute zero feed rows — correct, just not free;
        the same holds for Delta CDF reads across OPTIMIZE commits.

        Schemas may differ across the range (additive evolution): both
        sides read with mergeSchema and align on the union of columns
        (missing → NULL), matching read_version's time-travel contract.
        Raises FileNotFoundError for vacuumed/never-committed versions."""
        parts: dict[int, dict[str, str]] = {}
        for v in (from_version, to_version):
            with open(f"{self.root}/{_MANIFEST_DIR}/m-{v:08d}.json") as fh:
                parts[v] = json.load(fh)["partitions"]
        old, new = parts[from_version], parts[to_version]
        changed = {
            p for p in set(old) | set(new) if old.get(p) != new.get(p)
        }

        def _side(rel: dict[str, str]) -> DataFrame | None:
            dirs = sorted(
                f"{self.root}/{_DATA_DIR}/{rel[p]}" for p in changed if p in rel
            )
            if not dirs:
                return None
            return self.spark.read.option("mergeSchema", "true").parquet(*dirs)

        a, b = _side(old), _side(new)
        if a is None and b is None:
            # No changed partitions (a no-op commit, e.g. an invalidate
            # past the last partition). The feed's SCHEMA must not depend
            # on whether changes exist — a downstream delta-rule
            # maintainer resolves its sum columns against it (the r8 soak
            # caught incremental_aggregate crashing on exactly this) — so
            # derive the empty frame's schema from the to-version
            # snapshot's dirs (falling back to the from-side, then to the
            # minimal frame only when the table has never held data).
            for rel in (new, old):
                dirs = sorted(
                    f"{self.root}/{_DATA_DIR}/{d}" for d in rel.values()
                )
                if dirs:
                    empty = (
                        self.spark.read.option("mergeSchema", "true")
                        .parquet(*dirs)
                        .limit(0)
                    )
                    return empty.withColumn("_change_type", F.lit("insert")).where(
                        F.lit(False)
                    )
            return self.spark.createDataFrame(
                [], f"{self.partition_col} bigint, _change_type string"
            )
        types: dict[str, str] = {}
        for df in (a, b):
            for f in df.schema.fields if df is not None else []:
                types.setdefault(f.name, f.dataType.simpleString())
        cols = list(types)

        def _aligned(df: DataFrame | None) -> DataFrame:
            if df is None:
                other = b if a is None else a
                return other.sparkSession.createDataFrame(
                    [], ", ".join(f"`{c}` {types[c]}" for c in cols)
                )
            return df.select(
                *[
                    F.col(c)
                    if c in df.columns
                    else F.lit(None).cast(types[c]).alias(c)
                    for c in cols
                ]
            )

        av, bv = _aligned(a), _aligned(b)
        inserted = bv.exceptAll(av).withColumn("_change_type", F.lit("insert"))
        deleted = av.exceptAll(bv).withColumn("_change_type", F.lit("delete"))
        return inserted.unionByName(deleted)

    # -- commits ------------------------------------------------------------

    def _swap(
        self,
        partitions_rel: dict[str, str],
        stats: dict[str, dict[str, list]] | None = None,
    ) -> None:
        """Write the next manifest, then atomically swap the pointer
        (tmp-file + rename: a crash before the rename leaves the old
        version current; after it, the new one — no in-between)."""
        current = self._current_manifest_name()
        seq = int(current.split("-")[1].split(".")[0]) + 1 if current else 1
        name = f"m-{seq:08d}.json"
        doc = {
            "partitions": partitions_rel,
            "stats": {
                k: v for k, v in (stats or {}).items() if k in partitions_rel
            },
            # persisted so later stats-free writer instances keep the
            # skipping bounds fresh (see _effective_stats_cols).
            "stats_cols": self._effective_stats_cols(),
        }
        with open(f"{self.root}/{_MANIFEST_DIR}/{name}", "w") as fh:
            json.dump(doc, fh, sort_keys=True)
        tmp = f"{self.root}/{_POINTER}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(name)
        os.replace(tmp, f"{self.root}/{_POINTER}")

    def _manifest_rel(self) -> dict[str, str]:
        return {
            k: v[len(f"{self.root}/{_DATA_DIR}/") :]
            for k, v in self.snapshot().items()
        }

    def _dir_stats(
        self, abs_dir: str, cols: list[str] | None = None
    ) -> dict[str, list]:
        """Per-column [min, max] for ``stats_cols`` harvested from the
        parquet FOOTERS of every file in ``abs_dir`` — row-group statistics
        only, no data pages are read. Values must be JSON-representable
        (ints/floats/strings); columns whose footers carry no usable
        min/max are simply omitted (read() treats missing as
        cannot-prune)."""
        import pyarrow.parquet as pq

        wanted = self.stats_cols if cols is None else cols
        acc: dict[str, list] = {}
        for fname in os.listdir(abs_dir):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(f"{abs_dir}/{fname}").metadata
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    name = col.path_in_schema
                    if name not in wanted:
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    mn, mx = st.min, st.max
                    if not isinstance(mn, (int, float, str)):
                        continue
                    cur = acc.get(name)
                    if cur is None:
                        acc[name] = [mn, mx]
                    else:
                        acc[name] = [min(cur[0], mn), max(cur[1], mx)]
        return acc

    def write_partitions(
        self,
        df: DataFrame,
        sort_cols: list[str] | None = None,
        drop_partitions: list[str] | None = None,
    ) -> list[str]:
        """Commit ``df`` as a partition OVERWRITE for every partition value
        it contains (the idempotent micro-batch semantics run_incremental
        needs): data lands in fresh immutable dirs first, the manifest swap
        publishes all of them at once. ``sort_cols`` restores the clustering
        order at rest (O2). ``drop_partitions`` removes those partition
        values from the manifest IN THE SAME swap (merge_into uses this for
        partitions whose every row was deleted — two separate swaps would
        expose a transient snapshot where deleted data is still live).
        Returns the partition values written.
        """
        staging = f"{self.root}/{_DATA_DIR}/stage-{uuid.uuid4().hex}"
        # _pv duplicates the partition column into the directory name so the
        # files themselves KEEP the real column (manifest dirs are read
        # directly, with no partition-discovery to resurrect it).
        out = df.withColumn("_pv", F.col(self.partition_col)).repartition(
            F.col(self.partition_col)
        )
        if sort_cols:
            # _pv must LEAD the sort: FileFormatWriter requires dynamic
            # partition columns sorted first and will otherwise inject its
            # own (non-stable) sort by _pv alone, destroying the clustering
            # this sort just established. Leading with _pv satisfies the
            # writer's required ordering, so it skips its sort entirely.
            out = out.sortWithinPartitions("_pv", *sort_cols)
        (
            out.write.mode("overwrite")
            .partitionBy("_pv")
            .parquet(staging)
        )
        rel = self._manifest_rel()
        stats = self.stats()
        stat_cols = self._effective_stats_cols()
        written: list[str] = []
        for entry in sorted(os.listdir(staging)):
            if not entry.startswith("_pv="):
                continue
            val = entry.split("=", 1)[1]
            dirname = f"{uuid.uuid4().hex}"
            os.replace(f"{staging}/{entry}", f"{self.root}/{_DATA_DIR}/{dirname}")
            rel[val] = dirname
            written.append(val)
            if stat_cols:
                stats[val] = self._dir_stats(
                    f"{self.root}/{_DATA_DIR}/{dirname}", stat_cols
                )
            else:
                # No stats columns resolvable for this writer: drop the
                # rewritten partition's stale [min,max] so read(between=...)
                # conservatively keeps it instead of pruning on bounds that
                # no longer describe the data.
                stats.pop(val, None)
        for val in drop_partitions or ():
            if val not in written:
                rel.pop(val, None)
        _rm(staging)
        self._swap(rel, stats)
        return written

    def merge_into(
        self,
        updates: DataFrame,
        key_cols: list[str],
        delete_col: str | None = None,
        sort_cols: list[str] | None = None,
    ) -> list[str]:
        """MERGE (CDC upsert/delete) with partition-granular copy-on-write.

        Per ``updates`` row, matched on ``key_cols``:
          - ``delete_col`` true → the matching row is removed (a missing
            key is a no-op),
          - otherwise → the matching row is replaced, or inserted if absent.

        This is the reference's write model made explicit: every Cassandra
        INSERT is an upsert on the primary key (the reference re-ingests
        overlapping block ranges and lets Cassandra last-write-wins them,
        eth_cassandra_streaming.py's INSERT-per-row loop), which a plain
        file sink cannot do — here it becomes Delta-style MERGE
        (whenMatched UPDATE ALL / DELETE, whenNotMatched INSERT ALL) on the
        snapshot table.

        Contract: ``partition_col`` must be FUNCTIONALLY DEPENDENT on the
        key (e.g. bucket = block_id // 1000), so every key's old row lives
        in the same partition as its update row. That dependency is what
        makes the rewrite prunable: only partitions present in ``updates``
        are read and rewritten — at 100 TB a CDC batch touching 5 buckets
        opens 5 data dirs, not 20k (manifest-level pruning; untouched
        partitions are never even listed).

        Scale: the base side is never shuffled — the update key set (small:
        a CDC batch) is broadcast for the anti-join, and the rewrite
        repartitions only the touched-partition rows. A partition whose
        rows are ALL deleted is dropped from the manifest in the same
        atomic swap that publishes the rewritten ones.
        """
        if self.partition_col not in updates.columns:
            raise ValueError(
                f"updates must carry the partition column {self.partition_col!r}"
            )
        touched = sorted(
            str(r[0])
            for r in updates.select(self.partition_col).distinct().collect()
        )  # one value per touched partition — bounded by the CDC batch span
        inserts = updates
        if delete_col is not None:
            inserts = inserts.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        snap = self.snapshot()
        live = [snap[k] for k in touched if k in snap]
        if live:
            # mergeSchema: touched partitions may straddle an additive
            # schema evolution (old 3-col + evolved 4-col dirs); inferring
            # from one footer could drop the added column from the
            # copy-on-write rewrite. allowMissingColumns on BOTH union
            # sides keeps rows whichever side lacks a column (missing →
            # null), matching read(merge_schema=True) semantics.
            existing = (
                self.spark.read.option("mergeSchema", "true")
                .parquet(*sorted(live))
            )
            upd_keys = updates.select(*key_cols).distinct()
            kept = existing.join(
                F.broadcast(upd_keys), on=key_cols, how="left_anti"
            )
            merged = kept.unionByName(inserts, allowMissingColumns=True)
        else:
            merged = inserts
        written = self.write_partitions(
            merged,
            sort_cols=sort_cols,
            drop_partitions=[t for t in touched],
        )
        return written

    def invalidate_from(self, first_partition: int) -> list[str]:
        """Chain-reorg handling as a PURE manifest edit: drop every
        partition >= ``first_partition`` from the snapshot — no data IO,
        atomic, revertible (prior manifest file remains). Returns dropped
        partition values."""
        rel = self._manifest_rel()
        dropped = [k for k in rel if int(k) >= first_partition]
        for k in dropped:
            del rel[k]
        self._swap(rel, self.stats())  # swap drops stats of removed keys
        return sorted(dropped)

    def compact(
        self,
        target_records_per_file: int = 1_000_000,
        sort_cols: list[str] | None = None,
        zorder_cols: list[str] | None = None,
    ) -> int:
        """Rewrite the current snapshot into one file-set per partition
        (restoring clustering via ``sort_cols``), publish via manifest swap.
        Readers holding the old snapshot are untouched until ``vacuum``.
        ``zorder_cols`` clusters each partition along a Morton curve
        instead (Delta's OPTIMIZE ZORDER BY): within-partition sort on the
        interleaved-bit key computed by ``sinks.zorder_value``, min/max
        taken over the current snapshot — multi-column file/row-group
        skipping where a linear sort only helps its leading column; pairs
        with ``stats_cols`` so the manifest bounds tighten on every listed
        dimension at once. Mutually exclusive with ``sort_cols``. Returns
        the number of live partitions."""
        if sort_cols and zorder_cols:
            raise ValueError("pass either sort_cols or zorder_cols, not both")
        snap = self.snapshot()
        if not snap:
            return 0
        # mergeSchema unconditionally: compaction is a whole-table rewrite,
        # so inferring the schema from one footer across partitions that
        # straddle an additive evolution would silently DROP the evolved
        # column from every rewritten file (the merge_into bug class, r6).
        df = (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*sorted(snap.values()))
        )
        compacted = df.withColumn("_pv", F.col(self.partition_col)).repartition(
            F.col(self.partition_col)
        )
        # _pv leads every clustering sort — see write_partitions: otherwise
        # the dynamic-partition writer re-sorts by _pv alone (non-stable)
        # and silently undoes the clustering.
        if zorder_cols:
            from .sinks import zorder_value

            bounds = df.agg(
                *[F.min(c).cast("double").alias(f"_lo{i}")
                  for i, c in enumerate(zorder_cols)],
                *[F.max(c).cast("double").alias(f"_hi{i}")
                  for i, c in enumerate(zorder_cols)],
            ).first()
            z = zorder_value(
                list(zorder_cols),
                [bounds[f"_lo{i}"] for i in range(len(zorder_cols))],
                [bounds[f"_hi{i}"] for i in range(len(zorder_cols))],
            )
            compacted = compacted.sortWithinPartitions("_pv", z)
        elif sort_cols:
            compacted = compacted.sortWithinPartitions("_pv", *sort_cols)
        staging = f"{self.root}/{_DATA_DIR}/stage-{uuid.uuid4().hex}"
        (
            compacted.write.mode("overwrite")
            .option("maxRecordsPerFile", str(target_records_per_file))
            .partitionBy("_pv")
            .parquet(staging)
        )
        rel: dict[str, str] = {}
        stats: dict[str, dict[str, list]] = {}
        stat_cols = self._effective_stats_cols()
        for entry in sorted(os.listdir(staging)):
            if not entry.startswith("_pv="):
                continue
            val = entry.split("=", 1)[1]
            dirname = f"{uuid.uuid4().hex}"
            os.replace(f"{staging}/{entry}", f"{self.root}/{_DATA_DIR}/{dirname}")
            rel[val] = dirname
            if stat_cols:
                stats[val] = self._dir_stats(
                    f"{self.root}/{_DATA_DIR}/{dirname}", stat_cols
                )
        _rm(staging)
        self._swap(rel, stats)
        return len(rel)

    def vacuum(self, keep_manifests: int = 2) -> list[str]:
        """Delete data dirs unreferenced by the ``keep_manifests`` newest
        COMMITTED manifests (the reader-grace contract: a dir disappears
        only once no retained snapshot can reference it). ``keep_manifests``
        must be >= 1: the published snapshot can never be vacuumed away.

        The retained window is anchored on the PUBLISHED pointer, not on
        manifest file-name order: a commit that crashed between its
        manifest write and the pointer swap leaves an ORPHAN manifest file
        NEWER than the published one, and a name-ordered window would
        retain the orphan while dropping the published manifest — deleting
        data dirs the live table still references (found by the r7
        randomized soak; regression-pinned in
        tests/test_versioned.py::test_vacuum_ignores_orphan_manifest).
        Orphan manifests and the dirs only they reference are crash debris
        and are removed here (single-writer contract — don't vacuum
        concurrently with an in-flight commit, same caveat as stage-*
        cleanup). A table with manifest files but NO pointer (crash before
        the very first publish) is left untouched.

        Returns removed data dir names."""
        import shutil

        if keep_manifests < 1:
            raise ValueError(
                "keep_manifests must be >= 1: the published manifest can "
                "never be vacuumed away"
            )
        published = self._current_manifest_name()
        if published is None:
            return []
        manifests = sorted(os.listdir(f"{self.root}/{_MANIFEST_DIR}"))
        if published not in manifests:
            # Externally deleted/corrupted manifest: the pointer names a
            # file that no longer exists. Vacuuming here would anchor the
            # retention window arbitrarily — refuse with a diagnosis
            # instead of a bare ValueError out of list.index (r7 ADVICE).
            raise RuntimeError(
                f"corrupt versioned table at {self.root}: the published "
                f"pointer references manifest {published!r} which is "
                "missing from the manifest directory — refusing to vacuum"
            )
        pub_idx = manifests.index(published)
        keep = manifests[max(0, pub_idx + 1 - keep_manifests) : pub_idx + 1]
        drop = manifests[: pub_idx + 1 - len(keep)] + manifests[pub_idx + 1 :]
        live: set[str] = set()
        for name in keep:
            with open(f"{self.root}/{_MANIFEST_DIR}/{name}") as fh:
                live.update(json.load(fh)["partitions"].values())
        removed: list[str] = []
        data_root = f"{self.root}/{_DATA_DIR}"
        # stage-* dirs here are crash debris (commits clean theirs up on
        # success); removing them assumes the single-writer contract —
        # don't vacuum concurrently with an in-flight commit.
        for entry in sorted(os.listdir(data_root)):
            if entry in live:
                continue
            shutil.rmtree(f"{data_root}/{entry}")
            removed.append(entry)
        for name in drop:
            os.remove(f"{self.root}/{_MANIFEST_DIR}/{name}")
        return removed


def incremental_aggregate(
    mv: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str] | dict[str, str],
    count_col: str = "cnt",
) -> DataFrame:
    """Incremental materialized-view maintenance over a change data feed:
    given the previous materialization of
    ``SELECT group_cols, COUNT(*) AS count_col, SUM(c) AS c ...`` and a
    ``read_changes`` frame (rows tagged ``_change_type`` insert/delete),
    return the view at the new version WITHOUT rescanning the base table —
    the classic delta rule for distributive aggregates (SUM/COUNT are
    self-maintainable: ΔV = γ(ΔT) merged by addition; Gupta & Mumick,
    "Maintenance of Materialized Views", IEEE Data Eng. Bull. 1995).

    The delta is one aggregation over the feed (inserts weight +1, deletes
    −1 — an update's delete+insert pair nets to its value difference),
    merged by UNION + one group-keyed re-aggregation with the previous
    view — no join at all (a full-outer merge cannot broadcast its build
    side in Spark; the union-sum form is map-side combinable and shuffles
    only view-row-count + delta-group-count rows).  Groups the feed never
    mentions pass through arithmetically untouched — cost is
    O(changed data + |view|), independent of the base table, which is the
    entire point at 100 TB (the feed itself is already O(changed
    partitions) by manifest-dir pruning).  A group whose maintained count
    reaches zero is dropped — it no longer exists in the full recompute.

    AVG/derived aggregates are maintained as SUM+COUNT pairs and divided at
    read time; MIN/MAX are not self-maintainable under deletes and need
    either the sketch-rollup path (streaming/incremental.py) or a rescan of
    the affected groups — raise early rather than silently corrupt.

    ``sum_cols`` maps view column → base (feed) column; a plain list means
    the names coincide.  Output schema/order:
    ``group_cols + [count_col] + view sum columns``, counts and sums BIGINT
    (matching the full-recompute convention used by the registry
    oracles)."""
    if not isinstance(sum_cols, dict):
        sum_cols = {c: c for c in sum_cols}
    if count_col in sum_cols:
        raise ValueError(f"count_col {count_col!r} duplicated in sum_cols")
    w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = changes.groupBy(*group_cols).agg(
        F.sum(w).cast("bigint").alias("_dcnt"),
        *[
            F.sum(w * F.col(src)).cast("bigint").alias(f"_d_{c}")
            for c, src in sum_cols.items()
        ],
    )
    view_rows = mv.select(
        *group_cols,
        F.col(count_col).cast("bigint").alias(count_col),
        *[F.col(c).cast("bigint").alias(c) for c in sum_cols],
    )
    delta_rows = delta.select(
        *group_cols,
        F.col("_dcnt").alias(count_col),
        *[F.col(f"_d_{c}").alias(c) for c in sum_cols],
    )
    return (
        view_rows.unionByName(delta_rows)
        .groupBy(*group_cols)
        .agg(
            F.sum(count_col).cast("bigint").alias(count_col),
            *[F.sum(c).cast("bigint").alias(c) for c in sum_cols],
        )
        .filter(F.col(count_col) != 0)
    )


def _rm(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
