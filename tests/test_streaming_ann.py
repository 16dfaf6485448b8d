"""Streaming ANN ingestion (streaming/ann_ingest.py): a vector feed
drains into the persisted IVF-PQ index micro-batch by micro-batch —
equivalent to the same batches applied via ivfpq_add by hand, resumable
from its checkpoint (only new files add), and EXACTLY-ONCE under crash
replay: the (checkpoint, batch_id) token commits atomically with the
codes manifest, a crashed add leaves only invisible orphan files, and
compaction reclaims them."""

from __future__ import annotations

from pyspark.sql import functions as F

VSCHEMA = "vec_id long, embedding array<float>, label int"


def _index_rows(spark, root):
    """LIVE rows, read through the codes manifest like every consumer."""
    from graphsense_ethereum_etl_spark.operators.similarity import _codes_read

    return sorted(
        (r["cluster"], r["cand_id"], tuple(r["codes"]), r["res_dist"])
        for r in _codes_read(spark, root).collect()
    )


def test_streaming_ann_add_equals_manual_batches(spark, tmp_path):
    """Two files drained through the stream produce the bit-identical
    index (codes rows AND cumulative drift meta) as two manual
    ivfpq_add calls with the same splits, and search answers from the
    grown index."""
    import json

    from graphsense_ethereum_etl_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_add,
        ivfpq_search,
    )
    from graphsense_ethereum_etl_spark.streaming.ann_ingest import (
        run_streaming_ann_add,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter("vec_id % 4 != 3")
    f1 = emb.filter("vec_id % 8 = 3")
    f2 = emb.filter("vec_id % 8 = 7")

    roots = {}
    for name in ("stream", "manual"):
        root = str(tmp_path / name / "idx")
        build_ivfpq_index(base, root, dim=64, n_clusters=8, m=8, n_codes=16)
        roots[name] = root

    src = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    for part in (f1, f2):
        part.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(VSCHEMA).parquet(src)
        run_streaming_ann_add(stream, roots["stream"], ckpt)

    ivfpq_add(spark, roots["manual"], f1)
    ivfpq_add(spark, roots["manual"], f2)

    assert _index_rows(spark, roots["stream"]) == _index_rows(
        spark, roots["manual"]
    )
    metas = [
        json.load(open(f"{roots[n]}/meta.json")) for n in ("stream", "manual")
    ]
    assert metas[0]["added_n"] == metas[1]["added_n"] > 0
    assert metas[0]["added_res_dist_sum"] == metas[1]["added_res_dist_sum"]

    q = emb.filter(F.col("vec_id") < 4)
    a, b = (
        sorted(
            tuple(r)
            for r in ivfpq_search(spark, roots[n], q, nprobe=2, k=5).collect()
        )
        for n in ("stream", "manual")
    )
    assert a == b and len(a) > 0


def test_streaming_ann_add_resume_and_progress(spark, tmp_path):
    """Re-running with the same checkpoint after a new file lands adds
    ONLY the new file's vectors; a drain with nothing pending is a
    no-op; the progress sidecar survives temp-then-rename."""
    from graphsense_ethereum_etl_spark.operators.similarity import (
        build_ivfpq_index,
    )
    from graphsense_ethereum_etl_spark.streaming.ann_ingest import (
        run_streaming_ann_add,
        stream_progress,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "idx")
    build_ivfpq_index(
        emb.filter("vec_id % 4 != 3"), root, dim=64, n_clusters=8, m=8,
        n_codes=16,
    )
    base_rows = spark.read.parquet(f"{root}/codes").count()

    src = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    f1 = emb.filter("vec_id % 8 = 3")
    f1.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(VSCHEMA).parquet(src)
    run_streaming_ann_add(stream, root, ckpt)
    n1 = spark.read.parquet(f"{root}/codes").count()
    assert n1 == base_rows + f1.count()
    assert stream_progress(root, ckpt) >= 0  # token committed

    # nothing pending: drain again, index unchanged
    stream = spark.readStream.schema(VSCHEMA).parquet(src)
    run_streaming_ann_add(stream, root, ckpt)
    assert spark.read.parquet(f"{root}/codes").count() == n1

    # new file: only its rows add
    f2 = emb.filter("vec_id % 8 = 7")
    f2.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(VSCHEMA).parquet(src)
    run_streaming_ann_add(stream, root, ckpt)
    assert spark.read.parquet(f"{root}/codes").count() == n1 + f2.count()


def test_streaming_ann_exactly_once_crash_replay(spark, tmp_path, monkeypatch):
    """A crash BETWEEN the codes append and the manifest commit leaves
    orphan files that no reader sees (searches and live rows unchanged);
    replaying the same token then applies the batch exactly once, and
    compaction's dir rewrite reclaims the orphans. A replay AFTER a
    successful commit is skipped outright. Duplicate rows from
    token-less double-adds (the manual path misused) are still repaired
    by compact's per-cand_id duplicate drop."""
    from graphsense_ethereum_etl_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "idx")
    S.build_ivfpq_index(
        emb.filter("vec_id % 4 != 3"), root, dim=64, n_clusters=8, m=8,
        n_codes=16,
    )
    batch = emb.filter("vec_id % 8 = 3")
    q = emb.filter(F.col("vec_id") < 4)
    clean_rows = _index_rows(spark, root)
    want_clean = sorted(
        tuple(r)
        for r in S.ivfpq_search(spark, root, q, nprobe=2, k=5).collect()
    )

    # crash injection: the append lands, the commit never happens
    orig_commit = S._codes_commit

    def boom(*a, **kw):
        raise RuntimeError("crash before manifest commit")

    monkeypatch.setattr(S, "_codes_commit", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="crash"):
        S.ivfpq_add(spark, root, batch, token=("ck", 0))
    monkeypatch.setattr(S, "_codes_commit", orig_commit)

    n_disk = len(S._codes_data_files(root))
    assert _index_rows(spark, root) == clean_rows  # orphans invisible
    assert sorted(
        tuple(r)
        for r in S.ivfpq_search(spark, root, q, nprobe=2, k=5).collect()
    ) == want_clean

    # replay of the same token: applied exactly once
    stats = S.ivfpq_add(spark, root, batch, token=("ck", 0))
    assert stats["added"] == batch.count()
    applied = _index_rows(spark, root)
    assert len(applied) == len(clean_rows) + batch.count()
    # disk additionally carries the crashed attempt's orphans
    assert len(S._codes_data_files(root)) > n_disk

    # replay AFTER success: skipped, nothing changes
    stats2 = S.ivfpq_add(spark, root, batch, token=("ck", 0))
    assert stats2 == {"added": 0, "skipped_replay": True}
    assert _index_rows(spark, root) == applied

    # compaction reclaims orphans; live rows and search unchanged;
    # the token survives the rewrite (replays stay skipped)
    S.compact_ivfpq_index(spark, root)
    assert _index_rows(spark, root) == applied
    assert len(S._codes_data_files(root)) <= 8  # 1 file/cluster, orphans gone
    assert S.ivfpq_add(spark, root, batch, token=("ck", 0)) == {
        "added": 0, "skipped_replay": True,
    }

    # token-less double-add (manual misuse): duplicates live until
    # compact drops them per cand_id
    S.ivfpq_add(spark, root, batch)
    assert len(_index_rows(spark, root)) == len(applied) + batch.count()
    S.compact_ivfpq_index(spark, root)
    assert _index_rows(spark, root) == applied
