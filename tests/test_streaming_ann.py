"""Streaming ANN ingestion (streaming/ann_ingest.py): a vector feed
drains into the persisted IVF-PQ index micro-batch by micro-batch —
equivalent to the same batches applied via ivfpq_add by hand, resumable
from its checkpoint (only new files add), with the at-least-once crash
window repaired by compact's duplicate drop."""

from __future__ import annotations

from pyspark.sql import functions as F

VSCHEMA = "vec_id long, embedding array<float>, label int"


def _index_rows(spark, root):
    return sorted(
        (r["cluster"], r["cand_id"], tuple(r["codes"]), r["res_dist"])
        for r in spark.read.parquet(f"{root}/codes").collect()
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
        _read_progress,
        run_streaming_ann_add,
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
    assert _read_progress(root)  # high-water mark recorded

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


def test_streaming_ann_crash_window_repaired_by_compact(spark, tmp_path):
    """The one unguarded window (crash between the codes append and the
    progress write) double-appends bit-identical rows on replay:
    searches then score the duplicated candidates twice, and
    compact_ivfpq_index's per-cand_id duplicate drop restores the index
    to the exactly-once state."""
    from graphsense_ethereum_etl_spark.operators.similarity import (
        build_ivfpq_index,
        compact_ivfpq_index,
        ivfpq_add,
        ivfpq_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "idx")
    build_ivfpq_index(
        emb.filter("vec_id % 4 != 3"), root, dim=64, n_clusters=8, m=8,
        n_codes=16,
    )
    batch = emb.filter("vec_id % 8 = 3")
    q = emb.filter(F.col("vec_id") < 4)
    ivfpq_add(spark, root, batch)
    clean = _index_rows(spark, root)
    want = sorted(
        tuple(r) for r in ivfpq_search(spark, root, q, nprobe=2, k=5).collect()
    )

    # simulate the crash-window replay: the same batch appends AGAIN
    ivfpq_add(spark, root, batch)
    dup = _index_rows(spark, root)
    assert len(dup) == len(clean) + batch.count()
    # the duplicates are bit-identical (frozen-frame determinism)
    assert sorted(set(dup)) == clean

    compact_ivfpq_index(spark, root)
    assert _index_rows(spark, root) == clean
    got = sorted(
        tuple(r) for r in ivfpq_search(spark, root, q, nprobe=2, k=5).collect()
    )
    assert got == want
