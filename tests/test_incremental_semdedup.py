"""Incremental semantic dedup: the persistent-IVF pipeline must give
the same whole-history keep/drop manifest as batch-mode same-cluster
SemDeDup, no matter how the stream is chopped — plus the retry and
real-stream scenarios the other incremental pipelines pin."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.operators.similarity import (
    _dot,
    ivf_assign,
    sample_centroids,
)
from duckdb_vortex_spark.sources.vortex import register
from duckdb_vortex_spark.streaming.incremental_neardup import _batch_dirs
from duckdb_vortex_spark.streaming.incremental_semdedup import (
    incremental_semdedup_stream,
    semdedup_process_batch,
)

from .conftest import SF_DIR

THRESH = 0.4


def _manifest(spark, man_d):
    return (
        spark.read.format("vortex")
        .option("paths", json.dumps(_batch_dirs(man_d, 10**9)))
        .load()
    )


def _batch_answer(emb, centroids):
    """keep iff no same-cluster vector with a smaller id reaches the
    threshold — computed directly, no batching."""
    a1 = ivf_assign(emb, centroids, 1).select(
        "cluster_id", F.col("vec_id").alias("id"), "embedding", "vnorm"
    )
    l = a1.select(
        "cluster_id",
        F.col("id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("vnorm").alias("na"),
    )
    r = a1.select(
        "cluster_id",
        F.col("id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("vnorm").alias("nb"),
    )
    dropped = {
        x["id_b"]
        for x in l.join(r, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_b",
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("c"),
        )
        .filter(F.col("c") >= THRESH)
        .select("id_b")
        .distinct()
        .collect()
    }
    return {
        x["vec_id"]: x["vec_id"] not in dropped
        for x in emb.select("vec_id").collect()
    }


def test_chopping_invariance(spark, tmp_path):
    register(spark)
    emb = load(spark, SF_DIR, "embeddings").persist()
    centroids = sample_centroids(emb, 16)
    want = _batch_answer(emb, centroids)
    ids = sorted(want)
    for n_batches, tag in ((2, "c2"), (5, "c5")):
        dirs = [str(tmp_path / f"{tag}_{d}") for d in ("idx", "man")]
        step = (len(ids) + n_batches - 1) // n_batches
        for b in range(n_batches):
            chunk = ids[b * step : (b + 1) * step]
            semdedup_process_batch(
                emb.filter(F.col("vec_id").isin(chunk)), b, centroids, *dirs
            )
        got = {
            r["vec_id"]: r["keep"] for r in _manifest(spark, dirs[1]).collect()
        }
        assert got == want, f"{tag}: manifest diverges from batch answer"
    emb.unpersist()


def test_retried_batch_is_idempotent(spark, tmp_path):
    """A replayed batch id reads only strictly-earlier state — the
    retry must not treat its own first attempt's index rows as
    'earlier' (which would drop its whole batch as self-duplicates)."""
    register(spark)
    emb = load(spark, SF_DIR, "embeddings").limit(60).persist()
    centroids = sample_centroids(emb, 4)
    dirs = [str(tmp_path / d) for d in ("idx", "man")]
    b0 = emb.filter(F.col("vec_id") < 30)
    b1 = emb.filter(F.col("vec_id") >= 30)
    semdedup_process_batch(b0, 0, centroids, *dirs)
    semdedup_process_batch(b1, 1, centroids, *dirs)
    first = {r["vec_id"]: r["keep"] for r in _manifest(spark, dirs[1]).collect()}
    semdedup_process_batch(b1, 1, centroids, *dirs)  # retry, same id
    again = {r["vec_id"]: r["keep"] for r in _manifest(spark, dirs[1]).collect()}
    assert first == again
    # index holds every vector exactly once
    idx = (
        spark.read.format("vortex")
        .option("paths", json.dumps(_batch_dirs(dirs[0], 10**9)))
        .load()
    )
    assert idx.count() == emb.count()
    assert idx.select("id").distinct().count() == emb.count()
    emb.unpersist()


def test_real_stream_drive(spark, tmp_path):
    """End-to-end through readStream/foreachBatch with a static
    codebook: two parquet files replayed one per micro-batch; the
    manifest equals the batch-mode answer and covers every vector."""
    register(spark)
    emb = load(spark, SF_DIR, "embeddings").limit(100).persist()
    centroids = sample_centroids(emb, 8)
    a = emb.filter(F.col("vec_id") < 50)
    b = emb.filter(F.col("vec_id") >= 50)
    src = str(tmp_path / "replay")
    a.coalesce(1).write.parquet(os.path.join(src, "f1"))
    b.coalesce(1).write.parquet(os.path.join(src, "f2"))
    now = os.path.getmtime(glob.glob(os.path.join(src, "f1", "*.parquet"))[0])
    for f in glob.glob(os.path.join(src, "f2", "*")):
        os.utime(f, (now + 60, now + 60))
    stream = (
        spark.readStream.schema(a.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    idx_d, man_d, ckpt = (str(tmp_path / d) for d in ("idx", "man", "ck"))
    q = incremental_semdedup_stream(spark, stream, centroids, idx_d, man_d, ckpt)
    q.awaitTermination()
    q.stop()
    got = {r["vec_id"]: r["keep"] for r in _manifest(spark, man_d).collect()}
    assert got == _batch_answer(emb, centroids)
    assert len(glob.glob(os.path.join(man_d, "batch-*"))) >= 2
    emb.unpersist()


def test_index_compaction_preserves_candidates(spark, tmp_path):
    """Lifecycle: after many small streamed batches, compact the
    semantic index back to one cluster-sorted dataset — future batches
    read the compacted layout and produce identical manifests."""
    from duckdb_vortex_spark.streaming.sinks import (
        compact_dataset,
        read_vortex_dataset,
    )

    register(spark)
    emb = load(spark, SF_DIR, "embeddings").limit(90).persist()
    centroids = sample_centroids(emb, 4)
    want = _batch_answer(emb, centroids)
    dirs = [str(tmp_path / d) for d in ("idx", "man")]
    # land the first two thirds as two id-ordered batches (arrival
    # order must follow id order for the batch answer to apply),
    # compact, then ingest the final third against the compacted state
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    cut1, cut2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    b = [
        emb.filter(F.col("vec_id") < cut1),
        emb.filter((F.col("vec_id") >= cut1) & (F.col("vec_id") < cut2)),
        emb.filter(F.col("vec_id") >= cut2),
    ]
    semdedup_process_batch(b[0], 0, centroids, *dirs)
    semdedup_process_batch(b[1], 1, centroids, *dirs)
    n_before = read_vortex_dataset(spark, dirs[0]).count()
    retired = compact_dataset(spark, dirs[0], sort_cols=["cluster_id", "id"])
    import shutil as _sh

    _sh.rmtree(retired)
    assert read_vortex_dataset(spark, dirs[0]).count() == n_before
    # compacted layout is flat part files; _batch_dirs finds no
    # batch-* dirs, so later batches must read it as "batch 0" state:
    # re-wrap the compacted dataset as a single committed batch dir
    flat = read_vortex_dataset(spark, dirs[0])
    rewrapped = str(tmp_path / "idx2")
    from duckdb_vortex_spark.streaming.sinks import overwrite_batch_atomic

    overwrite_batch_atomic(flat, rewrapped, 1)
    semdedup_process_batch(b[2], 2, centroids, rewrapped, dirs[1])
    got = {r["vec_id"]: r["keep"] for r in _manifest(spark, dirs[1]).collect()}
    assert got == want
    emb.unpersist()
