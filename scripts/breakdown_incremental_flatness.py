"""Measure the incremental family's core scale claim: per-batch cost
must be (near-)independent of how much history has already landed —
otherwise "incremental" quietly degrades to quadratic over a day of
micro-batches. Chops the sf0.1 documents corpus into equal id-ordered
batches and drives them through the near-dup processor and the
integrated exact→near-dup→semantic chain, printing per-batch wall
seconds; a flat-ish curve (vs batch index) is the pass, a steadily
climbing one names a history-sized scan hiding somewhere.

Expected slope sources that are NOT failures (documented):
  * the hot-bucket guard re-aggregates (band, h) counts from the index
    scan the candidate join already pays — O(index) per batch, the one
    deliberately-accepted history term (module docstring says a real
    deployment keeps a running count table instead);
  * candidate-verify work grows with the number of true cross-batch
    near-dups the corpus actually contains.

Usage: python scripts/breakdown_incremental_flatness.py [n_batches]
Prints one JSON line per operator.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.operators.similarity import sample_centroids
from duckdb_vortex_spark.session import get_spark
from duckdb_vortex_spark.sources.vortex import register
from duckdb_vortex_spark.streaming.incremental_neardup import neardup_process_batch
from duckdb_vortex_spark.streaming.incremental_pipeline import ingest_process_batch

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("dvs-incremental-flatness")
    register(spark)
    docs = load(spark, SF_DIR, "documents").persist()
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    step = (len(ids) + n_batches - 1) // n_batches
    chunks = [ids[i * step : (i + 1) * step] for i in range(n_batches)]

    out = {"sf_dir": SF_DIR, "n_batches": n_batches, "batch_rows": step}

    root = tempfile.mkdtemp(prefix="flat_nd_")
    dirs = [os.path.join(root, d) for d in ("raw", "idx", "man")]
    times = []
    for b, chunk in enumerate(chunks):
        t0 = time.monotonic()
        neardup_process_batch(docs.filter(F.col("doc_id").isin(chunk)), b, *dirs)
        times.append(round(time.monotonic() - t0, 2))
    shutil.rmtree(root, ignore_errors=True)
    out["neardup_per_batch_s"] = times
    out["neardup_last_over_first"] = round(times[-1] / times[0], 2)

    emb = load(spark, SF_DIR, "embeddings")
    corpus = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("vec")),
        "doc_id",
    ).persist()
    cids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    cstep = (len(cids) + n_batches - 1) // n_batches
    cchunks = [cids[i * cstep : (i + 1) * cstep] for i in range(n_batches)]
    centroids = sample_centroids(emb, 16)
    root = tempfile.mkdtemp(prefix="flat_chain_")
    ctimes = []
    for b, chunk in enumerate(cchunks, start=1):
        t0 = time.monotonic()
        ingest_process_batch(
            corpus.filter(F.col("doc_id").isin(chunk)), b, centroids, root
        )
        ctimes.append(round(time.monotonic() - t0, 2))
    shutil.rmtree(root, ignore_errors=True)
    out["chain_per_batch_s"] = ctimes
    out["chain_last_over_first"] = round(ctimes[-1] / ctimes[0], 2)
    out["chain_batch_rows"] = cstep
    print(json.dumps(out))


if __name__ == "__main__":
    main()
