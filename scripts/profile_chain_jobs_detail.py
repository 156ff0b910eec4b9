"""Attribute every Spark job one chain micro-batch fires: job id,
description (call site), duration, task count — via the driver's
AppStatusStore. Run 3 batches; dump the LAST batch's jobs (steady
state: history reads engaged).

Usage: python scripts/profile_chain_jobs_detail.py [n_batches] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import tempfile

from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.operators.similarity import sample_centroids
from duckdb_vortex_spark.session import get_spark
from duckdb_vortex_spark.sources.vortex import register
from duckdb_vortex_spark.streaming import incremental_pipeline as ip

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("dvs-chain-jobs")
    register(spark)
    sc = spark.sparkContext
    docs = load(spark, SF_DIR, "documents")
    emb = load(spark, SF_DIR, "embeddings")
    corpus = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("vec")),
        "doc_id",
    ).persist()
    from pyspark.sql import Window
    corpus = corpus.withColumn(
        "__b", F.ntile(n_batches).over(Window.orderBy("doc_id"))
    ).persist()
    step = corpus.count() // n_batches
    centroids = sample_centroids(emb, 16).persist()
    root = tempfile.mkdtemp(prefix="chain_jobs_")
    st = sc.statusTracker()
    try:
        for b in range(1, n_batches + 1):
            group = f"chain-b{b}"
            sc.setJobGroup(group, f"chain batch {b}")
            t0 = time.monotonic()
            ip.ingest_process_batch(
                corpus.filter(F.col("__b") == b).drop("__b"), b, centroids, root
            )
            wall = time.monotonic() - t0
            sc.setJobGroup(None, None)
        jobs = sorted(st.getJobIdsForGroup(group))
        store = sc._jsc.sc().statusStore()
        print(f"last batch wall={wall:.2f}s, {len(jobs)} jobs:")
        total = 0.0
        for jid in jobs:
            j = store.job(jid)
            dur = (j.completionTime().get().getTime() - j.submissionTime().get().getTime()) / 1000.0
            total += dur
            desc = j.description().get() if j.description().isDefined() else j.name()
            print(f"  job {jid}: {dur:6.3f}s tasks={j.numTasks():3d} "
                  f"stages={j.stageIds().size()} {str(desc)[:110]}")
            if dur > 0.4:
                sids = j.stageIds()
                for i in range(sids.size()):
                    sid = sids.apply(i)
                    info = st.getStageInfo(sid)
                    if info:
                        print(f"      stage {sid}: tasks={info.numTasks} "
                              f"{info.name[:160]}")
        print(f"sum of job durations: {total:.2f}s (gaps = driver-side planning)")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
