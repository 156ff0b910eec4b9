"""Count the Spark ACTIONS (jobs) one integrated-chain micro-batch
fires and attribute its wall time, before/after the r16 fusion work
(VERDICT r15 next-round #1: the per-batch cost is dozens of actions,
each paying scheduler + Python-datasource task-launch overhead on
near-empty data — not writer throughput).

Per batch this prints: total wall seconds, number of Spark jobs (from
the batch's job group), and the wall seconds of every store write
(monkeypatched `_overwrite_batch`) so the residual (reads + collect +
driver-side planning) is visible.

Usage: python scripts/profile_chain_actions.py [n_batches] [sf_dir]
One JSON line at the end.
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
from duckdb_vortex_spark.streaming import incremental_pipeline as ip

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("dvs-chain-actions")
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

    # time every store write without copying the chain body
    write_log: list[tuple[str, float]] = []
    orig_write = ip._overwrite_batch

    def timed_write(df, base, batch_id, **kw):
        t0 = time.monotonic()
        orig_write(df, base, batch_id, **kw)
        write_log.append((os.path.basename(base), round(time.monotonic() - t0, 3)))

    ip._overwrite_batch = timed_write

    # A/B knobs: DVS_CHAIN_AQE=off disables AQE for the batch actions,
    # DVS_CHAIN_SHUFFLE=N sets shuffle partitions (micro-plan scope)
    if os.environ.get("DVS_CHAIN_AQE") == "off":
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    shuf = os.environ.get("DVS_CHAIN_SHUFFLE")
    if shuf:
        spark.conf.set("spark.sql.shuffle.partitions", shuf)

    root = tempfile.mkdtemp(prefix="chain_actions_")
    out = {"sf_dir": SF_DIR, "n_batches": n_batches, "batch_rows": step, "batches": []}
    st = sc.statusTracker()
    try:
        for b in range(1, n_batches + 1):
            write_log.clear()
            group = f"chain-b{b}"
            sc.setJobGroup(group, f"chain batch {b}")
            t0 = time.monotonic()
            ip.ingest_process_batch(
                corpus.filter(F.col("__b") == b).drop("__b"), b, centroids, root
            )
            wall = round(time.monotonic() - t0, 3)
            sc.setJobGroup(None, None)
            jobs = st.getJobIdsForGroup(group)
            writes = {f"write_{k}": v for k, v in write_log}
            out["batches"].append(
                {
                    "batch": b,
                    "wall_s": wall,
                    "n_jobs": len(jobs),
                    **writes,
                    "writes_total_s": round(sum(v for _, v in write_log), 3),
                }
            )
            print(json.dumps(out["batches"][-1]), flush=True)
    finally:
        ip._overwrite_batch = orig_write
        shutil.rmtree(root, ignore_errors=True)
    walls = [x["wall_s"] for x in out["batches"]]
    out["wall_per_batch_s"] = walls
    out["jobs_per_batch"] = [x["n_jobs"] for x in out["batches"]]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
