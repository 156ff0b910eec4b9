"""Chain-LEVEL concurrent maintenance (VERDICT r11 next #8): the
per-store single-writer lease is contention/steal/pid-guard tested in
test_streaming.py, but `compact_chain_stores` walks FOUR stores
sequentially, releasing each lease before taking the next — so two
operators racing whole-chain passes interleave at store granularity.
This drives that interleaving with two REAL processes (own JVMs, own
sessions) synchronized to start together, and pins the chain-level
contract:

- no silent double-compaction: a racer that lands on a store whose
  lease is held fails LOUDLY with the single-writer RuntimeError (and
  aborts its pass — partial chain coverage is fine, corrupted stores
  are not); racers that happen to interleave without overlap may both
  succeed.
- whatever the interleaving, at least one pass makes progress, no
  `.maintenance-lock` survives either exit (winner releases in its
  finally; loser never acquired), store CONTENT is untouched, and a
  follow-up sequential pass over the same chain succeeds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from pyspark.sql import functions as F

_WORKER = r"""
import json, os, sys, time
root, go = sys.argv[1], sys.argv[2]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.driver.memory", "2g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from duckdb_vortex_spark.sources.vortex import register
from duckdb_vortex_spark.streaming.incremental_pipeline import compact_chain_stores
register(spark)
# barrier: both workers pay JVM startup BEFORE the gun fires, so the
# chain walks actually overlap
while not os.path.exists(go):
    time.sleep(0.01)
try:
    out = compact_chain_stores(spark, root, before=10)
    print(json.dumps({"ok": True, "stores": sorted(k for k, v in out.items() if v)}))
except RuntimeError as e:
    print(json.dumps({"ok": False, "err": str(e)[:400]}))
spark.stop()
"""


def _build_chain(spark, root: str, n_batches: int = 6, rows_per: int = 4000):
    """A synthetic chain shaped like the ingest pipeline's
    state (same store names/sort keys), big enough that one store's
    compaction takes long enough for two chain walks to overlap."""
    from duckdb_vortex_spark.sources.vortex import register
    from duckdb_vortex_spark.streaming.sinks import overwrite_batch_atomic

    register(spark)
    for b in range(n_batches):
        base = spark.range(b * rows_per, (b + 1) * rows_per)
        overwrite_batch_atomic(
            base.select(
                F.col("id"),
                F.sha2(F.col("id").cast("string"), 256).alias("fp"),
            ),
            os.path.join(root, "raw"),
            b,
        )
        overwrite_batch_atomic(
            base.select(
                (F.col("id") % 16).cast("int").alias("band"),
                F.xxhash64("id").alias("h"),
            ),
            os.path.join(root, "lsh"),
            b,
        )
        overwrite_batch_atomic(
            base.select(
                (F.col("id") % 32).cast("int").alias("cluster_id"), F.col("id")
            ),
            os.path.join(root, "ivf"),
            b,
        )


def _store_counts(spark, root: str) -> dict[str, int]:
    from duckdb_vortex_spark.streaming.sinks import read_vortex_dataset_tiered

    return {
        s: read_vortex_dataset_tiered(spark, os.path.join(root, s)).count()
        for s in ("raw", "lsh", "ivf")
    }


def test_two_processes_racing_chain_maintenance(spark, tmp_path):
    root = str(tmp_path / "chain")
    _build_chain(spark, root)
    before = _store_counts(spark, root)

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    go = str(tmp_path / "go")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), root, go],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
            cwd="/root/repo",
        )
        for _ in range(2)
    ]
    time.sleep(1.0)  # let both JVMs come up against the barrier
    with open(go, "w") as f:
        f.write("go")
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        outs.append(json.loads(stdout.decode().strip().splitlines()[-1]))

    oks = [o for o in outs if o["ok"]]
    errs = [o for o in outs if not o["ok"]]
    # at least one full pass lands; a loser must have failed on the
    # single-writer lease (live-holder contention), nothing else
    assert oks, outs
    for e in errs:
        assert "held by live pid" in e["err"], e

    # no lease survives either exit path
    for s in ("raw", "lsh", "ivf"):
        assert not os.path.exists(os.path.join(root, s, ".maintenance-lock")), s

    # content untouched by the race, and the chain still maintains
    assert _store_counts(spark, root) == before
    from duckdb_vortex_spark.streaming.incremental_pipeline import (
        compact_chain_stores,
    )

    follow_up = compact_chain_stores(spark, root, before=10)
    assert set(follow_up) == {"raw", "lsh", "ivf"}
    assert _store_counts(spark, root) == before
