"""Interleaved A/B for a REJECTED r16 candidate: overlapping
`retrieval_ann_tuning_curve`'s seven independent leg materializations
(exact baseline + 3 ivf + 3 pq probes) on the §2.6 action pool, vs
the shipped serial eager checkpoints. Result (r16, 3 pairs each on a
loaded and an idle box, rows identical across arms): overlap LOSES
under load (13.66 -> 15.17 s medians) and is a wash idle
(10.42 -> 9.79 s) — the legs are multi-task jobs that already keep
the cores busy, unlike the chains' tiny store writes, so overlapping
contended jobs buys nothing (guide §2.6 helps when a job's tail
leaves cores IDLE). Evidence committed in
plans/r16/tuning_curve_overlap_ab_rejected.txt; the candidate edit
was reverted. Re-run: python scripts/ab_tuning_curve_overlap.py
(requires the overlap edit reapplied to mean anything — on shipped
code both arms are the same serial path, since the kill switch only
gates pool submission).

NOTE on arms: this drives the entry via the DVS_OVERLAP_WRITES kill
switch that the candidate edit routed its pool submissions through;
arm 0 = serial inline, arm 1 = pooled."""
import os, sys, time, statistics
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
from duckdb_vortex_spark.session import get_spark, release_persisted
from duckdb_vortex_spark.sources.vortex import register
from duckdb_vortex_spark.catalog import queries

SF = "/root/testdata/sf0.01"
spark = get_spark("ab-tuning-overlap", cpus=8)
register(spark)
fn = queries()["retrieval_ann_tuning_curve"]

def run(arm):
    os.environ["DVS_OVERLAP_WRITES"] = arm
    t0 = time.monotonic()
    pdf = fn(spark, SF).toPandas()
    dt = time.monotonic() - t0
    release_persisted()
    return dt, sorted(map(tuple, pdf.values.tolist()))

rows = {}
times = {"0": [], "1": []}
for pair in range(3):
    for arm in ("0", "1"):
        dt, r = run(arm)
        times[arm].append(round(dt, 2))
        rows.setdefault(arm, r)
        assert r == rows[arm], "nondeterminism within arm"
print("row-identical across arms:", rows["0"] == rows["1"])
for arm in ("0", "1"):
    print(f"arm {arm}: runs {times[arm]} median {statistics.median(times[arm]):.2f}s")
spark.stop()
