#!/usr/bin/env python
"""Skewed-replica leg of the amortization harness (VERDICT r11 next
#2): the ×4/×8 replicas remap keys uniformly, but real 100-TB fact
tables are Zipfian. This leg rebuilds the ×8 replica with a HOT ORDER
KEY — a configurable fraction of ALL lineitem rows remapped onto one
o_orderkey that exists in orders — and answers, with measurements and
final-adaptive-plan inspection, the last untested question about the
r11 merge-pinned fact-fact plans: do they survive a hot key, and is
it AQE's skew-join split that saves them?

What it measures, per query (q21 / q12 / q4 — the three contract-
pinned lineitem⋈orders SMJs) and per variant:

- ``uniform``    : the standard ×8 replica (control).
- ``skew``       : the hot-key ×8 replica, default AQE settings.
- ``skew_tuned`` : the hot-key replica with the skew thresholds scaled
  DOWN to this box's partition sizes (skewedPartitionThresholdInBytes
  + advisoryPartitionSizeInBytes + forceOptimizeSkewedJoin=true).
  At 100 TB the hot partition dwarfs the default 256 MB threshold on
  its own; at ~100 MB sf0.1×8 it does not, so the tuned variant is
  the faithful scale model and the default variant shows the
  local-mode behavior gap.

For each (query, variant) it records the median wall, whether the
final adaptive plan (captured AFTER an action on the same
QueryExecution) contains a skew-split marker (``skew=true`` on the
SMJ / ``AQEShuffleRead ... skewed``), and the DuckDB wall on the same
parquet for the head-to-head frame. Expected shape of the result
(pinned by tests/test_skew_aqe.py on a synthetic): q21/q12's inner
SMJs split; q4's LeftSemi does NOT split right-side skew (Spark can
only split the left/stream side of a semi join — splitting the build
side would duplicate stream matches), so its defense is that the
skewed side is the BUILD side of a sort-merge whose per-key work is
a streamed sort, plus ``plans/skew.salted_aggregate`` where a
downstream per-key aggregate concentrates.

Usage:
    python scripts/skew_replica_leg.py [--k 8] [--hot-pct 15] [--keep]
Prints one JSON line on stdout; readable tables on stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from scripts.scale_amortization import (  # noqa: E402
    OFF,
    SF_DIR,
    WORK,
    build_replica_dir,
)
from duckdb_vortex_spark import catalog  # noqa: E402

QUERIES = [
    "tpch_q21_waiting_supplier",
    "tpch_q12_late_shipment_priority",
    "tpch_q4_order_priority",
]

# Skew thresholds for the tuned variant, scaled to this box: at ×8
# sf0.1 the hot partition holds ~10^6 joined rows ≈ tens of MB — far
# under the 256 MB default that a real 100-TB hot partition would
# blow through, so the default-variant run shows AQE sitting out and
# the tuned variant shows what engages at scale-faithful thresholds.
TUNED = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(4 << 20),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(2 << 20),
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    # q21/q12 reuse the join's exchange for downstream same-key
    # groupBys; without force, AQE skips the split rather than add
    # the extra shuffle the split requires
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}

# the two plan-text forms OptimizeSkewedJoin leaves behind, pinned on
# synthetics by tests/test_skew_aqe.py so an upgrade that changes the
# text breaks CI rather than silently reading as "no split"
SKEW_MARKERS = ("skew=true", "AQEShuffleRead skewed")


def build_skew_dir(k: int, hot_pct: int) -> str:
    """The ×k replica with ``hot_pct`` % of lineitem ORDERS remapped
    onto one hot o_orderkey (hash-selected per original order so all
    lines of an order move together — orders are the natural unit of
    key skew in a warehouse). The hot key is an orderkey from replica
    0, so it exists exactly once in orders and the join semantics
    stay valid; everything else replicates exactly like
    ``build_replica_dir``."""
    out = os.path.join(WORK, f"x{k}skew{hot_pct}")
    marker = os.path.join(out, ".built.json")
    want = {"k": k, "src": SF_DIR, "hot_pct": hot_pct}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    con = duckdb.connect()
    hot = con.execute(
        f"SELECT min(o_orderkey) FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchone()[0]
    rep = {
        "lineitem": f"""
            SELECT * REPLACE (
              CASE WHEN hash(l_orderkey + r.r * 1000003) % 100 < {hot_pct}
                   THEN {hot}
                   ELSE l_orderkey + r.r * {OFF} END AS l_orderkey)
            FROM read_parquet('{SF_DIR}/lineitem.parquet'), range({k}) r(r)""",
        "orders": f"""
            SELECT * REPLACE (o_orderkey + r.r * {OFF} AS o_orderkey)
            FROM read_parquet('{SF_DIR}/orders.parquet'), range({k}) r(r)""",
        "events": f"""
            SELECT * REPLACE (event_id + r.r * {OFF} AS event_id,
                              user_id + r.r * {OFF} AS user_id)
            FROM read_parquet('{SF_DIR}/events.parquet'), range({k}) r(r)""",
        "documents": f"""
            SELECT * REPLACE (doc_id + r.r * {OFF} AS doc_id,
                              CASE WHEN r.r = 0 THEN text
                                   ELSE text || ' zqrep' || r.r END AS text)
            FROM read_parquet('{SF_DIR}/documents.parquet'), range({k}) r(r)""",
    }
    for t in catalog.TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if t in rep:
            con.execute(f"COPY ({rep[t]}) TO '{dst}' (FORMAT PARQUET)")
        else:
            shutil.copyfile(os.path.join(SF_DIR, f"{t}.parquet"), dst)
    con.close()
    with open(marker, "w") as f:
        json.dump(want, f)
    return out


def measure_variant_main(sf_dir: str, tuned: str) -> None:
    """Subprocess entry: one (replica dir, conf variant) per fresh
    process — identical session-aging treatment as the uniform ladder
    (scale_amortization.measure_one_main)."""
    from bench import run_one
    from duckdb_vortex_spark.plans.lint import formatted_plan
    from duckdb_vortex_spark.session import get_spark, quiet_accumulator_noise

    la0 = list(os.getloadavg())  # VERDICT r14 next #8: load-annotate legs
    spark = get_spark("dvs-skew-leg")
    quiet_accumulator_noise(spark)
    if tuned == "1":
        for k, v in TUNED.items():
            spark.conf.set(k, v)
    qs = catalog.queries()
    out: dict[str, dict] = {}
    for name in QUERIES:
        run_one(spark, qs[name], sf_dir)
        run_one(spark, qs[name], sf_dir)
        wall = statistics.median(run_one(spark, qs[name], sf_dir) for _ in range(5))
        # capture the FINAL adaptive plan: collect() finalizes the
        # DataFrame's own QueryExecution (these queries return ≤100
        # rows), after which the plan string carries skew markers if
        # OptimizeSkewedJoin rewrote a join
        df = qs[name](spark, sf_dir)
        df.collect()
        plan = formatted_plan(df)
        out[name] = {
            "spark": round(wall, 4),
            "skew_split": any(m in plan for m in SKEW_MARKERS),
        }
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        print(
            f"    {name:35s} {wall:7.3f}s skew_split={out[name]['skew_split']}",
            file=sys.stderr,
        )
    spark.stop()
    out["_loadavg_start"] = la0
    out["_loadavg_end"] = list(os.getloadavg())
    print(json.dumps(out), flush=True)


def duck_measure(sf_dir: str) -> dict[str, float]:
    oracles = catalog.oracle_sql()
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out = {}
    for name in QUERIES:
        con.execute(oracles[name]).fetchall()  # warm-up
        runs = []
        for _ in range(5):
            t0 = time.monotonic()
            con.execute(oracles[name]).fetchall()
            runs.append(time.monotonic() - t0)
        out[name] = round(statistics.median(runs), 4)
    con.close()
    return out


def main() -> None:
    k = int(sys.argv[sys.argv.index("--k") + 1]) if "--k" in sys.argv else 8
    hot = (
        int(sys.argv[sys.argv.index("--hot-pct") + 1])
        if "--hot-pct" in sys.argv
        else 15
    )
    print(f"-- building x{k} uniform + x{k} skew({hot}%) dirs --", file=sys.stderr)
    uni = build_replica_dir(k)
    skw = build_skew_dir(k, hot)

    variants = [
        ("uniform", uni, "0"),
        ("skew", skw, "0"),
        ("skew_tuned", skw, "1"),
    ]
    results: dict[str, dict] = {}
    for label, d, tuned in variants:
        print(f"-- measuring {label} ({d}, tuned={tuned}) --", file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure-one", d, tuned],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            check=True,
        )
        results[label] = json.loads(proc.stdout.decode().strip().splitlines()[-1])

    duck = {"uniform": duck_measure(uni), "skew": duck_measure(skw)}
    print(f"\n{'query':35s} {'uni':>8s} {'skew':>8s} {'tuned':>8s} "
          f"{'split(s/t)':>11s} {'duck uni':>9s} {'duck skew':>9s}",
          file=sys.stderr)
    for name in QUERIES:
        u, s, t = (results[v][name] for v in ("uniform", "skew", "skew_tuned"))
        print(
            f"{name:35s} {u['spark']:8.3f} {s['spark']:8.3f} {t['spark']:8.3f} "
            f"{str(s['skew_split'])[0]}/{str(t['skew_split'])[0]:>10s}"
            f"{duck['uniform'][name]:9.3f} {duck['skew'][name]:9.3f}",
            file=sys.stderr,
        )
    if "--keep" not in sys.argv:
        shutil.rmtree(os.path.join(WORK, f"x{k}skew{hot}"), ignore_errors=True)
    print(json.dumps(
        {"k": k, "hot_pct": hot, "spark": results, "duckdb": duck},
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    if "--measure-one" in sys.argv:
        i = sys.argv.index("--measure-one")
        measure_variant_main(sys.argv[i + 1], sys.argv[i + 2])
    else:
        main()
