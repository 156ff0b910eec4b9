"""Same-harness re-timing for bench movers (VERDICT r2 item 2).

Runs the named queries under the IDENTICAL harness bench.py uses
(noop-sink full materialization, per-query unpersist + GC) but with
n timed runs per query, reporting min/median/max and relative spread
so a >2x round-over-round delta can be attributed to plan change vs
box noise. Prints one JSON line.

Usage: python scripts/retime.py [n] [query ...]
Defaults: n=5, the three r2 movers.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _materialize, HEADLINE  # noqa: F401 (same harness)
from duckdb_vortex_spark import catalog
from duckdb_vortex_spark.session import get_spark

DEFAULT = ["join_asof_backward", "window_time_range_rolling", "tpch_q1_pricing_summary"]


def main() -> None:
    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 5
    names = [a for a in args if not a.isdigit()] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dvs-retime")
    qs = catalog.queries()
    out: dict[str, dict] = {}
    for name in names:
        b = qs[name]
        _materialize(b(spark, sf_dir))  # warm-up
        runs = []
        for _ in range(n):
            t0 = time.monotonic()
            _materialize(b(spark, sf_dir))
            runs.append(round(time.monotonic() - t0, 4))
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        mn, md, mx = min(runs), statistics.median(runs), max(runs)
        out[name] = {
            "runs": runs,
            "min": mn,
            "median": md,
            "max": mx,
            "spread": round((mx - mn) / mn, 3),
        }
    print(json.dumps({"sf_dir": sf_dir, "n": n, "queries": out}))


if __name__ == "__main__":
    main()
