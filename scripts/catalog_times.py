"""Full-catalog timing tier (VERDICT r5 #8): one warm sf0.01 pass over
EVERY catalog entry, per-entry wall seconds to CATALOG_TIMES.json.

The bench headline set covers ~28 queries; the other ~200 entries had
no per-round timing signal, so a perf regression outside the headline
set stayed invisible until it compounded. This artifact is the cheap
tripwire: a single warm execution per entry (Spark side only — the
DuckDB oracle is the correctness gate's job), n=1, so on this box
(30–80% cross-session spread) only LARGE moves are signal. The
comparison printout therefore flags ≥3× against the previous artifact,
not small drifts.

Usage:
    python scripts/catalog_times.py            # writes CATALOG_TIMES.json
    python scripts/catalog_times.py --compare  # also diff vs existing file
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
SF_DIR = "/root/testdata/sf0.01"
OUT = ROOT / "CATALOG_TIMES.json"


def main() -> None:
    prev = None
    if OUT.exists():
        try:
            prev = json.loads(OUT.read_text())
        except Exception:
            prev = None

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, str(ROOT))
    import __spark_entry__ as E

    qs = E.queries()
    # one tiny warm-up so the first timed entry doesn't absorb JVM/
    # codegen warm-up costs the others never pay
    next(iter(qs.values()))(spark, SF_DIR).limit(1).collect()

    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        t_e = time.time()
        try:
            fn(spark, SF_DIR).toPandas()
            times[name] = round(time.time() - t_e, 3)
        except Exception as e:  # timing tier must not mask the gate
            errs[name] = f"{type(e).__name__}: {e}"
        if (i + 1) % 50 == 0:
            print(f"  {i + 1}/{len(qs)} ({time.time() - t0:.0f}s)", flush=True)

    doc = {
        "sf": 0.01,
        "n_timed": 1,
        "note": "single warm pass, Spark side only; n=1 on a 30-80%-spread "
                "box — treat <3x moves as noise, use scripts/retime.py to "
                "settle anything flagged",
        "total_sec": round(time.time() - t0, 1),
        "entries": times,
        "errors": errs,
    }
    OUT.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT}: {len(times)} entries, total {doc['total_sec']}s"
          + (f", {len(errs)} ERRORS" if errs else ""))

    if prev and prev.get("entries"):
        moved = []
        for name, t in times.items():
            p = prev["entries"].get(name)
            if p and p > 0.05 and t / p >= 3.0:
                moved.append((t / p, name, p, t))
        for r, name, p, t in sorted(moved, reverse=True):
            print(f"  REGRESSION? {name}: {p:.2f}s -> {t:.2f}s ({r:.1f}x)")
        if not moved:
            print("  no >=3x regressions vs previous artifact")
    if errs:
        sys.exit(1)


if __name__ == "__main__":
    main()
