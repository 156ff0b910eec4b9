#!/usr/bin/env python
"""Head-to-head single-node throughput: this engine (Spark local[N])
vs the reference's engine (DuckDB — the reference extension's runtime,
SURVEY.md §0) executing each headline entry's own DuckDB oracle SQL on
the SAME parquet tables at the same scale factor.

Method notes (read before quoting numbers):
- Per-query harness mirrors bench.py: one warm-up run, then the
  MEDIAN of 3 timed runs (round 4 — best-of-2 on this box's 30-80%
  noise manufactured phantom movers, CHANGES_r4.md); Spark side fully
  materializes via the noop sink, DuckDB side via ``fetchall()``
  (both consume every output row/column).
- The oracle SQL is written for CROSS-ENGINE DETERMINISM (exact
  decimal/quantized intermediates), not minimal DuckDB cost, and a few
  entries' oracles use deliberately naive forms (exact quadratic
  verifies) where the Spark side is the production shape — those rows
  favor Spark for reasons the per-row notes call out. TPC-H and the
  window/stream rows are shape-equivalent on both sides and are the
  fair comparison set.
- DuckDB runs with its default thread count (all cores), same as
  Spark's local[*] parallelism.

Output: one JSON line {"spark_total": s, "duckdb_total": s, "queries":
{name: {"spark": s, "duckdb": s}}} plus a readable table on stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import HEADLINE, run_one  # noqa: E402
from duckdb_vortex_spark import catalog  # noqa: E402
from duckdb_vortex_spark.session import get_spark  # noqa: E402


def duck_time(con: duckdb.DuckDBPyConnection, sql: str) -> float:
    t0 = time.monotonic()
    con.execute(sql).fetchall()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    la0 = list(os.getloadavg())  # VERDICT r14 next #8: annotate box load
    spark = get_spark("dvs-bench-vs-duckdb")
    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    names = [n for n in HEADLINE if n in qs and n in oracles]
    if len(sys.argv) > 1:  # optional subset: entry names as argv
        names = [n for n in sys.argv[1:] if n in qs and n in oracles]

    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    out: dict[str, dict[str, float]] = {}
    for name in names:
        run_one(spark, qs[name], sf_dir)  # warm-up
        s_t = statistics.median(run_one(spark, qs[name], sf_dir) for _ in range(3))
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        duck_time(con, oracles[name])  # warm-up
        d_t = statistics.median(duck_time(con, oracles[name]) for _ in range(3))
        out[name] = {"spark": round(s_t, 4), "duckdb": round(d_t, 4)}
        print(
            f"{name:40s} spark={s_t:7.3f}s duckdb={d_t:7.3f}s "
            f"ratio={s_t / max(d_t, 1e-9):5.2f}x",
            file=sys.stderr,
        )

    spark_total = round(sum(v["spark"] for v in out.values()), 4)
    duck_total = round(sum(v["duckdb"] for v in out.values()), 4)
    print(
        json.dumps(
            {
                "spark_total": spark_total,
                "duckdb_total": duck_total,
                "sf_dir": sf_dir,
                "queries": out,
                "loadavg_start": la0,
                "loadavg_end": list(os.getloadavg()),
            }
        )
    )


if __name__ == "__main__":
    main()
