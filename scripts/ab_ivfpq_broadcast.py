"""Interleaved same-session A/B of the ivfpq probe-join broadcast
hint: arm A = F.broadcast(qry) (current code), arm B = no hint
(monkeypatched identity). Full catalog entry, noop sink, per-run
release (the bench harness's hygiene). Usage: [n_pairs]"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _materialize  # noqa: E402
from duckdb_vortex_spark import catalog  # noqa: E402
from duckdb_vortex_spark.operators import similarity  # noqa: E402
from duckdb_vortex_spark.session import get_spark, release_persisted  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dvs-ab-ivfpq")
    b = catalog.queries()["similarity_ivfpq_ann"]
    real_broadcast = similarity.F.broadcast
    out = {"with_broadcast": [], "no_broadcast": []}

    def run_once() -> float:
        t0 = time.monotonic()
        _materialize(b(spark, sf_dir))
        dt = time.monotonic() - t0
        release_persisted()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        return round(dt, 3)

    run_once()  # warm-up arm A
    similarity.F.broadcast = lambda df: df
    run_once()  # warm-up arm B
    similarity.F.broadcast = real_broadcast
    for _ in range(n):
        similarity.F.broadcast = real_broadcast
        out["with_broadcast"].append(run_once())
        similarity.F.broadcast = lambda df: df
        out["no_broadcast"].append(run_once())
    similarity.F.broadcast = real_broadcast
    print(
        json.dumps(
            {
                "runs": out,
                "medians": {k: statistics.median(v) for k, v in out.items()},
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
