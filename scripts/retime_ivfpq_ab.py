"""A/B the IVF-PQ persist-barrier storage level (VERDICT r5 #4): the
builder's r5 retime caught one 11.0 s run among five (others
2.87-3.40) on similarity_ivfpq_ann, attributed to GC over the
persisted codebook/codes barriers. This interleaves MEMORY_AND_DISK
(deserialized on-heap cache) against DISK_ONLY (serialized, off the
GC heap) in ONE session at sf0.1, n runs each, and reports the full
distribution — the TAIL (max) is the decision variable, not the
median. Each run unpersists everything first so every arm pays its
own cache build.

Usage: python scripts/retime_ivfpq_ab.py [n]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel

from bench import _materialize
from duckdb_vortex_spark import catalog
from duckdb_vortex_spark.operators import similarity
from duckdb_vortex_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dvs-ivfpq-ab")
    q = catalog.queries()["similarity_ivfpq_ann"]
    arms = {
        "memory_and_disk": StorageLevel.MEMORY_AND_DISK,
        "disk_only": StorageLevel.DISK_ONLY,
    }
    # The knob the plan actually reads is PQ_CODES_STORAGE (the
    # corpus-side barrier; _pq_barrier(corpus=True)).  An earlier
    # version of this script set a nonexistent PQ_BARRIER_STORAGE
    # attribute, so both arms ran the shipped plan — that run's
    # "median-identical" result was a measurement of nothing
    # (ADVICE r6).  Restore the shipped default on exit.
    shipped = similarity.PQ_CODES_STORAGE
    runs: dict[str, list[float]] = {k: [] for k in arms}
    for lvl in arms.values():  # warm both arms once
        similarity.PQ_CODES_STORAGE = lvl
        _materialize(q(spark, sf_dir))
        spark.catalog.clearCache()
    for _ in range(n):
        for k, lvl in arms.items():
            similarity.PQ_CODES_STORAGE = lvl
            spark.catalog.clearCache()  # each run rebuilds its barriers
            t0 = time.monotonic()
            _materialize(q(spark, sf_dir))
            runs[k].append(round(time.monotonic() - t0, 4))
    similarity.PQ_CODES_STORAGE = shipped
    out = {
        k: {
            "runs": sorted(v),
            "min": min(v),
            "median": round(statistics.median(v), 4),
            "max": max(v),
        }
        for k, v in runs.items()
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
