"""Sweep PQ quantization parameters against the measured recall plateau.

The r9 ANN tuning curve (`retrieval_ann_tuning_curve`) proved that at
m=4 / k_codes=16 on the 64-dim embeddings, IVF-PQ recall@10 is FLAT
(~0.055-0.13) in n_probe — quantization error dominates, so spending
more probes buys nothing. The knob that matters there is the code
budget: m (subspaces — bytes per vector) and k_codes (codewords per
subspace). This script sweeps m x k_codes at fixed n_probe and prints
one JSON line with recall@10 and the memory cost per vector, the
recall/memory trade SCALE.md records and tests/test_similarity_pq.py
pins (some configuration must beat the m=4 plateau at equal n_probe).

Memory accounting (the 100 TB axis): an IVF-PQ index stores m code
ids per vector — ceil(log2(k_codes)/8) bytes each in a packed layout —
vs 64 * 4 bytes for the raw float vector; the codebooks themselves are
m * k_codes * (64/m) floats, broadcast once, independent of corpus
size.

Usage: python scripts/sweep_pq_params.py [sf_dir] [n_probe]
"""

from __future__ import annotations

import json
import math
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_vortex_spark.catalog import load  # noqa: E402
from duckdb_vortex_spark.operators.similarity import (  # noqa: E402
    ivfpq_topk,
    topk_bruteforce,
)


def pq_recall_at_10(spark, sf_dir: str, m: int, k_codes: int, n_probe: int) -> dict:
    """recall@10 of ivfpq_topk(m, k_codes) vs the exact top-10, over
    the every-20th-vector query set the tuning-curve entry uses."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    exact = (
        topk_bruteforce(queries, emb, k=10)
        .select("query_id", "cand_id")
        .localCheckpoint(eager=True)
    )
    nq = queries.count()
    ann = ivfpq_topk(
        queries, emb, k=10, n_clusters=16, n_probe=n_probe, m=m, k_codes=k_codes
    ).select("query_id", "cand_id")
    hits = ann.join(exact, ["query_id", "cand_id"]).count()
    return {
        "m": m,
        "k_codes": k_codes,
        "n_probe": n_probe,
        "recall_at_10": round(hits / (10 * nq), 4),
        "hits": hits,
        "n_queries": nq,
        "code_bytes_per_vector": m * math.ceil(math.log2(k_codes) / 8),
        "raw_bytes_per_vector": 64 * 4,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_probe = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("sweep_pq_params")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for m in (4, 8, 16):
        for k_codes in (16, 64):
            rows.append(pq_recall_at_10(spark, sf_dir, m, k_codes, n_probe))
            print(json.dumps({"progress": rows[-1]}), file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "n_probe": n_probe, "sweep": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
