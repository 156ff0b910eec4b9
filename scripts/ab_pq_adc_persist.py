"""Interleaved A/B for VERDICT r15 next #5: re-measure pq_adc_topk's
crossJoin persist barriers under the broadcast era. The r5 measurement
(8.4 s vs 1.5 s per-pair HOF re-evaluation blowup) predates the
F.broadcast(q) hint; the question is whether the QUERY-side persist is
now redundant (the BroadcastExchange is a materialization barrier —
the same reasoning that removed the probe persists in r15 §3), and
whether the CODES-side persist still earns its keep.

Arms (alternating run-by-run in one session so box drift hits all):
  P  — current code: _pq_barrier on q and c, F.broadcast(q).crossJoin(c)
  NQ — no q persist (broadcast is the barrier), c persist kept
  NN — no persists at all (the r5 blowup shape, now with broadcast)

Also checks all arms' results are row-identical once.

Usage: python scripts/ab_pq_adc_persist.py [n_rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _materialize  # noqa: E402
from duckdb_vortex_spark.catalog import load  # noqa: E402
from duckdb_vortex_spark.operators.similarity import (  # noqa: E402
    W,
    _d2_vec_sql,
    _pq_barrier,
    pq_codebooks,
    pq_encode,
)
from duckdb_vortex_spark.session import get_spark, release_persisted  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def adc_variant(queries_df, codes_df, codebooks, k, persist_q, persist_c):
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    dtab_cols = [
        F.expr(_d2_vec_sql("embedding", codebooks[s], s, dsub)).alias(f"__dtab{s}")
        for s in range(m)
    ]
    q = queries_df.select(F.col("vec_id").alias("query_id"), *dtab_cols)
    if persist_q:
        q = _pq_barrier(q)
    c = codes_df.select(F.col("vec_id").alias("cand_id"), "codes")
    if persist_c:
        c = _pq_barrier(c, corpus=True)
    ad2 = None
    for s in range(m):
        term = F.element_at(f"__dtab{s}", F.col("codes")[s] + 1)
        ad2 = term if ad2 is None else ad2 + term
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id", "cand_id", ad2.alias("approx_d2")
    )
    w = W.partitionBy("query_id").orderBy("approx_d2", "cand_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "approx_d2")
    )


ARMS = {"P": (True, True), "NQ": (False, True), "NN": (False, False)}


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dvs-ab-pq-adc-persist")
    emb = load(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, m=4, k=16)
    qdf = emb.filter(F.col("vec_id") % 20 == 0)

    def run(arm: str) -> float:
        pq, pc = ARMS[arm]
        t0 = time.monotonic()
        codes = pq_encode(emb, books)
        _materialize(adc_variant(qdf, codes, books, 10, pq, pc))
        dt = time.monotonic() - t0
        release_persisted()
        spark.catalog.clearCache()
        return round(dt, 3)

    # one-time row-identity check across arms
    ref = None
    for arm in ARMS:
        pq, pc = ARMS[arm]
        rows = sorted(
            map(tuple, adc_variant(qdf, pq_encode(emb, books), books, 10, pq, pc).collect())
        )
        release_persisted()
        spark.catalog.clearCache()
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"arm {arm} diverged"
    print("arms row-identical", flush=True)

    results = {a: [] for a in ARMS}
    for r in range(n_rounds):
        for arm in ARMS:
            results[arm].append(run(arm))
            print(f"round {r} arm {arm}: {results[arm][-1]}s "
                  f"load={os.getloadavg()[0]:.2f}", flush=True)
    for arm, xs in results.items():
        print(f"{arm}: median {statistics.median(xs):.3f}s runs={xs}")


if __name__ == "__main__":
    main()
