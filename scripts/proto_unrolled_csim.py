"""Prototype A/B: interpreted-HOF csim/d2 vs unrolled codegen-able
expressions (same IEEE fold order). Checks bit-equality on the corpus
and times both with the noop sink."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _materialize  # noqa: E402
from duckdb_vortex_spark.catalog import load  # noqa: E402
from duckdb_vortex_spark.operators.similarity import (  # noqa: E402
    _arr_sql,
    sample_centroids,
)
from duckdb_vortex_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def hof_csim(vec_col: str, v: list[float], vnorm: str) -> str:
    return (
        f"(aggregate(zip_with({vec_col}, {_arr_sql(v)}, "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x) "
        f"/ ({vnorm} * sqrt(aggregate(transform({_arr_sql(v)}, x -> x * x), "
        f"0.0D, (acc, x) -> acc + x))))"
    )


def unrolled_csim(vec_col: str, v: list[float], vnorm: str) -> str:
    dim = len(v)
    # identical fold: ((((0.0 + t0) + t1) + ...); cnorm folded in Python
    # with the same left-to-right IEEE order the HOF uses
    terms = "".join(
        f" + (CAST({vec_col}[{i}] AS DOUBLE) * {v[i]!r}D)" for i in range(dim)
    )
    acc = 0.0
    for x in v:
        acc = acc + x * x
    import math

    cnorm = math.sqrt(acc)
    return (
        f"(CASE WHEN size({vec_col}) = {dim} THEN (0.0D{terms}) "
        f"ELSE CAST(NULL AS DOUBLE) END / ({vnorm} * {cnorm!r}D))"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dvs-proto-unrolled")
    emb = load(spark, sf_dir, "embeddings")
    rows = sorted(
        (r["cluster_id"], [float(x) for x in r["centroid"]])
        for r in sample_centroids(emb, 16).collect()
    )
    base = emb.select(
        "vec_id", F.col("embedding"), F.expr(
            "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * "
            "CAST(x AS DOUBLE)), 0.0D, (acc, x) -> acc + x))"
        ).alias("vnorm"),
    )
    hof = base.select(
        "vec_id",
        *[F.expr(hof_csim("embedding", v, "vnorm")).alias(f"c{i}")
          for i, (_, v) in enumerate(rows)],
    )
    unr = base.select(
        "vec_id",
        *[F.expr(unrolled_csim("embedding", v, "vnorm")).alias(f"c{i}")
          for i, (_, v) in enumerate(rows)],
    )
    a = {r["vec_id"]: tuple(r[f"c{i}"] for i in range(len(rows))) for r in hof.collect()}
    b = {r["vec_id"]: tuple(r[f"c{i}"] for i in range(len(rows))) for r in unr.collect()}
    identical = a == b
    diffs = sum(1 for k in a if a[k] != b[k])
    out = {"bit_identical": identical, "n_diff_rows": diffs}
    for name, df in (("hof", hof), ("unrolled", unr)):
        _materialize(df)  # warm
        runs = []
        for _ in range(n):
            t0 = time.monotonic()
            _materialize(df)
            runs.append(round(time.monotonic() - t0, 3))
        out[name] = {"runs": runs, "median": statistics.median(runs)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
