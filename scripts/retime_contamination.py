"""Head-to-head retime of contamination_cross_source plan variants.

Round-3 verdict finding #1: the r3 rewrite (collect_set + map-side pair
expansion + tokenize-once exchange barrier) benched 1.92x SLOWER than
the r2 plan (inverted-index self-join, 5 shuffles) at sf0.1 on the
driver box, while the rewrite commit (f451600) had measured it 3.8x
FASTER. This script times every candidate plan under ONE harness
(same session, same warmup discipline, n runs, medians + spreads) so
the regression gets a named cause instead of dueling one-shot numbers.

Variants:
  r2        — historical plan: explode(shingles(text)) -> distinct ->
              countDistinct stop-filter -> self-join -> countDistinct.
  r3        — current plan: round-robin exchange barrier -> explode ->
              collect_set -> map-side ordered-pair expansion.
  r3_nobarrier — r3 without the repartition exchange (tokenize collapses
              into the per-index shingle lambda: the documented ~5x
              recompute trap, measured here on purpose).
  zipgram   — no barrier, no recompute trap: shingles via zip_with of
              shifted token-array slices, so tokens(text) appears a
              CONSTANT number of times per row (top-level args, not
              inside per-index lambdas).

Usage: python scripts/retime_contamination.py [n_runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_vortex_spark.operators.contamination import cross_source_shared_shingles
from duckdb_vortex_spark.operators.dedup import shingles, shingles_from_tokens
from duckdb_vortex_spark.operators.text import tokens

MAXLEN = 1 << 30  # slice length sentinel: "to end of array"


def plan_r2(d: DataFrame) -> DataFrame:
    sh = d.select(
        F.col("source").alias("src"), F.explode(shingles("text", 3)).alias("sh")
    ).distinct()
    rare = (
        sh.groupBy("sh")
        .agg(F.countDistinct("src").alias("nsrc"))
        .filter(F.col("nsrc") <= 10)
        .select("sh")
    )
    idx = sh.join(rare, "sh")
    a = idx.select(F.col("sh"), F.col("src").alias("src_a"))
    b = idx.select(F.col("sh"), F.col("src").alias("src_b"))
    return (
        a.join(b, "sh")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.countDistinct("sh").alias("n_shared"))
    )


def plan_r3(d: DataFrame) -> DataFrame:
    return cross_source_shared_shingles(d, "source", "text", n=3, max_sources=10)


def _pairs_agg(sh: DataFrame) -> DataFrame:
    sets = (
        sh.groupBy("sh")
        .agg(F.collect_set("src").alias("srcs"))
        .filter((F.size("srcs") >= 2) & (F.size("srcs") <= 10))
    )
    s = F.array_sort(F.col("srcs"))
    pairs = F.flatten(
        F.transform(
            s,
            lambda x, i: F.transform(
                F.slice(s, i + 2, F.size(s)),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    return (
        sets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count("*").alias("n_shared"))
    )


def plan_r3_nobarrier(d: DataFrame) -> DataFrame:
    tk = d.select(F.col("source").alias("src"), tokens("text").alias("toks"))
    sh = tk.select("src", F.explode(shingles_from_tokens(F.col("toks"), 3)).alias("sh"))
    return _pairs_agg(sh)


def zip_shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct n-gram shingles with tokens(text) referenced a CONSTANT
    number of times (n slices + the short-doc fallback), none inside a
    per-index lambda — so no exchange barrier is needed to avoid the
    per-shingle tokenization recompute."""
    assert n == 3, "written for trigram shingles"
    toks = tokens(text_col)
    t2 = F.slice(toks, 2, MAXLEN)
    t3 = F.slice(toks, 3, MAXLEN)
    inner = F.zip_with(
        t2,
        t3,
        lambda b, c: F.when(
            b.isNull() | c.isNull(), F.lit(None)
        ).otherwise(F.concat_ws(" ", b, c)),
    )
    grams = F.zip_with(
        toks,
        inner,
        lambda a, bc: F.when(
            a.isNull() | bc.isNull(), F.lit(None)
        ).otherwise(F.concat_ws(" ", a, bc)),
    )
    grams = F.filter(grams, lambda g: g.isNotNull())
    full = F.array(F.array_join(toks, " "))
    return F.array_distinct(F.when(F.size(toks) >= n, grams).otherwise(full))


def plan_zipgram(d: DataFrame) -> DataFrame:
    sh = d.select(
        F.col("source").alias("src"), F.explode(zip_shingles("text", 3)).alias("sh")
    )
    return _pairs_agg(sh)


PLANS = {
    "r2": plan_r2,
    "r3": plan_r3,
    "r3_nobarrier": plan_r3_nobarrier,
    "zipgram": plan_zipgram,
}


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .appName("retime-contamination")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    d.count()  # warm FS cache / file listing

    # correctness cross-check first: all variants must agree
    ref = {tuple(r) for r in plan_r2(d).collect()}
    for name, fn in PLANS.items():
        got = {tuple(r) for r in fn(d).collect()}
        tag = "OK" if got == ref else "MISMATCH"
        print(f"agree[{name}] = {tag} ({len(got)} pairs)")
        if got != ref:
            raise SystemExit(f"variant {name} disagrees with r2 reference")

    results = {}
    for name, fn in PLANS.items():
        times = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(d).collect()
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        spread = (max(times) - min(times)) / med if med else 0.0
        results[name] = {
            "median_s": round(med, 3),
            "min_s": round(min(times), 3),
            "max_s": round(max(times), 3),
            "spread": round(spread, 2),
            "runs": [round(t, 3) for t in times],
        }
        print(f"{name:14s} median={med:.3f}s  runs={[round(t, 2) for t in times]}")
    print(json.dumps({"sf_dir": sf_dir, "n_runs": n_runs, "variants": results}))
    spark.stop()


if __name__ == "__main__":
    main()
