"""Stage-level breakdown of text_duplicate_span_trim at 1x vs 10x
(VERDICT r5 item 5: its warm-median slow-tier factor rose to 5.0x —
the worst row in SCALE.md — once the cold-run overhead stopped masking
true growth; name which stage carries the super-1x growth).

Times CUMULATIVE sub-plans of the exact shipped plan (same replica
construction and warm median-of-3 discipline as tests/test_scale_stress.py)
under full noop materialization; consecutive deltas attribute wall time
to each stage:

  t        tokenize + round-robin exchange barrier
  words    posexplode token table
  starts   5-gram start explode
  gc       gram-key aggregate (the ONE shuffle)
  dup      join starts x gc + non-canonical filter
  rm       5x coverage expansion
  kept     anti-join words vs rm
  full     doc-key rebuild aggregate + final join

Usage: python scripts/breakdown_span_trim.py [sf_dir]
Prints one JSON line with per-stage medians at 1x and 10x and the
per-stage factor.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.operators.text import tokens
from duckdb_vortex_spark.session import get_spark

_ABC = "abcdefghijklmnopqrstuvwxyz"


def replicate_docs(spark, sf_dir: str, k: int):
    base = load(spark, sf_dir, "documents")
    parts = []
    for i in range(k):
        rot = _ABC[i:] + _ABC[:i]
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.translate(F.col("text"), _ABC, rot).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def stages(spark, d):
    t = d.select("doc_id", tokens("text").alias("toks")).repartition(
        spark.sparkContext.defaultParallelism
    )
    words = t.select("doc_id", F.posexplode("toks").alias("pos0", "tok")).select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok"
    )
    start_structs = F.when(
        F.size("toks") >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 4),
            lambda i: F.struct(
                i.cast("bigint").alias("p"),
                F.array_join(F.slice(F.col("toks"), i, 5), " ").alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p:bigint,gram:string>>"))
    starts = t.select("doc_id", F.explode(start_structs).alias("s")).select(
        "doc_id", F.col("s.p").alias("p"), F.col("s.gram").alias("gram")
    )
    gc = starts.groupBy("gram").agg(
        F.count("*").alias("n"),
        F.min(F.struct(F.col("doc_id").alias("d"), F.col("p").alias("p"))).alias(
            "canon"
        ),
    )
    dup = (
        starts.join(gc, "gram")
        .filter(
            (F.col("n") >= 2)
            & ~((F.col("doc_id") == F.col("canon.d")) & (F.col("p") == F.col("canon.p")))
        )
        .select("doc_id", "p")
    )
    rm = dup.select(
        "doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + 4)).alias("pos")
    )
    kept = words.join(rm, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("trimmed_text"),
    )
    nw = t.select("doc_id", F.size("toks").cast("bigint").alias("n_words"))
    full = nw.join(agg, "doc_id", "left").select(
        "doc_id", "n_words", F.coalesce("n_kept", F.lit(0)).alias("n_kept")
    )
    return {
        "t": t,
        "words": words,
        "starts": starts,
        "gc": gc,
        "dup": dup,
        "rm": rm,
        "kept": kept,
        "full": full,
    }


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, df) -> float:
    materialize(df)  # warm
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        materialize(df)
        runs.append(time.monotonic() - t0)
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    return round(statistics.median(runs), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("span-trim-breakdown")
    out: dict[str, dict] = {}
    counts: dict[str, dict] = {}
    for label, k in (("1x", 1), ("10x", 10)):
        d = replicate_docs(spark, sf_dir, k)
        st = stages(spark, d)
        out[label] = {name: timed(spark, df) for name, df in st.items()}
        counts[label] = {
            "starts": st["starts"].count(),
            "dup": st["dup"].count(),
            "rm": st["rm"].count(),
        }
    factors = {
        name: round(out["10x"][name] / max(out["1x"][name], 1e-9), 2)
        for name in out["1x"]
    }
    deltas = {}
    order = ["t", "words", "starts", "gc", "dup", "rm", "kept", "full"]
    for label in ("1x", "10x"):
        prev = 0.0
        deltas[label] = {}
        for name in order:
            deltas[label][name] = round(out[label][name] - prev, 3)
            prev = out[label][name]
    print(
        json.dumps(
            {
                "cumulative": out,
                "stage_delta": deltas,
                "factor": factors,
                "rows": counts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
