"""Settle the span-trim 1.17x driver-bench move (VERDICT r5 'What's
wrong' #2 / Next #3): ONE-session A/B of the r4 plan (groupBy +
join-back for per-gram (count, canonical)) against the shipped r5
plan (window functions over the gram partition) at sf0.1, n timed
runs each, interleaved A/B/A/B so slow box drift hits both arms
equally. Prints one JSON line.

The r5 driver artifact moved text_duplicate_span_trim 1.50 -> 1.75 s
across SESSIONS (published spread 0.06) while same-session evidence
said the rewrite was faster; this script is the controlled comparison
that attributes the move to plan vs box.

Usage: python scripts/retime_span_trim_ab.py [n]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bench import _materialize
from duckdb_vortex_spark import catalog
from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.operators.text import tokens
from duckdb_vortex_spark.session import get_spark


def span_trim_r4_plan(spark, sf_dir):
    """The r4 shape: identical to text_duplicate_span_trim EXCEPT the
    per-gram (count, canonical) is a groupBy + join-back — the plan
    the round-5 breakdown showed AQE-broadcasts at small scale and
    silently drops to sort-merge past the threshold at 10x."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks")).repartition(
        spark.sparkContext.defaultParallelism
    )
    words = t.select("doc_id", F.posexplode("toks").alias("pos0", "tok")).select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok"
    )
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    starts = (
        words.select(
            "doc_id",
            F.col("pos").alias("p"),
            F.concat_ws(
                " ", "tok",
                F.lead("tok", 1).over(wdoc), F.lead("tok", 2).over(wdoc),
                F.lead("tok", 3).over(wdoc), F.lead("tok", 4).over(wdoc),
            ).alias("gram"),
            F.lead("tok", 4).over(wdoc).alias("__l4"),
        )
        .filter(F.col("__l4").isNotNull())
        .drop("__l4")
    )
    gc = starts.groupBy("gram").agg(
        F.count("*").alias("n"),
        F.min(F.struct(F.col("doc_id").alias("d"), F.col("p").alias("p"))).alias("canon"),
    )
    dup_starts = (
        starts.join(gc, "gram")
        .filter(
            (F.col("n") >= 2)
            & ~((F.col("doc_id") == F.col("canon.d")) & (F.col("p") == F.col("canon.p")))
        )
        .select("doc_id", "p")
    )
    rm = dup_starts.select(
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
    n_removed = (F.col("n_words") - F.coalesce(F.col("n_kept"), F.lit(0))).cast("bigint")
    return nw.join(agg, "doc_id", "left").select(
        "doc_id", "n_words", n_removed.alias("n_removed"),
        F.coalesce(F.col("trimmed_text"), F.lit("")).alias("trimmed_text"),
        F.when(F.col("n_words") > 0, n_removed.cast("double") / F.col("n_words"))
        .otherwise(F.lit(0.0)).alias("removed_frac"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dvs-span-ab")
    r5 = catalog.queries()["text_duplicate_span_trim"]
    arms = {"r4_groupby_joinback": span_trim_r4_plan, "r5_window": r5}
    runs = {k: [] for k in arms}
    for fn in arms.values():  # warm both arms first
        _materialize(fn(spark, sf_dir))
    for _ in range(n):  # interleave so drift is shared
        for k, fn in arms.items():
            t0 = time.monotonic()
            _materialize(fn(spark, sf_dir))
            runs[k].append(round(time.monotonic() - t0, 4))
    out = {
        k: {
            "runs": v,
            "min": min(v),
            "median": round(statistics.median(v), 4),
            "max": max(v),
        }
        for k, v in runs.items()
    }
    out["ratio_r5_over_r4_median"] = round(
        out["r5_window"]["median"] / out["r4_groupby_joinback"]["median"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
