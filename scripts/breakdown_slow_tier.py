"""Stage-level breakdown of the two worst slow-tier factors
(VERDICT r5 #5 / r6 #4): contamination_cross_source (4.1x for 10x
data) and dedup_semantic_cluster (3.6x). Both MAY be legitimately
linear-with-overhead — the span-trim episode (scripts/
breakdown_span_trim.py) found a real scale-dependent plan shift this
way, so each factor's dominant stage gets named with numbers instead
of a shrug.

Times CUMULATIVE sub-plans of the exact shipped plans at 1x and 10x
(same replica construction as tests/test_scale_stress.py, same warm
median-of-3 discipline, full noop materialization); consecutive
deltas attribute wall time to each stage.

contamination stages:
  tk     tokenize + round-robin exchange barrier
  sh     shingle explode (src, shingle)
  sets   groupBy(shingle) collect_set(src) + stop-shingle filter (THE shuffle)
  full   ordered pair expansion + pair-keyed count

semdedup stages (k=16 at 1x, k=160 at 10x — the paper's
fixed-cluster-SIZE regime):
  assign  centroid broadcast + map-side cluster assignment
  pairs   a JOIN b ON cluster_id, id_a < id_b   (the Sigma-cluster^2 stage)
  cos     + cosine-threshold filter
  rm      + distinct removal set
  full    left-anti join back to the assignment

Usage: python scripts/breakdown_slow_tier.py [contamination|semdedup ...]
Prints one JSON line per operator.
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
from duckdb_vortex_spark.operators.dedup import shingles_from_tokens
from duckdb_vortex_spark.operators.similarity import _dot, ivf_assign, sample_centroids
from duckdb_vortex_spark.operators.text import tokens
from duckdb_vortex_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_ABC = "abcdefghijklmnopqrstuvwxyz"


def replicate_docs(spark, k: int):
    base = load(spark, SF_DIR, "documents")
    parts = []
    for i in range(k):
        rot = _ABC[i:] + _ABC[:i]
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.translate(F.col("text"), _ABC, rot).alias("text"),
                "source",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_embeddings(spark, k: int):
    base = load(spark, SF_DIR, "embeddings")
    parts = []
    for i in range(k):
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: F.when(j == 0, x + F.lit(i * 1e-3)).otherwise(x),
                ).alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def contamination_stages(spark, d):
    tk = d.select(F.col("source").alias("src"), tokens("text").alias("toks")).repartition(
        spark.sparkContext.defaultParallelism
    )
    sh = tk.select("src", F.explode(shingles_from_tokens(F.col("toks"), 3)).alias("sh"))
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
    full = (
        sets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    return {"tk": tk, "sh": sh, "sets": sets, "full": full}


def semdedup_stages(spark, e, k):
    # every sub-plan projects to NARROW columns before the noop sink:
    # materializing raw pair rows WITH the embedding arrays measured
    # noop serialization width, not the operator (first draft's pair
    # cum exceeded the full plan), and Catalyst prunes the vectors
    # out of any stage whose output doesn't need them
    cl = ivf_assign(e, sample_centroids(e, k), 1).select(
        "vec_id", "embedding", "vnorm", "cluster_id"
    )
    a = cl.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("vnorm").alias("na"), "cluster_id",
    )
    b = cl.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("vnorm").alias("nb"), "cluster_id",
    )
    pairs = a.join(b, "cluster_id").filter(F.col("id_a") < F.col("id_b"))
    cos = pairs.filter(
        (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))) >= 0.30
    )
    rm = cos.select(F.col("id_b").alias("vec_id")).distinct()
    full = cl.join(rm, "vec_id", "left_anti").select("vec_id", "cluster_id")
    return {
        "assign": cl.select("vec_id", "cluster_id"),
        "pair_ids": pairs.select("id_a", "id_b"),
        "cos": cos.select("id_a", "id_b"),
        "rm": rm,
        "full": full,
    }


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(df) -> float:
    materialize(df)  # warm
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        materialize(df)
        runs.append(time.monotonic() - t0)
    return round(statistics.median(runs), 4)


def breakdown(name, stage_sets) -> None:
    out = {"op": name, "sf_dir": SF_DIR, "stages": {}}
    cum = {}
    for scale, stages in stage_sets.items():
        cum[scale] = {k: timed(df) for k, df in stages.items()}
    keys = list(next(iter(cum.values())).keys())
    prev1 = prev10 = 0.0
    for kname in keys:
        d1 = max(cum["x1"][kname] - prev1, 0.0)
        d10 = max(cum["x10"][kname] - prev10, 0.0)
        prev1, prev10 = cum["x1"][kname], cum["x10"][kname]
        out["stages"][kname] = {
            "cum_1x": cum["x1"][kname],
            "cum_10x": cum["x10"][kname],
            "delta_1x": round(d1, 4),
            "delta_10x": round(d10, 4),
            "factor": round(d10 / d1, 2) if d1 > 0.02 else None,
        }
    out["total_factor"] = round(cum["x10"][keys[-1]] / cum["x1"][keys[-1]], 2)
    print(json.dumps(out))


def main() -> None:
    which = set(sys.argv[1:]) or {"contamination", "semdedup"}
    spark = get_spark("dvs-breakdown-slow-tier")
    if "contamination" in which:
        d1 = replicate_docs(spark, 1)
        d10 = replicate_docs(spark, 10)
        breakdown(
            "contamination_cross_source",
            {"x1": contamination_stages(spark, d1), "x10": contamination_stages(spark, d10)},
        )
    if "semdedup" in which:
        e1 = replicate_embeddings(spark, 1)
        e10 = replicate_embeddings(spark, 10)
        breakdown(
            "dedup_semantic_cluster",
            {"x1": semdedup_stages(spark, e1, 16), "x10": semdedup_stages(spark, e10, 160)},
        )


if __name__ == "__main__":
    main()
