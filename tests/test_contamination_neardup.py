"""Fuzzy (MinHash-LSH) benchmark decontamination: keep/drop flags must
match the brute-force train x eval Jaccard join, and the flag must
differ from exact shingle-overlap removal exactly on lightly-edited
leakage (the case fuzzy decontamination exists for)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.operators.contamination import neardup_decontaminate
from duckdb_vortex_spark.operators.dedup import _with_jaccard, shingle_table

from .conftest import SF_DIR


def _brute_flags(train, eval_df, threshold=0.8):
    tsh = shingle_table(train, "text", "doc_id").select(
        F.col("id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    esh = shingle_table(eval_df, "text", "doc_id").select(
        F.col("id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    hits = {
        r["doc_a"]
        for r in _with_jaccard(tsh.crossJoin(esh))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a")
        .distinct()
        .collect()
    }
    return {
        r["doc_id"]: r["doc_id"] not in hits
        for r in train.select("doc_id").collect()
    }


def test_matches_bruteforce_on_corpus(spark):
    docs = load(spark, SF_DIR, "documents").persist()
    train = docs.filter(F.col("source") != "src0")
    ev = docs.filter(F.col("source") == "src0")
    got = {
        r["id"]: r["is_kept"]
        for r in neardup_decontaminate(train, ev).collect()
    }
    assert got == _brute_flags(train, ev)
    docs.unpersist()


def test_lightly_edited_leakage_is_caught(spark):
    """A near-verbatim copy of an eval doc drops; a doc sharing a few
    shingles (which EXACT decontamination would flag) is kept; an
    unrelated doc is kept with max_jaccard == 0."""
    base = (
        "the model was evaluated on a held out benchmark suite measuring "
        "reasoning arithmetic and reading comprehension across ten tasks "
        "with accuracy reported for each task and aggregated overall"
    )
    edited = base.replace("ten tasks", "ten diverse tasks")  # near-dup
    partial = (
        "reasoning arithmetic and reading comprehension remain hard but "
        "unrelated prose about spark shuffle partitioning dominates this "
        "document so the overall jaccard similarity stays very low here "
        "well below any reasonable near duplicate detection threshold"
    )  # shares a shingle, J << 0.8
    clean = "completely unrelated text about columnar file formats and zone maps"
    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["id"]: (r["is_kept"], r["max_jaccard"])
        for r in neardup_decontaminate(
            mk([(1, edited), (2, partial), (3, clean)]), mk([(100, base)])
        ).collect()
    }
    assert out[1][0] is False and out[1][1] >= 0.8
    assert out[2] == (True, 0.0)
    assert out[3] == (True, 0.0)


def test_fuzzy_curation_final_corpus_is_clean(spark):
    """The kept set of the fuzzy curation manifest contains no
    remaining near-dup pair and no document within 0.8 Jaccard of the
    eval source — the end-state a curation pipeline promises."""
    from duckdb_vortex_spark.operators.pipeline import (
        pipeline_fuzzy_curation_manifest,
    )

    man = pipeline_fuzzy_curation_manifest(spark, SF_DIR).persist()
    docs = load(spark, SF_DIR, "documents")
    kept = docs.join(
        man.filter(F.col("is_kept")).select("doc_id"), "doc_id", "left_semi"
    ).persist()
    ksh = shingle_table(kept, "text", "doc_id")
    a = ksh.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = ksh.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"))
    dup_pairs = (
        _with_jaccard(a.join(b, F.col("doc_a") < F.col("doc_b")))
        .filter(F.col("jaccard") >= 0.8)
        .count()
    )
    assert dup_pairs == 0
    ev = docs.filter(F.col("source") == "src0")
    leaks = {
        r["id"]: r["is_kept"]
        for r in neardup_decontaminate(kept, ev).collect()
    }
    assert all(leaks.values())
    # every quality-surviving doc appears exactly once in the manifest
    assert man.count() == man.select("doc_id").distinct().count()
    man.unpersist()
    kept.unpersist()
