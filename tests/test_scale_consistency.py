"""Scale self-consistency: multiplying the input k× must scale
aggregates exactly k× (decimal intermediates are exact, so this holds
bit-for-bit, not approximately) and must not change plan shape. This
is the local stand-in for the 100×-scale-up question SURVEY.md §7
poses: the plan that runs here is partition-count-independent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load

from .conftest import SF_DIR

K = 8


@pytest.fixture(scope="module")
def multiplied(spark):
    li = load(spark, SF_DIR, "lineitem")
    return li, li.crossJoin(spark.range(K).select(F.col("id").alias("__copy"))).drop(
        "__copy"
    )


def test_q1_aggregates_scale_exactly(spark, multiplied):
    li, li_k = multiplied

    def q1(df):
        return (
            df.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("sum_qty"),
                F.count("*").alias("n"),
            )
        )

    base = {(r.l_returnflag, r.l_linestatus): r for r in q1(li).collect()}
    big = {(r.l_returnflag, r.l_linestatus): r for r in q1(li_k).collect()}
    assert base.keys() == big.keys()
    for k in base:
        assert big[k].sum_qty == base[k].sum_qty * K
        assert big[k].n == base[k].n * K


def test_exact_dedup_groups_scale(spark, multiplied):
    """k× replication multiplies group sizes, never group count: the
    content-hash dedup finds each original group with k× members."""
    from duckdb_vortex_spark.operators.dedup import exact_dedup

    li, _ = multiplied
    docs = load(spark, SF_DIR, "documents")
    docs_k = docs.crossJoin(spark.range(K).select(F.col("id").alias("__c"))).select(
        (F.col("doc_id") + F.col("__c") * 1_000_000).alias("doc_id"), "text"
    )
    base = exact_dedup(docs).count()
    big = exact_dedup(docs_k)
    assert big.count() == base  # same distinct contents
    total = big.agg(F.sum("n_dups")).collect()[0][0]
    assert total == docs.count() * K


def test_doc_frequency_scales_exactly(spark):
    """Replicating every document k× (fresh ids) multiplies each
    token's document frequency exactly k×."""
    from duckdb_vortex_spark.operators import text as T

    docs = load(spark, SF_DIR, "documents")
    docs_k = docs.crossJoin(spark.range(K).select(F.col("id").alias("__c"))).select(
        (F.col("doc_id") + F.col("__c") * 1_000_000).alias("doc_id"), "text"
    )

    def df_map(d):
        return {
            r.tok: r.df
            for r in d.select(
                F.explode(F.array_distinct(T.tokens("text"))).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count("*").alias("df"))
            .collect()
        }

    base, big = df_map(docs), df_map(docs_k)
    assert base.keys() == big.keys()
    assert all(big[t] == base[t] * K for t in base)


def test_contamination_matrix_invariant_under_doc_replication(spark):
    """The cross-source shared-shingle matrix counts DISTINCT shingles,
    so replicating documents within each source must not change it."""
    from duckdb_vortex_spark.operators.contamination import cross_source_shared_shingles

    docs = load(spark, SF_DIR, "documents")
    docs_k = docs.crossJoin(spark.range(3).select(F.col("id").alias("__c"))).select(
        (F.col("doc_id") + F.col("__c") * 1_000_000).alias("doc_id"), "text", "source"
    )
    key = lambda r: (r.src_a, r.src_b)  # noqa: E731
    base = {key(r): r.n_shared for r in cross_source_shared_shingles(docs).collect()}
    big = {key(r): r.n_shared for r in cross_source_shared_shingles(docs_k).collect()}
    assert base == big


def test_pipeline_split_is_reproducible_and_partition_independent(spark):
    """The train/val assignment depends only on doc_id (portable md5
    bucket), so it is identical across runs and repartitionings."""
    from duckdb_vortex_spark.operators.pipeline import prepare_training_data

    docs = load(spark, SF_DIR, "documents")
    a = {r.doc_id: r.split for r in prepare_training_data(docs).collect()}
    b = {
        r.doc_id: r.split
        for r in prepare_training_data(docs.repartition(17, "source")).collect()
    }
    assert a == b
    shares = {s: sum(1 for v in a.values() if v == s) for s in ("train", "val")}
    assert shares["train"] > shares["val"] > 0  # ~80/20
