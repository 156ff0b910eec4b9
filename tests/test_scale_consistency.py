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
