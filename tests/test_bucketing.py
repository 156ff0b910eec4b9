"""Bucketed co-located joins (SURVEY.md scale design: "Co-locate
joins via bucketing"): writing both sides bucketed on the join key
lets the join run with ZERO shuffle — the plan contract that matters
most at 100 TB, where an orders⋈lineitem shuffle is the dominant cost.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load(spark, SF_DIR, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load(spark, SF_DIR, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderstatus").agg(
            F.count("*").alias("n")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # both sides pre-bucketed on the key: sort-merge join with no
        # Exchange below it (the only exchange allowed is the final
        # single-partition agg shuffle)
        join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # results still correct vs unbucketed
        want = (
            load(spark, SF_DIR, "orders")
            .join(
                load(spark, SF_DIR, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
