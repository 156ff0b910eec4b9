"""Bucketed co-located join: plan contract (the whole point is the
absent shuffle) + value parity with the plain shuffle join."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.operators.bucketing import bucketed_join, write_bucketed

from .conftest import SF_DIR


def _setup_tables(spark):
    write_bucketed(
        load(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority"),
        "t_bkt_orders",
        ["o_orderkey"],
        n_buckets=4,
    )
    write_bucketed(
        load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity"),
        "t_bkt_lineitem",
        ["l_orderkey"],
        n_buckets=4,
    )


def test_bucketed_join_has_no_exchange_or_sort(spark):
    """Co-bucketed + co-sorted tables join with zero Exchange and zero
    Sort above the scans — the layout pays for the shuffle once at
    write time. A plain parquet join of the same data shuffles both
    sides (sanity check that the assertion is meaningful)."""
    _setup_tables(spark)
    # disable broadcast: at test scale AQE would broadcast the tiny
    # side, hiding the property under test (at real scale both fact
    # sides exceed any broadcast threshold and SMJ is what you get)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(
            spark,
            "t_bkt_orders",
            "t_bkt_lineitem",
            on=F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Sort " not in plan.replace("SortMergeJoin", ""), plan

        o = load(spark, SF_DIR, "orders").select("o_orderkey")
        li = load(spark, SF_DIR, "lineitem").select("l_orderkey")
        shuffled = o.join(li, o["o_orderkey"] == li["l_orderkey"])
        splan = shuffled._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in splan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_value_parity(spark):
    _setup_tables(spark)
    j = bucketed_join(
        spark,
        "t_bkt_orders",
        "t_bkt_lineitem",
        on=F.col("o_orderkey") == F.col("l_orderkey"),
    ).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    o = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem")
    plain = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_aggregation_reuses_layout(spark):
    """A groupBy on the bucket key also needs no exchange — the write-
    time partitioning serves every key-aligned operation, not just
    joins."""
    _setup_tables(spark)
    agg = spark.table("t_bkt_lineitem").groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
