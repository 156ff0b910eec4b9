"""Semantics + plan-shape tests for operators/timeseries.py (the
oracle parity of both catalog entries is covered by
test_catalog_oracle.py; these pin the properties the oracle can't
see: grid density, LOCF behavior, and the no-nested-loop plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.operators.timeseries import (
    interval_bin_join,
    time_bucket_gapfill,
)

from .conftest import SF_DIR


def test_gapfill_grid_is_dense(spark):
    """Every group's bucket sequence has no holes: bucket count ==
    (max-min)/1h + 1, and adjacent buckets differ by exactly 1 h."""
    out = time_bucket_gapfill(load(spark, SF_DIR, "events")).cache()
    per_group = (
        out.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            ((F.unix_timestamp(F.max("bucket")) - F.unix_timestamp(F.min("bucket"))) / 3600 + 1)
            .cast("long")
            .alias("expect"),
        )
        .collect()
    )
    assert per_group
    for r in per_group:
        assert r["n"] == r["expect"], r
    out.unpersist()


def test_gapfill_locf_fills_empty_buckets(spark):
    """Empty buckets exist (n_events = 0) and carry a non-null LOCF
    value equal to the previous non-empty bucket's aggregate."""
    out = time_bucket_gapfill(load(spark, SF_DIR, "events"))
    rows = sorted(
        out.filter(F.col("event_type") == "click").collect(),
        key=lambda r: r["bucket"],
    )
    empties = [r for r in rows if r["n_events"] == 0]
    assert empties, "sf0.001 events must have empty hourly buckets"
    last_val = None
    for r in rows:
        if r["n_events"] == 0:
            assert r["sum_value_locf"] == last_val
        last_val = r["sum_value_locf"]


def test_interval_bin_join_matches_naive(spark):
    """Binned rewrite == the direct (nested-loop) range join on a
    small slice — exact pair-set equality."""
    o = (
        load(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") % 199 == 0)
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("o_end"),
        )
    )
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate")
    got = interval_bin_join(li, o, "l_shipdate", "o_orderdate", "o_end")
    naive = li.join(
        o,
        (li.l_shipdate >= o.o_orderdate) & (li.l_shipdate < o.o_end),
    )
    key = lambda df: sorted(
        (r["o_orderkey"], r["l_orderkey"], r["l_linenumber"]) for r in df.collect()
    )
    assert key(got) == key(naive)
    assert len(key(got)) > 0


def test_interval_bin_join_plan_is_equi(spark):
    """The point of the rewrite: the physical plan must contain a real
    equi join (hash/sort-merge/broadcast-hash), never
    BroadcastNestedLoopJoin / CartesianProduct."""
    o = (
        load(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("o_end"),
        )
    )
    li = load(spark, SF_DIR, "lineitem").select("l_shipdate", "l_quantity")
    plan = interval_bin_join(li, o, "l_shipdate", "o_orderdate", "o_end")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
