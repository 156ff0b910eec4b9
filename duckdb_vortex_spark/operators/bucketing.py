"""Bucketed (co-located) joins — the zero-shuffle fact-fact join path.

At 100 TB the dominant cost of a fact-fact equi join is the shuffle of
both sides. Spark's native bucketing removes it: both tables are
written pre-hash-partitioned (and pre-sorted) on the join key with the
same bucket count, so a SortMergeJoin reads bucket i of each side
directly — no Exchange, no Sort, in the plan. That trade (pay the
partitioning once at write time, reuse it for every subsequent join /
aggregation on that key) is the standard warehouse layout for tables
that are habitually joined on the same key (orders ⋈ lineitem here).

The reference's engine (DuckDB) is single-node and needs no such
layout; this module is the Spark-idiomatic equivalent of its
"data already local" property, which is exactly what §2 scale parity
means for joins. Plan shape is pinned in
tests/test_bucketing.py (no Exchange/Sort above the bucketed scans),
and value parity is driver-checked against a plain-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, query


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed, sorted managed table (parquet).

    ``n_buckets`` should be sized so one bucket of the LARGEST
    co-bucketed table fits an executor's memory at target scale; all
    tables joined together must share bucket count and key."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previous session's managed-table directory survives the (non-
    # persistent) metastore; Spark refuses to reuse the location
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    (
        # one writing task per bucket → exactly one file per bucket:
        # Spark only trusts sortBy metadata (and skips the read-side
        # Sort under SortMergeJoin) when a bucket is a single file;
        # multi-file buckets are only per-file sorted
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left: str, right: str, on, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key (``on`` is a
    column list for same-named keys or a join Column expression over
    the two tables' bucket columns). With both sides bucketed+sorted
    with equal bucket counts, the optimizer plans a SortMergeJoin
    with neither Exchange nor Sort."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # one-to-one scan→bucket mapping; coalescing/repartitioning a
    # bucketed scan would forfeit the co-location
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    # honor sortBy metadata (single-file buckets, which write_bucketed
    # guarantees) so SortMergeJoin also skips the read-side Sort
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    return spark.table(left).join(spark.table(right), on=on, how=how)


BUCKETED_ORACLE = """
SELECT
  o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
    / 10000.0 AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@query("bucketed_join_colocated_agg", oracle=BUCKETED_ORACLE, tags=("join", "bucketing"))
def bucketed_join_colocated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem through pre-bucketed managed tables: both
    sides written bucketBy(orderkey) + sortBy, joined with zero
    exchanges (plan pinned in tests/test_bucketing.py), then
    aggregated. Oracle = the same join straight off parquet, so the
    bucketed layout must neither drop nor duplicate rows."""
    sf_tag = "".join(ch for ch in sf_dir if ch.isalnum())[-6:]
    lt, rt = f"dvs_bkt_orders_{sf_tag}", f"dvs_bkt_lineitem_{sf_tag}"
    write_bucketed(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
        lt,
        ["o_orderkey"],
    )
    write_bucketed(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
        rt,
        ["l_orderkey"],
    )
    j = bucketed_join(spark, lt, rt, on=F.col("o_orderkey") == F.col("l_orderkey"))
    revenue_q = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("bigint")
    return (
        j.filter(F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            (F.sum(revenue_q).cast("double") / 10000.0).alias("revenue"),
        )
    )
