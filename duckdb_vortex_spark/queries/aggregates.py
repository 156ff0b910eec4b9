"""Aggregation catalog entries (SURVEY.md §2B "Aggregation").

Pinned reference behaviors: ungrouped sum/count over a scan and
aggregates over boolean expressions (/root/reference/test/sql/
timestamp.test:30-34 — ``sum(a = b) = count(id)`` needs an int cast in
Spark). Everything else is DuckDB-core surface the product ships,
checked against the DuckDB oracle.

Scale notes: every groupBy here relies on Spark's partial aggregation
(map-side combine) — the shuffle carries one row per (partition, key),
so low-cardinality keys scale to any input size. approx_count_distinct
is HLL on both engines but with different hash functions, so that
entry has no value-oracle (rows-only check) — documented, not hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, query, sql_query
from .tpch import dec, dsum

UNGROUPED_ORACLE = """
SELECT
  COUNT(*) AS n_rows,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
  CAST(SUM(CAST(event_type = 'purchase' AS INTEGER)) AS BIGINT) AS n_purchases,
  min(value) AS min_value,
  max(value) AS max_value
FROM events
WHERE ts > TIMESTAMP '2024-03-01 00:00:00'
"""


@query("agg_ungrouped_sum_count", oracle=UNGROUPED_ORACLE, tags=("agg",))
def agg_ungrouped_sum_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate over a filtered scan + sum over a boolean
    expression (timestamp.test:30-34 parity: sum(bool) via int cast)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("ts") > F.lit("2024-03-01 00:00:00").cast("timestamp")
    )
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value").alias("total_value"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("n_purchases"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


GROUPED_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price,
  min(o_totalprice) AS min_price,
  max(o_totalprice) AS max_price,
  COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY o_orderstatus, o_orderpriority
"""


@query("agg_grouped_basic", oracle=GROUPED_ORACLE, tags=("agg",))
def agg_grouped_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped hash aggregate with count/sum/min/max/count-distinct."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


STATS_ORACLE = """
SELECT
  l_returnflag,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
  sqrt(
    (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE)
     - CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
       * CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*))
    / (COUNT(*) - 1)
  ) AS stddev_qty,
  (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE)
   - CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
     * CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*))
  / (COUNT(*) - 1) AS var_qty
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_avg_stddev_variance", oracle=STATS_ORACLE, tags=("agg", "stats"))
def agg_avg_stddev_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg / stddev_samp / var_samp computed via exact decimal moment
    sums (sum, sum-of-squares) so both engines produce bit-identical
    doubles — native stddev uses Welford-style updates whose result
    depends on accumulation order (non-deterministic under shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    sum_q = F.sum(dec(q)).cast("double")
    sum_q2 = F.sum(dec(q * q)).cast("double")
    n = F.count("*")
    var = (sum_q2 - sum_q * sum_q / n) / (n - F.lit(1))
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        (sum_q / n).alias("avg_qty"),
        F.sqrt(var).alias("stddev_qty"),
        var.alias("var_qty"),
    )


APPROX_CD_ORACLE = """
SELECT
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
  ABS(CAST(approx_count_distinct(l_partkey) AS DOUBLE) - COUNT(DISTINCT l_partkey))
    <= 0.10 * COUNT(DISTINCT l_partkey) AS approx_parts_ok,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
  ABS(CAST(approx_count_distinct(l_suppkey) AS DOUBLE) - COUNT(DISTINCT l_suppkey))
    <= 0.10 * COUNT(DISTINCT l_suppkey) AS approx_supps_ok
FROM lineitem
"""


@query("agg_approx_count_distinct", oracle=APPROX_CD_ORACLE, tags=("agg", "approx"))
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++). Raw sketch estimates can't hash-match
    across engines (different hash functions), so the entry emits an
    oracle-DECIDABLE result instead: the exact distinct count plus a
    boolean asserting the engine's own HLL estimate is within 10% of it
    (HLL++ default rsd is 5%, so 10% holds with wide margin in both
    engines). Both engines agree on every output value, so the driver's
    hash gate applies. Tighter error-bound behavior is pinned in
    tests/test_aggregates.py."""
    li = load(spark, sf_dir, "lineitem")
    exact_p = F.count_distinct(F.col("l_partkey"))
    exact_s = F.count_distinct(F.col("l_suppkey"))
    approx_p = F.approx_count_distinct("l_partkey").cast("double")
    approx_s = F.approx_count_distinct("l_suppkey").cast("double")
    return li.agg(
        exact_p.alias("exact_parts"),
        (F.abs(approx_p - exact_p) <= 0.10 * exact_p).alias("approx_parts_ok"),
        exact_s.alias("exact_supps"),
        (F.abs(approx_s - exact_s) <= 0.10 * exact_s).alias("approx_supps_ok"),
    )


APPROX_QUANTILE_ORACLE = """
SELECT
  l_returnflag,
  CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS exact_p50,
  approx_quantile(l_extendedprice, 0.5)
    BETWEEN quantile_cont(l_extendedprice, 0.45)
        AND quantile_cont(l_extendedprice, 0.55) AS approx_p50_ok,
  approx_quantile(l_extendedprice, 0.9)
    BETWEEN quantile_cont(l_extendedprice, 0.85)
        AND quantile_cont(l_extendedprice, 0.95) AS approx_p90_ok
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_approx_quantile", oracle=APPROX_QUANTILE_ORACLE, tags=("agg", "approx"))
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch; DuckDB's twin is
    t-digest). Sketch outputs can't hash-match across engines, so —
    same pattern as agg_approx_count_distinct — the entry emits the
    exact interpolated quantile plus booleans asserting each engine's
    OWN approximation lands inside a ±5-percentile rank window around
    its target, which both engines answer identically (the sketches'
    rank error is orders of magnitude tighter than the window)."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.percentile(x, F.lit(0.5)).alias("exact_p50"),
        F.percentile_approx(x, F.lit(0.5), F.lit(10000))
        .between(F.percentile(x, F.lit(0.45)), F.percentile(x, F.lit(0.55)))
        .alias("approx_p50_ok"),
        F.percentile_approx(x, F.lit(0.9), F.lit(10000))
        .between(F.percentile(x, F.lit(0.85)), F.percentile(x, F.lit(0.95)))
        .alias("approx_p90_ok"),
    )


# FILTER clause: identical syntax in Spark SQL and DuckDB.
sql_query(
    "agg_filter_clause",
    """
SELECT
  l_returnflag,
  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
  COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS price_f
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg",),
)


CUBE_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(GROUPING(l_returnflag) AS BIGINT) + 2 * CAST(GROUPING(l_linestatus) AS BIGINT) AS grouping_id,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("agg_cube", oracle=CUBE_ORACLE, tags=("agg", "cube"))
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING() disambiguation of generated nulls.

    Spark's grouping_id bit order is implementation-defined, so the id
    is composed explicitly from per-column grouping() bits to match."""
    li = load(spark, sf_dir, "lineitem")
    gid = (
        F.grouping("l_returnflag").cast("bigint")
        + F.lit(2) * F.grouping("l_linestatus").cast("bigint")
    )
    return li.cube("l_returnflag", "l_linestatus").agg(
        gid.alias("grouping_id"),
        F.count("*").alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


ROLLUP_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(GROUPING(o_orderstatus) AS BIGINT) + 2 * CAST(GROUPING(o_orderpriority) AS BIGINT) AS grouping_id,
  COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@query("agg_rollup", oracle=ROLLUP_ORACLE, tags=("agg", "cube"))
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals."""
    o = load(spark, sf_dir, "orders")
    gid = (
        F.grouping("o_orderstatus").cast("bigint")
        + F.lit(2) * F.grouping("o_orderpriority").cast("bigint")
    )
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        gid.alias("grouping_id"), F.count("*").alias("n")
    )


# GROUPING SETS: identical syntax in Spark SQL and DuckDB.
sql_query(
    "agg_grouping_sets",
    """
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    tags=("agg", "cube"),
)


ARG_ORACLE = """
SELECT
  o_orderstatus,
  max_by(o_orderkey, o_orderkey) AS last_orderkey,
  min_by(o_orderkey, o_orderkey) AS first_orderkey,
  max_by(o_orderpriority, o_orderkey) AS priority_of_last,
  arbitrary(o_orderstatus) AS any_status
FROM orders
GROUP BY o_orderstatus
"""


@query("agg_arg_minmax", oracle=ARG_ORACLE, tags=("agg",))
def agg_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_min/arg_max (min_by/max_by) + first/arbitrary. Ordering keys
    are unique (o_orderkey) so results are deterministic; ``arbitrary``
    over a group keyed by the same column is trivially deterministic."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_orderkey").alias("last_orderkey"),
        F.min_by("o_orderkey", "o_orderkey").alias("first_orderkey"),
        F.max_by("o_orderpriority", "o_orderkey").alias("priority_of_last"),
        F.first("o_orderstatus").alias("any_status"),
    )


STRING_AGG_ORACLE = """
SELECT
  n_regionkey,
  string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations_csv,
  CAST(COUNT(*) AS BIGINT) AS n
FROM nation
GROUP BY n_regionkey
"""


@query("agg_string_list_collect", oracle=STRING_AGG_ORACLE, tags=("agg",))
def agg_string_list_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_agg / array_agg parity: collect_set → sort_array →
    concat_ws gives the deterministic sorted-distinct concatenation."""
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations_csv"),
        F.count("*").alias("n"),
    )


MEDIAN_ORACLE = """
SELECT
  l_linestatus,
  median(l_quantity) AS median_qty,
  quantile_cont(l_quantity, 0.25) AS q25,
  quantile_cont(l_quantity, 0.75) AS q75
FROM lineitem
GROUP BY l_linestatus
"""


@query("agg_median_percentile", oracle=MEDIAN_ORACLE, tags=("agg", "stats"))
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / continuous percentile (both engines interpolate;
    selection over exact values is order-independent → deterministic)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.median("l_quantity").alias("median_qty"),
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
    )


COND_SUM_ORACLE = """
SELECT
  l_linestatus,
  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(30,6)) ELSE 0 END) AS DOUBLE) AS returned_qty,
  CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted
FROM lineitem
GROUP BY l_linestatus
"""


@query("agg_conditional_sum", oracle=COND_SUM_ORACLE, tags=("agg",))
def agg_conditional_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(CASE WHEN ...) — the pre-FILTER-clause idiom."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", dec("l_quantity")).otherwise(F.lit(0)))
        .cast("double")
        .alias("returned_qty"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
        .cast("bigint")
        .alias("n_discounted"),
    )


STRING_AGG_ORDERED_ORACLE = """
SELECT
  n_regionkey,
  string_agg(n_name, ',' ORDER BY n_nationkey DESC) AS nations_desc_csv,
  CAST(count_if(n_nationkey % 2 = 0) AS BIGINT) AS n_even
FROM nation
GROUP BY n_regionkey
"""


@query("agg_string_agg_ordered", oracle=STRING_AGG_ORDERED_ORACLE, tags=("agg",))
def agg_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_agg with an explicit ORDER BY on a different column
    (DuckDB's in-aggregate ordering ≡ Spark collect-structs →
    array_sort → project: the sort key rides in the struct, negated
    for DESC since array_sort is field-ascending), plus count_if.
    Collect-then-sort is per-group memory — fine for bounded groups,
    the same caveat as any string_agg at scale."""
    n = load(spark, sf_dir, "nation")
    items = F.collect_list(
        F.struct((-F.col("n_nationkey")).alias("k"), F.col("n_name").alias("v"))
    )
    csv = F.array_join(F.transform(F.array_sort(items), lambda x: x["v"]), ",")
    return n.groupBy("n_regionkey").agg(
        csv.alias("nations_desc_csv"),
        F.count_if((F.col("n_nationkey") % 2) == 0).cast("bigint").alias("n_even"),
    )


HISTOGRAM_ORACLE = """
SELECT
  CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
  CAST(floor(l_extendedprice / 5000.0) AS BIGINT) * 5000.0 AS bucket_lo,
  COUNT(*) AS n,
  CAST(SUM(CAST(floor(l_extendedprice * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
    / 1000000.0 AS sum_price
FROM lineitem
GROUP BY 1
"""


@query("agg_histogram_fixed_width", oracle=HISTOGRAM_ORACLE, tags=("agg",))
def agg_histogram_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (the width_bucket shape — DuckDB 1.0 has
    no width_bucket builtin, so both engines run the identical
    floor(x/width) arithmetic): bucket id, lower bound, count, exact
    quantized sum per bucket. Bucket cardinality is bounded by the
    value range, so the aggregate is a low-cardinality hash agg at any
    input size."""
    li = load(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / F.lit(5000.0)).cast("bigint")
    return li.groupBy(bucket.alias("bucket")).agg(
        (F.col("bucket") * F.lit(5000.0)).alias("bucket_lo"),
        F.count("*").alias("n"),
        (
            F.sum(F.floor(F.col("l_extendedprice") * F.lit(1000000) + F.lit(0.5)).cast("bigint"))
            .cast("double") / F.lit(1000000.0)
        ).alias("sum_price"),
    )


# --- mode (most frequent value), deterministic -----------------------------

MODE_ORACLE = """
SELECT l_returnflag, l_quantity AS mode_quantity, n
FROM (
  SELECT l_returnflag, l_quantity, COUNT(*) AS n,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY COUNT(*) DESC, l_quantity) AS rn
  FROM lineitem
  GROUP BY l_returnflag, l_quantity
) t
WHERE rn = 1
"""


@query("agg_mode_deterministic", oracle=MODE_ORACLE, tags=("agg",))
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE() — DuckDB's most-frequent-value aggregate — in its
    deterministic form: count per (group, value), then rank with ties
    broken toward the LOWEST value (both engines' native mode() leaves
    ties unspecified, so the entry pins the portable formulation).
    Two map-side-combinable aggregates sharing the group key; the
    ranking window runs over the (group, value) AGGREGATE (bounded by
    value cardinality), never the raw rows."""
    li = load(spark, sf_dir, "lineitem")
    from pyspark.sql import Window as W2

    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("n"))
    w = W2.partitionBy("l_returnflag").orderBy(F.col("n").desc(), "l_quantity")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_quantity"), "n")
    )


# --- weighted median ------------------------------------------------------

WEIGHTED_MEDIAN_ORACLE = """
WITH wpts AS (
  SELECT l_returnflag AS flag, l_extendedprice AS v,
    CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
), c AS (
  SELECT flag, v, w,
    CAST(SUM(w) OVER (PARTITION BY flag ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
    CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
  FROM wpts
)
SELECT flag, v AS weighted_median, tw AS total_weight
FROM c
WHERE 2 * cw >= tw AND 2 * (cw - w) < tw
"""


@query("agg_weighted_median", oracle=WEIGHTED_MEDIAN_ORACLE, tags=("agg", "window"))
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: the price at which half the QUANTITY (not half
    the rows) lies on each side, per return flag — the
    volume-weighted robust center that plain median/percentile
    (agg_median_percentile) cannot express.

    Exactness: weights are exact BIGINTs via floor()-then-cast on BOTH
    sides — a bare CAST(DECIMAL AS BIGINT) would NOT be portable
    (DuckDB rounds 12.99 → 13 while Spark truncates → 12; it only
    happens to agree on integral l_quantity, so the explicit floor
    makes the pattern safe for non-integral weights too),
    duplicate prices collapse to one (value, Σweight) point
    first, and the lower-median pick is a pure integer predicate
    (2·cw ≥ tw ∧ 2·(cw−w) < tw) — exactly one row per group, no
    interpolation, no float comparison, partitioning-independent.

    Scale: one shuffle on the group key; the running-weight window
    runs over the (group, DISTINCT value) table, not raw rows — the
    same distinct-first compaction as the KS entry; both window frames
    share one sort. A full sort of raw lineitem per group is never
    needed."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    wpts = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("v")
        )
        .agg(F.sum(F.floor("l_quantity").cast("bigint")).cast("bigint").alias("w"))
    )
    run = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = Window.partitionBy("flag")
    c = wpts.select(
        "flag",
        "v",
        "w",
        F.sum("w").over(run).cast("bigint").alias("cw"),
        F.sum("w").over(full).cast("bigint").alias("tw"),
    )
    return c.filter(
        (F.lit(2) * F.col("cw") >= F.col("tw"))
        & (F.lit(2) * (F.col("cw") - F.col("w")) < F.col("tw"))
    ).select(
        "flag", F.col("v").alias("weighted_median"), F.col("tw").alias("total_weight")
    )
