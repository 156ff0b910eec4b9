"""Window-function catalog entries (SURVEY.md §2B "Window functions").

All DuckDB-core surface. Determinism rules: every ORDER BY inside a
window ends with a unique tiebreaker column (event_id / o_orderkey /
(l_orderkey, l_linenumber)) so ranking, offsets, and running frames
are well-defined; running sums use exact decimal intermediates.

Scale: Window.partitionBy shuffles once on the partition key; all
functions over the same (partition, order) share one sort — entries
group compatible windows so Spark reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load, query
from .tpch import dec

TOPK_ORACLE = """
SELECT user_id, event_id, value, rn
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events
) t
WHERE rn <= 3
"""


@query("window_topk_per_group", oracle=TOPK_ORACLE, tags=("window", "topk", "flagship"))
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number — the canonical pattern. At scale
    the filter rn<=K is pushed into the sort via Spark's
    WindowGroupLimit (rank-limit pushdown), so no full per-group sort
    materializes."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value", "rn")
    )


RANK_ORACLE = """
SELECT
  p_brand,
  p_partkey,
  p_retailprice,
  rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS rnk,
  dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS drnk,
  percent_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS prnk,
  cume_dist() OVER (PARTITION BY p_brand ORDER BY p_size) AS cdist,
  ntile(4) OVER (PARTITION BY p_brand ORDER BY p_partkey) AS quartile
FROM part
"""


@query("window_ranking_family", oracle=RANK_ORACLE, tags=("window",))
def window_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank/cume_dist (tie-stable by
    definition) + ntile over a unique order."""
    p = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_size")
    wu = W.partitionBy("p_brand").orderBy("p_partkey")
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(wu).cast("bigint").alias("quartile"),
    )


OFFSET_ORACLE = """
SELECT
  user_id,
  event_id,
  CAST(ts AS VARCHAR) AS ts_str,
  lag(event_type) OVER w AS prev_type,
  lead(event_type) OVER w AS next_type,
  lag(event_type, 2, 'none') OVER w AS prev2_type,
  first_value(event_id) OVER w AS first_event,
  last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event,
  nth_value(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_event
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("window_offset_family", oracle=OFFSET_ORACLE, tags=("window",))
def window_offset_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead (with default), first/last/nth_value with explicit
    unbounded frames (last_value needs the full frame in both engines)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("string").alias("ts_str"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(wfull).alias("last_event"),
        F.nth_value("event_id", 2).over(wfull).alias("second_event"),
    )


RUNNING_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6)))
       OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
  COUNT(*) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
FROM lineitem
WHERE l_orderkey % 10 = 0
"""


@query("window_running_sum", oracle=RUNNING_ORACLE, tags=("window",))
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) windowed aggregate with explicit ROWS frame."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_quantity")).over(w).cast("double").alias("running_qty"),
        F.count("*").over(w).alias("running_n"),
    )


MOVING_ORACLE = """
SELECT
  user_id,
  event_id,
  CAST(SUM(CAST(value AS DECIMAL(30,6)))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
  CAST(SUM(CAST(value AS DECIMAL(30,6)))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
    / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
FROM events
"""


@query("window_moving_frame", oracle=MOVING_ORACLE, tags=("window",))
def window_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame (moving sum / moving average)."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    msum = F.sum(dec("value")).over(w).cast("double")
    return ev.select(
        "user_id",
        "event_id",
        msum.alias("moving_sum"),
        (msum / F.count("*").over(w)).alias("moving_avg"),
    )


RANGE_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_in_range
FROM orders
WHERE o_custkey % 5 = 0
"""


@query("window_range_frame", oracle=RANGE_ORACLE, tags=("window",))
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric order key (value-based, not row-based)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 5 == 0)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rangeBetween(-1000, W.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.count("*").over(w).alias("n_in_range")
    )


PARTITION_AGG_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) OVER (PARTITION BY l_orderkey) AS DOUBLE) AS order_total,
  COUNT(*) OVER (PARTITION BY l_orderkey) AS order_lines,
  l_extendedprice / CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) OVER (PARTITION BY l_orderkey) AS DOUBLE) AS price_share
FROM lineitem
WHERE l_orderkey % 25 = 0
"""


@query("window_partition_aggregate", oracle=PARTITION_AGG_ORACLE, tags=("window",))
def window_partition_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition windowed aggregate (no ORDER BY): per-row access
    to the group total without a self-join."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 25 == 0)
    w = W.partitionBy("l_orderkey")
    total = F.sum(dec("l_extendedprice")).over(w).cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        total.alias("order_total"),
        F.count("*").over(w).alias("order_lines"),
        (F.col("l_extendedprice") / total).alias("price_share"),
    )


TIME_RANGE_ORACLE = """
SELECT
  event_id,
  user_id,
  ts,
  CAST(COUNT(*) OVER w AS BIGINT) AS cnt_1h,
  CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS sum_value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@query("window_time_range_rolling", oracle=TIME_RANGE_ORACLE, tags=("window", "datetime"))
def window_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour per-user aggregates via a RANGE frame over epoch
    microseconds — the batch twin of the streaming sliding window
    (stream_sliding_window_counts), but exact per event rather than
    per bucket. Both engines order on the same integer key, so tie
    groups (peers) are identical by construction. One shuffle on
    user_id; within-partition sort only — no global sort."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("bigint").alias("cnt_1h"),
        F.sum(dec(F.col("value"))).over(w).cast("double").alias("sum_value_1h"),
    )


IGNORE_NULLS_ORACLE = """
WITH s AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS val_n
  FROM events
)
SELECT
  event_id,
  user_id,
  first_value(val_n IGNORE NULLS) OVER w AS first_seen,
  last_value(val_n IGNORE NULLS) OVER w AS last_seen,
  nth_value(val_n, 2 IGNORE NULLS) OVER wf AS second_seen
FROM s
WINDOW
  w AS (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  wf AS (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@query("window_ignore_nulls_family", oracle=IGNORE_NULLS_ORACLE, tags=("window",))
def window_ignore_nulls_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS navigation: first/last non-null running values and
    the partition's 2nd non-null — the gap-filling primitives (e.g.
    last-observation-carried-forward over sparse sensor columns)."""
    ev = load(spark, sf_dir, "events")
    val_n = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value"))
    s = ev.select("event_id", "user_id", "ts", val_n.alias("val_n"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return s.select(
        "event_id",
        "user_id",
        F.first("val_n", ignorenulls=True).over(w).alias("first_seen"),
        F.last("val_n", ignorenulls=True).over(w).alias("last_seen"),
        F.nth_value("val_n", 2, ignoreNulls=True).over(wf).alias("second_seen"),
    )


# DuckDB dialect extensions Spark lacks as KEYWORDS but expresses
# exactly: QUALIFY (filter on a window result without a subquery) and
# frame EXCLUDE CURRENT ROW. The Spark builder is the documented
# translation; the oracle uses the native DuckDB syntax, so this entry
# pins the dialect-mapping claim itself.
QUALIFY_EXCLUDE_ORACLE = """
SELECT user_id, event_id, value,
  CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW
  ) AS DOUBLE) AS neighbor_sum
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY value DESC, event_id) <= 2
"""


@query("window_qualify_exclude", oracle=QUALIFY_EXCLUDE_ORACLE, tags=("window",))
def window_qualify_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY ≡ window column + filter (same plan a QUALIFY keyword
    would produce: one window, WindowGroupLimit pushdown applies);
    EXCLUDE CURRENT ROW ≡ frame aggregate minus the current row's
    value — both subtractions in exact DECIMAL before the double cast,
    so the result is bit-identical to DuckDB's native frame
    exclusion."""
    ev = load(spark, sf_dir, "events")
    dec_v = F.col("value").cast("decimal(30,6)")
    frame = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
    )
    topw = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            # subtract coalesce(v, 0): a NULL current row must still
            # yield the neighbor sum (DuckDB EXCLUDE CURRENT ROW
            # semantics), not NULL-poison the subtraction
            (
                F.sum(dec_v).over(frame)
                - F.coalesce(dec_v, F.lit(0).cast("decimal(30,6)"))
            )
            .cast("double")
            .alias("neighbor_sum"),
            F.row_number().over(topw).alias("__rn"),
        )
        .filter(F.col("__rn") <= 2)
        .drop("__rn")
    )


# --- GROUPS frame mode (emulated) -----------------------------------------

GROUPS_FRAME_ORACLE = """
WITH g AS (
  SELECT event_id, event_type, ts, value,
         dense_rank() OVER (PARTITION BY event_type ORDER BY ts) AS grp
  FROM events
)
SELECT
  event_id,
  event_type,
  ts,
  CAST(SUM(CAST(value AS DECIMAL(30,6)))
       OVER (PARTITION BY event_type ORDER BY grp
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS grp_sum
FROM g
"""


@query("window_groups_frame", oracle=GROUPS_FRAME_ORACLE, tags=("window",))
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS frame mode (SQL:2011): a frame counted in PEER GROUPS
    of the ordering key. NEITHER engine has it natively (Spark has
    only ROWS/RANGE; DuckDB v1.5 parses but rejects GROUPS), so the
    entry pins the portable emulation both can run: dense_rank
    numbers the peer groups, then a RANGE frame of ±1 over the rank
    IS `GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING` (every peer of a
    covered group shares its rank, so the range frame admits whole
    groups only). Both windows share the event_type partitioning —
    one exchange. Exact decimal sums."""
    ev = load(spark, sf_dir, "events")
    wr = W.partitionBy("event_type").orderBy("ts")
    wg = (
        W.partitionBy("event_type")
        .orderBy("__grp")
        .rangeBetween(-1, 1)
    )
    return (
        ev.withColumn("__grp", F.dense_rank().over(wr))
        .select(
            "event_id",
            "event_type",
            "ts",
            F.sum(F.col("value").cast("decimal(30,6)"))
            .over(wg)
            .cast("double")
            .alias("grp_sum"),
        )
    )


# --- gaps and islands -----------------------------------------------------

GAPS_ISLANDS_ORACLE = """
WITH r AS (
  SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_all,
    row_number() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS rn_t
  FROM events
), isl AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM r GROUP BY user_id, event_type, rn_all - rn_t
)
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_runs,
  CAST(MAX(run_len) AS BIGINT) AS longest_run
FROM isl GROUP BY user_id, event_type
"""


@query("window_gaps_islands", oracle=GAPS_ISLANDS_ORACLE, tags=("window", "events"))
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE same-type events
    per user, via the classic two-row_number difference — rn_all −
    rn_per_type is constant exactly within a run, so runs fall out of
    a plain GROUP BY with no iterative pass. The canonical SQL pattern
    the survey's window family was missing (streaks, outage episodes,
    consecutive-day activity all reduce to it).

    Determinism: both row_numbers order by (ts, event_id) — event_id
    makes the order total, so island boundaries are identical across
    engines and partitionings; everything else is integer counting.

    Scale: ONE shuffle on user_id serves both windows and the
    aggregates (the per-(user,type) window is a finer partitioning of
    the same key), then map-side-combining hash aggs — the run
    detection never materializes per-pair or per-gap state."""
    e = load(spark, sf_dir, "events")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_t = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    r = e.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_t)).alias("grp"),
    )
    isl = (
        r.groupBy("user_id", "event_type", "grp")
        .agg(F.count("*").cast("bigint").alias("run_len"))
    )
    return isl.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("n_runs"),
        F.max("run_len").cast("bigint").alias("longest_run"),
    )
