"""Time-series operators: gap-filled time-bucket rollups and binned
interval joins.

Neither exists natively in the reference engine (DuckDB v1.5.5 has
``time_bucket`` but no gap-fill; range joins plan as IEJoin,
/root/reference's engine layer) — these are the hypertable-style
operations a telemetry/training-data pipeline runs at 100 TB, built
as SURVEY.md §7 "custom operators" rung (a): pure compositions of
DataFrame ops, no Python in the hot path.

Scale design:

- **Gap-fill** generates the dense bucket grid *per group from that
  group's own [min, max] bucket range* (``sequence`` on aggregated
  bounds, exploded) — never a cross join against a global calendar
  dimension. Grid size is bounded by (groups × span/bucket), not by
  input rows; the LOCF window shuffles once on the group key, and the
  grid⋈agg join re-uses that same (group, bucket) partitioning.
- **Interval bin join** turns a pure range predicate (no equi key —
  Spark would otherwise plan BroadcastNestedLoopJoin, a scan of every
  point for every interval) into an equi join: intervals explode to
  the fixed-width buckets they cover, points map to exactly ONE
  bucket, so the join key is dense and each (interval, point) pair
  arises exactly once — no post-join dedup. Work is
  Σ_bucket |intervals ∩ bucket| × |points ∩ bucket|: bounded by
  bucket width, AQE skew-join splits any hot bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, query


# ---------------------------------------------------------------------------
# gap-filled time-bucket rollup (LOCF)
# ---------------------------------------------------------------------------


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Hourly rollup per group over a DENSE bucket grid: missing
    buckets appear with n_events = 0 and the last seen aggregate
    carried forward (LOCF).

    Returns (group, bucket, n_events, sum_value_locf).
    """
    g = F.col(group_col)
    agg = (
        df.groupBy(group_col, F.date_trunc(bucket, F.col(ts_col)).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(30,6)")).cast("double").alias("s"),
        )
    )
    step = F.expr(f"INTERVAL 1 {bucket.upper()}")
    grid = (
        agg.groupBy(group_col)
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(g, F.explode(F.sequence(F.col("lo"), F.col("hi"), step)).alias("bucket"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, [group_col, "bucket"], "left")
        .select(
            g,
            F.col("bucket"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.last("s", ignorenulls=True).over(w).alias("sum_value_locf"),
        )
    )


GAPFILL_ORACLE = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
)
SELECT
  g.event_type,
  g.bucket AS bucket,
  COALESCE(a.n, 0) AS n_events,
  last_value(a.s IGNORE NULLS) OVER (
    PARTITION BY g.event_type ORDER BY g.bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS sum_value_locf
FROM grid g LEFT JOIN agg a USING (event_type, bucket)
"""


@query("timeseries_gapfill_locf", oracle=GAPFILL_ORACLE, tags=("timeseries", "window"))
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup of events per type with LOCF — the
    hypertable/'time_bucket_gapfill' operation (module docstring for
    the per-group grid + single-shuffle design)."""
    return time_bucket_gapfill(load(spark, sf_dir, "events"))


def time_bucket_interpolate(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Gap-fill with LINEAR interpolation: a missing bucket's value is
    interpolated between the previous and next observed aggregates
    (LOCF at the trailing edge, NOCB at the leading edge).

    Determinism across engines: the interpolation inputs are exact
    (decimal-summed aggregates cast to double, integer epoch seconds),
    and both engines evaluate the identical expression
    ``prev + (next - prev) * frac`` — same float ops in the same
    order → bit-identical doubles.
    """
    g = F.col(group_col)
    agg = df.groupBy(group_col, F.date_trunc(bucket, F.col(ts_col)).alias("bucket")).agg(
        F.sum(F.col(value_col).cast("decimal(30,6)")).cast("double").alias("s"),
    )
    step = F.expr(f"INTERVAL 1 {bucket.upper()}")
    grid = (
        agg.groupBy(group_col)
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(g, F.explode(F.sequence(F.col("lo"), F.col("hi"), step)).alias("bucket"))
    )
    back = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    s = F.col("s")
    obs_bucket = F.when(s.isNotNull(), F.col("bucket"))
    prev_v = F.last(s, ignorenulls=True).over(back)
    next_v = F.first(s, ignorenulls=True).over(fwd)
    prev_b = F.last(obs_bucket, ignorenulls=True).over(back)
    next_b = F.first(obs_bucket, ignorenulls=True).over(fwd)
    frac = (
        (F.unix_timestamp(F.col("bucket")) - F.unix_timestamp(prev_b)).cast("double")
        / (F.unix_timestamp(next_b) - F.unix_timestamp(prev_b)).cast("double")
    )
    interp = (
        F.when(s.isNotNull(), s)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return grid.join(agg, [group_col, "bucket"], "left").select(
        g,
        F.col("bucket"),
        s.isNotNull().alias("observed"),
        interp.alias("value_interp"),
    )


INTERP_ORACLE = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
), j AS (
  SELECT g.event_type, g.bucket, a.s,
    last_value(a.s IGNORE NULLS) OVER w_back AS prev_v,
    first_value(a.s IGNORE NULLS) OVER w_fwd AS next_v,
    last_value(CASE WHEN a.s IS NOT NULL THEN g.bucket END IGNORE NULLS)
      OVER w_back AS prev_b,
    first_value(CASE WHEN a.s IS NOT NULL THEN g.bucket END IGNORE NULLS)
      OVER w_fwd AS next_b
  FROM grid g LEFT JOIN agg a USING (event_type, bucket)
  WINDOW
    w_back AS (PARTITION BY g.event_type ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY g.event_type ORDER BY g.bucket
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT
  event_type,
  bucket,
  s IS NOT NULL AS observed,
  CASE
    WHEN s IS NOT NULL THEN s
    WHEN prev_v IS NULL THEN next_v
    WHEN next_v IS NULL THEN prev_v
    ELSE prev_v + (next_v - prev_v) * (
      CAST(epoch(bucket) - epoch(prev_b) AS DOUBLE)
      / CAST(epoch(next_b) - epoch(prev_b) AS DOUBLE))
  END AS value_interp
FROM j
"""


@query("timeseries_gapfill_interpolate", oracle=INTERP_ORACLE, tags=("timeseries", "window"))
def timeseries_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with linear interpolation between
    observed buckets (LOCF/NOCB at the edges) — the
    'time_bucket_gapfill(..., interpolate)' shape."""
    return time_bucket_interpolate(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# binned interval join (range join with NO equi key)
# ---------------------------------------------------------------------------


def interval_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "day",
) -> DataFrame:
    """Join each point to every interval containing it
    (``start <= point < end``) WITHOUT any equi key.

    Each interval explodes to the ``bucket``-width buckets it touches;
    each point maps to exactly one bucket, so the equi join on the
    bucket produces every qualifying pair exactly once (no dedup) and
    the containment predicate is a cheap post-probe filter. Returns
    points ⋈ intervals with all columns of both inputs.
    """
    step = F.expr(f"INTERVAL 1 {bucket.upper()}")
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(start_ts)),
                F.date_trunc(bucket, F.col(end_ts)),
                step,
            )
        ),
    )
    pt = points.withColumn("__bucket", F.date_trunc(bucket, F.col(point_ts)))
    return (
        pt.join(iv, "__bucket")
        .filter((F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts)))
        .drop("__bucket")
    )


INTERVAL_JOIN_ORACLE = """
SELECT
  o.o_orderkey,
  COUNT(*) AS n_ships,
  CAST(SUM(CAST(floor(l.l_quantity * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
    / 1000000.0 AS sum_qty
FROM orders o
JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
WHERE o.o_orderkey % 97 = 0
GROUP BY 1
"""


@query("join_interval_binned", oracle=INTERVAL_JOIN_ORACLE, tags=("join", "timeseries"))
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range-predicate join (which lineitems shipped inside each
    watched order's first week — NO orderkey equality): DuckDB plans
    its IEJoin, Spark would plan BroadcastNestedLoopJoin; the binned
    rewrite makes it a plain equi join (module docstring)."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            "o_orderdate",
            # interval add, not date_add: date_add() truncates a timestamp
            # to DATE while DuckDB's + INTERVAL preserves the time part
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("o_end"),
        )
    )
    li = load(spark, sf_dir, "lineitem").select("l_shipdate", "l_quantity")
    joined = interval_bin_join(li, o, "l_shipdate", "o_orderdate", "o_end")
    return joined.groupBy("o_orderkey").agg(
        F.count("*").alias("n_ships"),
        (
            F.sum(F.floor(F.col("l_quantity") * F.lit(1000000) + F.lit(0.5)).cast("bigint")).cast(
                "double"
            )
            / F.lit(1000000.0)
        ).alias("sum_qty"),
    )


# --- ordered funnel -------------------------------------------------------

FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
)
SELECT
  v.user_id,
  CAST(v.view_ts AS VARCHAR) AS view_ts,
  CAST(c.click_ts AS VARCHAR) AS click_ts,
  CAST(p.purchase_ts AS VARCHAR) AS purchase_ts
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


@query("events_funnel_conversion", oracle=FUNNEL_ORACLE, tags=("timeseries", "agg"))
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): per user, the
    earliest view, the earliest click strictly after it, the earliest
    purchase strictly after that — NULLs mark where the user fell out.

    Scale shape: three user-keyed MIN aggregates chained by equi joins
    on user_id — every stage shuffles once on the same key, so the
    chain co-partitions end-to-end (the same one-key-exchange argument
    as q21); no per-user event sorting or array collection anywhere."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.col("view_ts").cast("string").alias("view_ts"),
            F.col("click_ts").cast("string").alias("click_ts"),
            F.col("purchase_ts").cast("string").alias("purchase_ts"),
        )
    )


# --- rolling z-score anomaly flags ----------------------------------------

ZSCORE_ORACLE = """
WITH w AS (
  SELECT
    event_id, user_id, ts, value,
    CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER win AS DOUBLE) AS s,
    CAST(SUM(CAST(value AS DECIMAL(30,6)) * CAST(value AS DECIMAL(30,6))) OVER win
      AS DOUBLE) AS s2,
    COUNT(*) OVER win AS n
  FROM events
  WINDOW win AS (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT
  event_id,
  user_id,
  CAST(ts AS VARCHAR) AS ts_str,
  value,
  CASE WHEN n >= 5 AND (s2 - s * s / n) / (n - 1) > 0
       THEN (value - s / n) / sqrt((s2 - s * s / n) / (n - 1))
       END AS zscore,
  COALESCE(
    CASE WHEN n >= 5 AND (s2 - s * s / n) / (n - 1) > 0
         THEN abs((value - s / n) / sqrt((s2 - s * s / n) / (n - 1))) > 3.0
         END, FALSE) AS is_anomaly
FROM w
"""


@query("timeseries_rolling_zscore", oracle=ZSCORE_ORACLE, tags=("timeseries", "window"))
def timeseries_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly flags: each event's z-score against its
    user's trailing 20-event window (sample variance), flagged at
    |z| > 3; windows shorter than 5 events or with zero variance yield
    NULL scores.

    Exact-decimal rolling moment sums (value, value²) make mean and
    variance order-independent; the z expression then runs the same
    float sequence in both engines. One shuffle on user_id; the frame
    is ROWS-bounded so state per row is O(1) at any scale."""
    ev = load(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    dv = F.col("value").cast("decimal(30,6)")
    s = F.sum(dv).over(win).cast("double")
    s2 = F.sum(dv * dv).over(win).cast("double")
    n = F.count("*").over(win)
    var = (s2 - s * s / n) / (n - F.lit(1))
    z = F.when((n >= 5) & (var > 0), (F.col("value") - s / n) / F.sqrt(var))
    return ev.select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("ts_str"),
        "value",
        z.alias("zscore"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
    )


# --- cohort retention -----------------------------------------------------

RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
    CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT)
      AS week_offset
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
)
SELECT
  CAST(cohort_week AS VARCHAR) AS cohort_week,
  week_offset,
  COUNT(*) AS n_active,
  CAST(COUNT(*) AS DOUBLE) / MAX(COUNT(*)) OVER (PARTITION BY cohort_week)
    AS retention
FROM activity
GROUP BY cohort_week, week_offset
"""


@query("events_cohort_retention", oracle=RETENTION_ORACLE, tags=("timeseries", "agg"))
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, the
    distinct-active count per week offset, and retention relative to
    the cohort's own peak week.

    Scale shape: first-seen is one user-keyed MIN; activity dedup is a
    (user, week) distinct co-partitioned with it; the matrix aggregate
    keys on (cohort, offset) — bounded by weeks², not by events. The
    retention window partitions by cohort (dozens of rows per
    partition)."""
    ev = load(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    first_seen = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                        - F.unix_timestamp(F.col("cohort_week"))
                    )
                    / (7 * 86400)
                )
            ).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    counts = activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active")
    )
    peak = Window.partitionBy("cohort_week")
    return counts.select(
        # DuckDB date_trunc('week') yields DATE; cast through DATE so
        # both engines render "YYYY-MM-DD"
        F.col("cohort_week").cast("date").cast("string").alias("cohort_week"),
        "week_offset",
        "n_active",
        (F.col("n_active").cast("double") / F.max("n_active").over(peak)).alias("retention"),
    )


# --- event transition matrix ----------------------------------------------

TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS next_type
  FROM events
)
SELECT
  event_type AS from_type,
  next_type AS to_type,
  COUNT(*) AS n,
  CAST(COUNT(*) AS DOUBLE)
    / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS p
FROM seq
WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


@query("events_transition_matrix", oracle=TRANSITION_ORACLE, tags=("timeseries", "window"))
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: per user, each event's
    successor type (lead over the time-ordered stream), aggregated to
    (from, to) counts and row-normalized probabilities — the Markov
    view of user journeys. One user_id shuffle for the lead window; the
    matrix aggregate is |event_types|²-bounded."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    row = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(row)).alias("p"),
    )


# --- period-over-period growth --------------------------------------------

WOW_GROWTH_ORACLE = """
WITH weekly AS (
  SELECT
    CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
    CAST(SUM(CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
      / 1000000.0 AS revenue
  FROM orders GROUP BY 1
)
SELECT
  CAST(week AS VARCHAR) AS week,
  revenue,
  revenue / lag(revenue) OVER (ORDER BY week) AS wow_ratio
FROM weekly
"""


@query("orders_weekly_growth", oracle=WOW_GROWTH_ORACLE, tags=("timeseries", "window"))
def orders_weekly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth: weekly exact quantized sums, then
    a lag ratio (rational — no libm log) over the week sequence. The
    single-partition lag window is safe: its input is the weekly
    aggregate (one row per week), not the fact table."""
    o = load(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week")
    ).agg(
        (
            F.sum(F.floor(F.col("o_totalprice") * F.lit(1000000) + F.lit(0.5)).cast("bigint"))
            .cast("double") / F.lit(1000000.0)
        ).alias("revenue")
    )
    w = Window.orderBy("week")
    return weekly.select(
        F.col("week").cast("string").alias("week"),
        "revenue",
        (F.col("revenue") / F.lag("revenue").over(w)).alias("wow_ratio"),
    )


# --- RFM segmentation -----------------------------------------------------

RFM_ORACLE = """
WITH rfm AS (
  SELECT
    o_custkey,
    MAX(o_orderdate) AS last_order,
    COUNT(*) AS frequency,
    CAST(SUM(CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
      / 1000000.0 AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT
  o_custkey,
  CAST(last_order AS VARCHAR) AS last_order,
  frequency,
  monetary,
  ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_quartile,
  ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_quartile,
  ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_quartile
FROM rfm
"""


@query("customers_rfm_segments", oracle=RFM_ORACLE, tags=("timeseries", "agg", "window"))
def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency (last order), frequency
    (order count), monetary (exact quantized revenue), each bucketed
    into quartiles via ntile with a custkey tiebreak (ntile is
    rank-determined, so a deterministic total order makes both engines
    agree exactly).

    The three single-partition ntile windows run over the per-customer
    AGGREGATE (|customers| rows, not orders); at cluster scale swap in
    percentile-based cutpoints computed distributively if |customers|
    itself outgrows one partition."""
    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        (
            F.sum(F.floor(F.col("o_totalprice") * F.lit(1000000) + F.lit(0.5)).cast("bigint"))
            .cast("double") / F.lit(1000000.0)
        ).alias("monetary"),
    )
    r_w = Window.orderBy(F.col("last_order").desc(), F.col("o_custkey"))
    f_w = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey"))
    m_w = Window.orderBy(F.col("monetary").desc(), F.col("o_custkey"))
    return rfm.select(
        "o_custkey",
        F.col("last_order").cast("string").alias("last_order"),
        "frequency",
        "monetary",
        F.ntile(4).over(r_w).alias("r_quartile"),
        F.ntile(4).over(f_w).alias("f_quartile"),
        F.ntile(4).over(m_w).alias("m_quartile"),
    )


# --- Pareto / ABC analysis ------------------------------------------------

PARETO_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
    SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT))
      AS rev_q
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, rev_q,
    SUM(rev_q) OVER (ORDER BY rev_q DESC, l_partkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_q,
    SUM(rev_q) OVER () AS total_q
  FROM per_part
)
SELECT
  l_partkey,
  CAST(rev_q AS DOUBLE) / 1000000.0 AS revenue,
  CAST(cum_q AS DOUBLE) / CAST(total_q AS DOUBLE) AS cum_share,
  CASE WHEN CAST(cum_q AS DOUBLE) / CAST(total_q AS DOUBLE) <= 0.8 THEN 'A'
       WHEN CAST(cum_q AS DOUBLE) / CAST(total_q AS DOUBLE) <= 0.95 THEN 'B'
       ELSE 'C' END AS abc_class
FROM ranked
"""


@query("parts_pareto_abc", oracle=PARETO_ORACLE, tags=("timeseries", "window", "agg"))
def parts_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification of parts by revenue: exact quantized
    per-part sums, a cumulative share over the revenue-descending
    order (partkey tiebreak → total order → engine-exact), and the
    80/95% class bands. Integer cumulative sums make the running
    share deterministic; the single-partition window runs over the
    per-part AGGREGATE (|parts| rows) — at larger key cardinality,
    range-partition the cumsum (two-pass: per-partition totals +
    offset broadcast)."""
    li = load(spark, sf_dir, "lineitem")
    rev_q = F.sum(
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1000000)
            + F.lit(0.5)
        ).cast("bigint")
    )
    per_part = li.groupBy("l_partkey").agg(rev_q.alias("rev_q"))
    w_cum = (
        Window.orderBy(F.col("rev_q").desc(), F.col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    cum_share = F.sum("rev_q").over(w_cum).cast("double") / F.sum("rev_q").over(
        w_all
    ).cast("double")
    return per_part.select(
        "l_partkey",
        (F.col("rev_q").cast("double") / F.lit(1000000.0)).alias("revenue"),
        cum_share.alias("cum_share"),
        F.when(cum_share <= 0.8, "A").when(cum_share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )


# ---------------------------------------------------------------------------
# gap-based sessionization (batch)
# ---------------------------------------------------------------------------


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "4 hours",
    gap_seconds: int = 14400,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_seconds``.
    Batch twin of streaming ``session_window`` (streaming/windows.py),
    mirroring the reference's event-analytics surface.

    Scale: ONE shuffle on the user key serves both the lag window and
    the session aggregate (same partitioning, Catalyst reuses the
    exchange); state per user is a sort, never a cross join. At 100 TB
    this is the same cost profile as any per-key windowed aggregate —
    skewed power-users are bounded by their own event count, and AQE
    skew-split applies to the final aggregate.

    Ordering ties on (ts) are broken by event_id so the running
    session index — and therefore the output — is engine-exact.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # Two projections (window functions can't nest in one expression);
    # both windows share the user-key partitioning → one exchange.
    flagged = df.withColumn(
        "__is_new",
        F.when(prev_ts.isNull(), 1)
        .when(F.col(ts_col).cast("long") - prev_ts.cast("long") > gap_seconds, 1)
        .otherwise(0),
    )
    with_sess = flagged.withColumn(
        "session_idx",
        F.sum("__is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sess.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    )


SESSIONIZE_ORACLE = """
WITH g AS (
  SELECT
    user_id, ts, event_id, value,
    CASE
      WHEN lag(ts) OVER w IS NULL THEN 1
      WHEN epoch(ts) - epoch(lag(ts) OVER w) > 14400 THEN 1
      ELSE 0
    END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT
    user_id, ts, value,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS session_idx
  FROM g
)
SELECT
  user_id,
  session_idx,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
FROM s
GROUP BY user_id, session_idx
"""


@query("events_sessionize_gap", oracle=SESSIONIZE_ORACLE, tags=("timeseries", "window", "agg"))
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with a 4-hour inactivity gap: per-user
    running session index (lag + cumulative sum) then one aggregate
    per (user, session). See :func:`sessionize` for the scale design."""
    return sessionize(load(spark, sf_dir, "events"), gap_seconds=14400)


# --- robust (MAD) anomaly detection ---------------------------------------

MAD_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), med AS (
  SELECT event_type, median(n) AS med FROM hourly GROUP BY event_type
), madt AS (
  SELECT h.event_type, median(abs(CAST(h.n AS DOUBLE) - m.med)) AS mad
  FROM hourly h JOIN med m USING (event_type) GROUP BY h.event_type
)
SELECT h.event_type, CAST(h.h AS VARCHAR) AS hour_str,
       CAST(h.n AS BIGINT) AS n_events,
       m.med, d.mad,
       CAST(h.n AS DOUBLE) > m.med + 5.0 * d.mad AS is_anomaly
FROM hourly h JOIN med m USING (event_type) JOIN madt d USING (event_type)
"""


@query("timeseries_anomaly_mad", oracle=MAD_ORACLE, tags=("timeseries", "agg", "stats"))
def timeseries_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume-anomaly flags: hourly event counts per type
    scored against the type's median + 5×MAD (median absolute
    deviation) — the robust z-score that a single traffic spike
    cannot poison, unlike mean/stddev (timeseries_rolling_zscore's
    complement: global robust baseline vs rolling parametric).
    Degenerate series (MAD = 0, common for sparse types) flag any
    count above the median — documented, identical in both engines.

    Scale: the hourly rollup is the only pass over raw events (one
    map-side-combinable groupBy); both medians run per event_type
    over the SMALL rollup (≤ hours×types rows). Medians of integer
    counts interpolate as (a+b)/2 — exact in double, so Spark's
    median and DuckDB's agree bit-for-bit."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
    )
    med = hourly.groupBy("event_type").agg(F.median("n").alias("med"))
    madt = (
        hourly.join(med, "event_type")
        .groupBy("event_type")
        .agg(F.median(F.abs(F.col("n").cast("double") - F.col("med"))).alias("mad"))
    )
    return (
        hourly.join(med, "event_type")
        .join(madt, "event_type")
        .select(
            "event_type",
            F.col("h").cast("string").alias("hour_str"),
            F.col("n").cast("bigint").alias("n_events"),
            "med",
            "mad",
            (F.col("n").cast("double") > F.col("med") + F.lit(5.0) * F.col("mad"))
            .alias("is_anomaly"),
        )
    )


# --- LTTB downsampling ----------------------------------------------------

LTTB_ORACLE = """
WITH pts AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) AS x,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS yq,
         value,
         ts,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS rn
  FROM events
), bp AS (
  SELECT *, rn // 20 AS b FROM pts
), bstats AS (
  SELECT event_type, b, COUNT(*) AS cnt,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
         MAX(b) OVER (PARTITION BY event_type) AS bmax
  FROM bp GROUP BY event_type, b
), banchor AS (
  SELECT event_type, b, bmax,
         lag(CAST(sx AS DOUBLE) / cnt)  OVER w AS axp,
         lag(CAST(sy AS DOUBLE) / 1000000.0 / cnt) OVER w AS ayp,
         lead(CAST(sx AS DOUBLE) / cnt) OVER w AS axn,
         lead(CAST(sy AS DOUBLE) / 1000000.0 / cnt) OVER w AS ayn
  FROM bstats
  WINDOW w AS (PARTITION BY event_type ORDER BY b)
), scored AS (
  SELECT p.event_type, p.b, p.rn, p.ts, p.value, a.bmax,
         CASE WHEN a.axp IS NULL OR a.axn IS NULL THEN NULL
              ELSE abs((a.axp - a.axn) * (CAST(p.yq AS DOUBLE) / 1000000.0 - a.ayp)
                       - (a.axp - CAST(p.x AS DOUBLE)) * (a.ayn - a.ayp))
         END AS area
  FROM bp p JOIN banchor a ON a.event_type = p.event_type AND a.b = p.b
), ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY event_type, b
           ORDER BY CASE WHEN b = 0 THEN rn
                         WHEN b = bmax THEN -rn
                         ELSE NULL END ASC NULLS LAST,
                    area DESC, rn ASC
         ) AS pick
  FROM scored
)
SELECT event_type, CAST(ts AS VARCHAR) AS ts_str, value, CAST(b AS BIGINT) AS bucket
FROM ranked WHERE pick = 1
"""


@query("timeseries_lttb_downsample", oracle=LTTB_ORACLE, tags=("timeseries", "window"))
def timeseries_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013;
    the Timescale/Grafana visual-fidelity downsampler) with FIXED
    anchors: each 20-point bucket keeps the point forming the largest
    triangle against its neighbor buckets' average points (classic
    LTTB chains the previously SELECTED point — inherently sequential;
    anchoring on bucket averages is the standard parallel relaxation
    and is what makes the operator one window pass instead of a
    per-series scan). First/last buckets keep their first/last point,
    per the original algorithm.

    Determinism: bucket averages come from exact BIGINT sums (epoch
    micros; values quantized 1e6) divided once in a pinned order, and
    the triangle-area floats then evaluate identically in both
    engines; ties break on earliest row. Scale: one shuffle on the
    series key; bucket stats are a map-side-combinable groupBy over
    points, anchors a window over the per-BUCKET rollup; per-point
    state is O(1)."""
    ev = load(spark, sf_dir, "events")
    w_rn = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pts = ev.select(
        "event_type",
        F.unix_micros("ts").alias("x"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint").alias("yq"),
        "value",
        "ts",
        (F.row_number().over(w_rn) - 1).alias("rn"),
    )
    bp = pts.withColumn("b", F.expr("rn DIV 20"))
    bstats = (
        bp.groupBy("event_type", "b")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("x").alias("sx"),
            F.sum("yq").alias("sy"),
        )
        .withColumn("bmax", F.max("b").over(Window.partitionBy("event_type")))
    )
    w_b = Window.partitionBy("event_type").orderBy("b")
    ax = F.col("sx").cast("double") / F.col("cnt")
    ay = F.col("sy").cast("double") / F.lit(1000000.0) / F.col("cnt")
    banchor = bstats.select(
        "event_type",
        "b",
        "bmax",
        F.lag(ax).over(w_b).alias("axp"),
        F.lag(ay).over(w_b).alias("ayp"),
        F.lead(ax).over(w_b).alias("axn"),
        F.lead(ay).over(w_b).alias("ayn"),
    )
    py = F.col("yq").cast("double") / F.lit(1000000.0)
    area = F.when(
        F.col("axp").isNull() | F.col("axn").isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.abs(
            (F.col("axp") - F.col("axn")) * (py - F.col("ayp"))
            - (F.col("axp") - F.col("x").cast("double")) * (F.col("ayn") - F.col("ayp"))
        )
    )
    scored = bp.join(banchor, ["event_type", "b"]).select(
        "event_type", "b", "rn", "ts", "value", "bmax", area.alias("area")
    )
    head_tail = (
        F.when(F.col("b") == 0, F.col("rn"))
        .when(F.col("b") == F.col("bmax"), -F.col("rn"))
        .otherwise(F.lit(None).cast("bigint"))
    )
    w_pick = Window.partitionBy("event_type", "b").orderBy(
        head_tail.asc_nulls_last(), F.col("area").desc(), F.col("rn").asc()
    )
    return (
        scored.withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") == 1)
        .select(
            "event_type",
            F.col("ts").cast("string").alias("ts_str"),
            "value",
            F.col("b").cast("bigint").alias("bucket"),
        )
    )


# --- market-basket affinity (association rules) ---------------------------

BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS item
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n_orders AS (
  SELECT COUNT(DISTINCT okey) AS n FROM items
), supp AS (
  SELECT item, COUNT(*) AS s FROM items GROUP BY item
), pair_supp AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS s_ab
  FROM items a JOIN items b ON a.okey = b.okey AND a.item < b.item
  GROUP BY a.item, b.item
)
SELECT p.item_a, p.item_b,
       CAST(p.s_ab AS BIGINT) AS support_ab,
       CAST(p.s_ab AS DOUBLE) / sa.s AS confidence_a_to_b,
       CAST(p.s_ab AS DOUBLE) * n.n / (CAST(sa.s AS BIGINT) * CAST(sb.s AS BIGINT))
         AS lift
FROM pair_supp p
JOIN supp sa ON sa.item = p.item_a
JOIN supp sb ON sb.item = p.item_b
CROSS JOIN n_orders n
WHERE p.s_ab >= 5
"""


@query("basket_brand_affinity", oracle=BASKET_ORACLE, tags=("agg", "join", "stats"))
def basket_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (Agrawal et al. 1993 support/
    confidence/lift) over brands co-purchased in one order: pair
    support from a WITHIN-BASKET self-join (baskets are small — the
    join fans out |basket|² per order, never |catalog|²), item support
    and the order total as broadcast sides, min-support 5 pruning the
    long tail.

    Scale: the within-order pair join shuffles on the order key once;
    supports are map-side-combinable counts; lift arithmetic is a
    double expression over exact BIGINT counts — bit-identical in the
    oracle. The A-Priori trick (prune items below min-support BEFORE
    pairing) drops in as one extra semi-join when baskets are large."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("item"))
        .distinct()
    )
    n_orders = items.agg(F.countDistinct("okey").alias("n"))
    supp = items.groupBy("item").agg(F.count("*").alias("s"))
    a = items.select("okey", F.col("item").alias("item_a"))
    b = items.select("okey", F.col("item").alias("item_b"))
    pair_supp = (
        a.join(b, "okey")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("s_ab"))
        .filter(F.col("s_ab") >= 5)
    )
    sa = supp.select(F.col("item").alias("item_a"), F.col("s").alias("sa"))
    sb = supp.select(F.col("item").alias("item_b"), F.col("s").alias("sb"))
    return (
        pair_supp.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a",
            "item_b",
            F.col("s_ab").cast("bigint").alias("support_ab"),
            (F.col("s_ab").cast("double") / F.col("sa")).alias("confidence_a_to_b"),
            (
                F.col("s_ab").cast("double") * F.col("n")
                / (F.col("sa").cast("bigint") * F.col("sb").cast("bigint"))
            ).alias("lift"),
        )
    )


# --- exponentially-weighted moving average --------------------------------

# e0 suffix forces DOUBLE literals in DuckDB (bare decimals lex as
# DECIMAL, whose int128/10^s -> double conversion double-rounds)
_EWMA_W = "[" + ", ".join(f"{0.9 ** k!r}e0" for k in range(20)) + "]"
_EWMA_W_SPARK = "array(" + ", ".join(f"{0.9 ** k!r}D" for k in range(20)) + ")"

EWMA_ORACLE = f"""
WITH fr AS (
  SELECT event_id, user_id, ts, value,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
         ) AS vals
  FROM events
)
SELECT event_id, user_id, CAST(ts AS VARCHAR) AS ts_str, value,
       list_reduce(list_transform(
         list_zip(list_reverse(vals), list_slice({_EWMA_W}, 1, len(vals))),
         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)
       / list_reduce(list_slice({_EWMA_W}, 1, len(vals)), (a, b) -> a + b) AS ewma
FROM fr
"""


@query("timeseries_ewma_rows", oracle=EWMA_ORACLE, tags=("timeseries", "window"))
def timeseries_ewma_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 0.1, i.e. decay 0.9)
    over each user's trailing 20 events — the trend smoother behind
    monitoring dashboards, as a WINDOW expression rather than a
    sequential scan: the frame's values are zipped against a
    20-element decay-weight literal (0.9^k spelled as exact repr
    literals, so both engines parse the identical doubles) and folded
    left-to-right, normalized by the weights actually present (exact
    pandas ewm(adjust=True) semantics, truncated to 20 lags — the
    infinite tail's weight is 0.9^20 ≈ 0.12 of mass, documented).

    Scale: one shuffle on the series key; the frame is ROWS-bounded
    so state per row is O(20); the fold order is the list order in
    both engines, making the float sum bit-identical."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    fr = ev.select(
        "event_id", "user_id", "ts", "value",
        F.collect_list("value").over(w).alias("vals"),
    )
    ewma = F.expr(
        f"aggregate(zip_with(reverse(vals), slice({_EWMA_W_SPARK}, 1, size(vals)),"
        f" (v, wt) -> CAST(v AS DOUBLE) * wt), 0.0D, (a, b) -> a + b)"
        f" / aggregate(slice({_EWMA_W_SPARK}, 1, size(vals)), 0.0D, (a, b) -> a + b)"
    )
    return fr.select(
        "event_id", "user_id",
        F.col("ts").cast("string").alias("ts_str"),
        "value",
        ewma.alias("ewma"),
    )


# --- DAU/MAU stickiness ---------------------------------------------------

DAU_MAU_ORACLE = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
), dau AS (
  SELECT day, COUNT(*) AS dau FROM du GROUP BY day
), exploded AS (
  SELECT du.user_id, du.day + to_days(CAST(r.i AS INT)) AS obs_day
  FROM du, unnest(range(0, 30)) AS r(i)
), mau AS (
  SELECT e.obs_day AS day, COUNT(DISTINCT e.user_id) AS mau
  FROM exploded e JOIN dau d ON d.day = e.obs_day
  GROUP BY e.obs_day
)
SELECT CAST(CAST(d.day AS TIMESTAMP) AS VARCHAR) AS day_str,
       CAST(d.dau AS BIGINT) AS dau,
       CAST(m.mau AS BIGINT) AS mau,
       CAST(d.dau AS DOUBLE) / m.mau AS stickiness
FROM dau d JOIN mau m ON m.day = d.day
"""


@query("events_dau_mau_stickiness", oracle=DAU_MAU_ORACLE, tags=("timeseries", "agg"))
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — daily actives over trailing-30-day
    actives, the engagement ratio every product dashboard carries.
    Trailing-window COUNT(DISTINCT) can't partial-aggregate directly;
    the scalable form EXPLODES each (day, user) activity row into the
    30 observation days it contributes to (a bounded 30× expansion of
    the small day×user ROLLUP, not of raw events) and counts distinct
    users per observation day — turning a windowed distinct into a
    plain groupBy the engine can shuffle once. Early days carry
    partial windows, per the standard metric definition.

    Scale: raw events collapse to day×user first (one
    map-side-combinable distinct); everything after works on rollup
    rows. Both engines run the identical expansion."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    exploded = du.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(29))).alias("i"),
        "day",
    ).select(
        "user_id",
        F.expr("day + make_interval(0, 0, 0, CAST(i AS INT), 0, 0, 0)").alias("obs_day"),
    )
    mau = (
        exploded.join(dau.select(F.col("day").alias("obs_day")), "obs_day")
        .groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(mau, dau.day == mau.obs_day)
        .select(
            F.col("day").cast("string").alias("day_str"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("mau").cast("bigint").alias("mau"),
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
    )


# --- rolling median -------------------------------------------------------

ROLLING_MEDIAN_ORACLE = """
WITH fr AS (
  SELECT event_id, user_id, ts, value,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
         ) AS vals
  FROM events
)
SELECT event_id, user_id, CAST(ts AS VARCHAR) AS ts_str, value,
       CASE WHEN len(vals) % 2 = 1
            THEN list_sort(vals)[(len(vals) + 1) // 2]
            ELSE (list_sort(vals)[len(vals) // 2]
                  + list_sort(vals)[len(vals) // 2 + 1]) / 2.0
       END AS rolling_median
FROM fr
"""


@query("window_rolling_median", oracle=ROLLING_MEDIAN_ORACLE, tags=("window", "timeseries", "stats"))
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over each user's trailing 20 events — the robust
    moving-center neither engine offers as a native window aggregate
    (percentiles can't partial-aggregate); expressed portably as a
    frame-collect + sort + middle pick. Complements
    timeseries_rolling_zscore (parametric) and timeseries_anomaly_mad
    (global robust) with the ROLLING robust baseline.

    Scale: one series-key shuffle; O(20 log 20) per row on a bounded
    frame — at wider frames the right tool is a mergeable quantile
    sketch per window (sketch_histogram_quantile's shape)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    fr = ev.select(
        "event_id", "user_id", "ts", "value",
        F.collect_list("value").over(w).alias("vals"),
    )
    srt = F.array_sort("vals")
    n = F.size("vals")
    mid_hi = F.expr("(size(vals) + 1) DIV 2").cast("int")
    mid_lo = F.expr("size(vals) DIV 2").cast("int")
    med = F.when(
        n % 2 == 1, F.element_at(srt, mid_hi)
    ).otherwise(
        (F.element_at(srt, mid_lo) + F.element_at(srt, mid_lo + 1)) / F.lit(2.0)
    )
    return fr.select(
        "event_id", "user_id",
        F.col("ts").cast("string").alias("ts_str"),
        "value",
        med.alias("rolling_median"),
    )


# --- time-bound funnel (MATCH_RECOGNIZE-lite) -----------------------------

FUNNEL_TB_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click'
    AND e.ts > v.view_ts AND e.ts <= v.view_ts + INTERVAL 24 HOURS
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > c.click_ts AND e.ts <= c.click_ts + INTERVAL 24 HOURS
  GROUP BY e.user_id
)
SELECT
  v.user_id,
  CAST(v.view_ts AS VARCHAR) AS view_ts,
  CAST(c.click_ts AS VARCHAR) AS click_ts,
  CAST(p.purchase_ts AS VARCHAR) AS purchase_ts,
  p.user_id IS NOT NULL AS converted
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


@query("events_funnel_time_bound", oracle=FUNNEL_TB_ORACLE, tags=("timeseries", "agg"))
def events_funnel_time_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained ordered funnel (the MATCH_RECOGNIZE
    `A -> B within 24h -> C within 24h` pattern, which neither engine
    ships): each stage's earliest qualifying event must fall inside a
    24-hour window of the previous stage's. Same chained one-key
    aggregate shape as events_funnel_conversion — the time bound is a
    per-row predicate, adding zero shuffles; sequential pattern
    engines (Flink CEP) buffer per-key state to do this, the batch
    form is three co-partitioned joins."""
    ev = load(spark, sf_dir, "events")
    day_us = F.expr("INTERVAL 24 HOURS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("view_ts")) & (F.col("ts") <= F.col("view_ts") + day_us))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("click_ts")) & (F.col("ts") <= F.col("click_ts") + day_us))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.col("view_ts").cast("string").alias("view_ts"),
            F.col("click_ts").cast("string").alias("click_ts"),
            F.col("purchase_ts").cast("string").alias("purchase_ts"),
            F.col("purchase_ts").isNotNull().alias("converted"),
        )
    )


# --- interval-overlap join (binned) ---------------------------------------

OVERLAP_JOIN_ORACLE = """
WITH a AS (
  SELECT o_orderkey AS id_a, o_custkey % 20 AS k,
         o_orderdate AS s, o_orderdate + to_days(CAST(o_orderkey % 30 AS INT)) AS e
  FROM orders WHERE o_orderkey % 10 = 0
), b AS (
  SELECT o_orderkey AS id_b, o_custkey % 20 AS k,
         o_orderdate AS s, o_orderdate + to_days(CAST(o_orderkey % 45 AS INT)) AS e
  FROM orders WHERE o_orderkey % 10 = 1
)
SELECT a.id_a, b.id_b, CAST(a.k AS BIGINT) AS k,
       CAST(GREATEST(a.s, b.s) AS VARCHAR) AS overlap_start,
       CAST(LEAST(a.e, b.e) AS VARCHAR) AS overlap_end
FROM a JOIN b ON a.k = b.k AND a.s <= b.e AND b.s <= a.e
"""


def _interval_bins(s, e, width_s: int):
    from pyspark.sql import functions as F2

    return F2.sequence(
        F2.floor(F2.unix_timestamp(s) / width_s),
        F2.floor(F2.unix_timestamp(e) / width_s),
    )


@query("join_interval_overlap_binned", oracle=OVERLAP_JOIN_ORACLE, tags=("join", "timeseries"))
def join_interval_overlap_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval OVERLAP join (temporal/genomic range
    intersection — the two-sided generalization of
    join_interval_binned's point-in-interval): both interval sets
    explode into the fixed-width time bins they touch, the join runs
    as a plain EQUI join on (entity, bin) with the exact overlap
    predicate behind it, and each overlapping pair survives exactly
    once WITHOUT a distinct — it is kept only in the bin containing
    the overlap's start (greatest of the two starts), the standard
    bin-dedup trick.

    Scale: pair work is bounded by co-binned intervals (Σ per-bin
    |A|·|B| within each entity), never |A|·|B| global; bin width
    trades fan-out (intervals span few bins) against bucket density —
    the same knob as every binned range join. The oracle is the plain
    theta join."""
    o = load(spark, sf_dir, "orders")
    width_s = 30 * 86400
    a = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("id_a"),
        (F.col("o_custkey") % 20).alias("k"),
        F.col("o_orderdate").alias("s_a"),
        F.expr("o_orderdate + make_interval(0, 0, 0, CAST(o_orderkey % 30 AS INT), 0, 0, 0)").alias("e_a"),
    )
    b = o.filter(F.col("o_orderkey") % 10 == 1).select(
        F.col("o_orderkey").alias("id_b"),
        (F.col("o_custkey") % 20).alias("k"),
        F.col("o_orderdate").alias("s_b"),
        F.expr("o_orderdate + make_interval(0, 0, 0, CAST(o_orderkey % 45 AS INT), 0, 0, 0)").alias("e_b"),
    )
    ax = a.withColumn("bin", F.explode(_interval_bins(F.col("s_a"), F.col("e_a"), width_s)))
    bx = b.withColumn("bin", F.explode(_interval_bins(F.col("s_b"), F.col("e_b"), width_s)))
    start_max = F.greatest(F.col("s_a"), F.col("s_b"))
    return (
        ax.join(bx, ["k", "bin"])
        .filter((F.col("s_a") <= F.col("e_b")) & (F.col("s_b") <= F.col("e_a")))
        .filter(F.col("bin") == F.floor(F.unix_timestamp(start_max) / width_s))
        .select(
            "id_a",
            "id_b",
            F.col("k").cast("bigint").alias("k"),
            start_max.cast("string").alias("overlap_start"),
            F.least(F.col("e_a"), F.col("e_b")).cast("string").alias("overlap_end"),
        )
    )


# --- CUSUM changepoint ----------------------------------------------------

CUSUM_ORACLE = """
WITH q AS (
  SELECT event_type, ts, event_id,
    CAST(floor(value * 1000000.0e0 + 0.5e0) AS BIGINT) AS v_q
  FROM events
), m AS (
  SELECT event_type,
    CAST(SUM(v_q) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_q,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM q GROUP BY event_type
), s AS (
  SELECT q.event_type, q.ts, m.n,
    CAST(SUM(q.v_q - m.mean_q) OVER (PARTITION BY q.event_type
      ORDER BY q.ts, q.event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum
  FROM q JOIN m USING (event_type)
)
SELECT event_type, ts AS changepoint_ts,
  CAST(abs(cusum) AS BIGINT) AS max_abs_cusum_q, n
FROM s
QUALIFY row_number() OVER (PARTITION BY event_type
  ORDER BY abs(cusum) DESC, ts, cusum) = 1
"""


@query("timeseries_changepoint_cusum", oracle=CUSUM_ORACLE, tags=("timeseries", "window"))
def timeseries_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection (Page 1954) per event-type series:
    the running sum of deviations from the series mean peaks (in
    absolute value) exactly where the level shifts — the classic
    mean-shift locator, joining MAD (outliers), chi-square/KS
    (distribution drift) to complete the monitoring family.

    Exactness: values quantize to µ-unit BIGINTs at the scan, the
    series mean is an integer floor-division, so every cusum is an
    exact integer — the argmax row (ties broken by earliest ts) is
    identical across engines and partitionings; no float ever enters
    a cross-partition sum.

    Scale: one shuffle on the series key serves the mean aggregate,
    the running window, and the argmax pick (same-key windows share
    the sort); state per series is O(1). The mean rejoins as a
    per-series broadcast-size table, not a driver scalar."""
    e = load(spark, sf_dir, "events")
    q = e.select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("bigint").alias("v_q"),
    )
    m = q.groupBy("event_type").agg(
        F.expr("CAST(SUM(v_q) AS BIGINT) DIV COUNT(*)").alias("mean_q"),
        F.count("*").cast("bigint").alias("n"),
    )
    run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = q.join(F.broadcast(m), "event_type").select(
        "event_type",
        "ts",
        "event_id",
        "n",
        F.sum(F.col("v_q") - F.col("mean_q")).over(run).cast("bigint").alias("cusum"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "ts", "cusum"
    )
    return (
        s.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("ts").alias("changepoint_ts"),
            F.abs(F.col("cusum")).cast("bigint").alias("max_abs_cusum_q"),
            "n",
        )
    )


# --- seasonal-naive forecast backtest -------------------------------------

SEASONAL_NAIVE_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
    CAST(SUM(CAST(floor(value * 1000000.0e0 + 0.5e0) AS BIGINT)) AS BIGINT)
      AS v_q
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT a.event_type, abs(a.v_q - b.v_q) AS abs_err
  FROM hourly a
  JOIN hourly b
    ON b.event_type = a.event_type
   AND b.h = a.h - INTERVAL 7 DAY
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_hours_scored,
  CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err_q,
  CAST(CAST(SUM(abs_err) AS BIGINT) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) / 1000000.0e0 AS mae
FROM scored
GROUP BY event_type
"""


@query(
    "timeseries_seasonal_naive_forecast",
    oracle=SEASONAL_NAIVE_ORACLE,
    tags=("timeseries", "join"),
)
def timeseries_seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each hour's volume
    with the SAME HOUR ONE WEEK EARLIER and score the mean absolute
    error per series — the standard baseline every forecasting model
    must beat, and the cheapest useful capacity-planning signal.

    The seasonal lag is an equi join on (series, h − 7 days), not a
    LAG(168) — the hourly grid has gaps, and a row-offset lag would
    silently compare different hours of the week; the join is correct
    by construction and drops unscoreable hours.

    Exactness: hour sums are µ-quantized BIGINTs (exact, associative),
    absolute errors and their sum stay integers; MAE's two divisions
    are the only float ops, in a fixed sequence.

    Scale: one (series, hour) rollup pass — map-side combinable,
    output |series|·|hours| — then a rollup-sized self equi join on
    the series key and one final aggregate. Raw events are touched
    once."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.sum(
                F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("v_q")
        )
    )
    a = hourly.alias("a")
    b = hourly.alias("b")
    scored = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.h") == F.col("a.h") - F.expr("INTERVAL 7 DAY")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.abs(F.col("a.v_q") - F.col("b.v_q")).alias("abs_err"),
    )
    return scored.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_hours_scored"),
        F.sum("abs_err").cast("bigint").alias("sum_abs_err_q"),
        (
            F.sum("abs_err").cast("bigint").cast("double")
            / F.count("*").cast("double")
            / F.lit(1000000.0)
        ).alias("mae"),
    )


# --- per-user feature vector (feature-store shape over the event stream) ----

USER_FEATURES_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(COALESCE(SUM(CAST(value AS DECIMAL(30,6)))
                     FILTER (event_type = 'purchase'), 0) AS DOUBLE)
         AS purchase_value,
       MAX(ts) AS last_event_ts
FROM events
GROUP BY user_id
"""


@query(
    "events_user_feature_vector",
    oracle=USER_FEATURES_ORACLE,
    tags=("timeseries", "agg", "llm"),
)
def events_user_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral feature vector over the event stream — the
    feature-store artifact a ranking/abuse model trains on: activity
    volume and span, per-type engagement counts, exact-decimal
    purchase value, recency anchor. Complements
    `customers_rfm_segments` (orders-side RFM): this is the
    event-stream side, one row per user.

    Scale: ONE hash shuffle on user_id with map-side partial
    aggregation — per-type counts are conditional expressions, not
    separate passes; the distinct-days count keys the same aggregate
    (Spark plans count(DISTINCT date) as a two-level agg on the SAME
    user_id partitioning — no extra exchange). Adding features adds
    expressions, not shuffles."""
    from ..queries.tpch import dec

    ev = load(spark, sf_dir, "events")
    is_t = lambda t: (F.col("event_type") == t).cast("bigint")  # noqa: E731
    return ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct(F.col("ts").cast("date")).cast("bigint").alias(
            "n_active_days"
        ),
        F.sum(is_t("purchase")).cast("bigint").alias("n_purchase"),
        F.sum(is_t("click")).cast("bigint").alias("n_click"),
        F.sum(is_t("error")).cast("bigint").alias("n_error"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", dec("value"))),
            F.lit(0).cast("decimal(30,6)"),
        )
        .cast("double")
        .alias("purchase_value"),
        F.max("ts").alias("last_event_ts"),
    )
