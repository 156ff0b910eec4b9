"""Structured Streaming patterns over the events table (SURVEY.md §2B
"Streaming" + Phase 4).

The reference has NO streaming surface (DuckDB v1.5.5 — no watermarks,
no stream windows; verified in SURVEY.md §2B), so this module is
north-star extension, not parity. Design:

- Every window transform below is a **DataFrame→DataFrame function
  that works on both batch and streaming inputs** — Spark's unified
  model means ``F.window``/``F.session_window`` aggregations have
  identical semantics either way. The catalog entries run them in
  batch mode, which is what makes them oracle-checkable against
  DuckDB (``time_bucket`` / gaps-and-islands SQL); the pytest suite
  additionally drives them through a real ``readStream`` →
  ``writeStream`` pipeline (file source, memory sink, watermark) and
  asserts stream == batch.

- Scale: windowed streaming aggs shuffle on (window, key) — bounded
  state per watermark; session windows use Spark's native
  session-merge state store. Dedup-within-watermark keeps one state
  row per key inside the horizon, the standard 100 TB stream-dedup
  shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, query

# ---------------------------------------------------------------------------
# transforms (batch + streaming)
# ---------------------------------------------------------------------------


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling-window event counts + value sum per event_type."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, duration: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window counts: each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_windows(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Per-user session windows (gap-based). Sessions close after
    ``gap`` of inactivity; output one row per (user, session)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_events(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Exact dedup on key columns. On a stream, pair with
    ``withWatermark`` + ``dropDuplicatesWithinWatermark`` (see
    ``stream_from_directory``) so state stays bounded."""
    return events.dropDuplicates(keys or ["event_id"])


# ---------------------------------------------------------------------------
# real streaming plumbing (file source → memory sink), used by tests
# ---------------------------------------------------------------------------


def stream_from_directory(
    spark: SparkSession,
    path: str,
    schema,
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream of event parquet files with a watermark —
    the standard replay harness: each file is one micro-batch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
        .withWatermark("ts", watermark)
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain a streaming DataFrame into an in-memory table and wait.
    Returns the StreamingQuery (stopped) for inspection."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return q


# ---------------------------------------------------------------------------
# catalog entries (batch mode of the same transforms, DuckDB oracles)
# ---------------------------------------------------------------------------

TUMBLING_ORACLE = """
SELECT
  time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("stream_tumbling_window_counts", oracle=TUMBLING_ORACLE, tags=("streaming", "window"))
def stream_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (batch mode of the streaming transform;
    oracle = DuckDB time_bucket)."""
    return tumbling_counts(load(spark, sf_dir, "events"), "1 hour")


# A 1h window sliding every 30min: an event at time t belongs to the
# windows starting at bucket30(t) and bucket30(t) - 30min.
SLIDING_ORACLE = """
SELECT window_start, COUNT(*) AS n_events
FROM (
  SELECT unnest([
    time_bucket(INTERVAL 30 MINUTES, ts),
    time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES
  ]) AS window_start
  FROM events
) t
GROUP BY 1
"""


@query("stream_sliding_window_counts", oracle=SLIDING_ORACLE, tags=("streaming", "window"))
def stream_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h every 30min); oracle expands each event to
    its two member windows via unnest."""
    return sliding_counts(load(spark, sf_dir, "events"), "1 hour", "30 minutes")


# Gaps-and-islands: a new session starts when the gap to the previous
# event of the same user exceeds 5 minutes; session id = running count
# of session starts. session_end = last ts + gap (Spark's session
# window end is exclusive bound = last event + gap).
SESSION_ORACLE = """
WITH marked AS (
  SELECT
    user_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              <= INTERVAL 5 MINUTES THEN 0 ELSE 1 END AS new_session
  FROM events
),
sessions AS (
  SELECT
    user_id, ts,
    SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_id
  FROM marked
)
SELECT
  user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 5 MINUTES AS session_end,
  COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


@query("stream_session_window_agg", oracle=SESSION_ORACLE, tags=("streaming", "window"))
def stream_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-minute-gap session windows; oracle is the classic
    gaps-and-islands construction."""
    return session_windows(load(spark, sf_dir, "events"), "5 minutes")


DEDUP_ORACLE = """
SELECT event_id, COUNT(*) AS n
FROM (
  SELECT DISTINCT ON (event_id) event_id FROM events
) t
GROUP BY event_id
"""


@query("stream_dedup_by_key", oracle=DEDUP_ORACLE, tags=("streaming", "dedup"))
def stream_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-dedup (batch twin of dropDuplicatesWithinWatermark)."""
    return (
        dedup_events(load(spark, sf_dir, "events"))
        .groupBy("event_id")
        .agg(F.count("*").alias("n"))
    )


def enriched_segment_windows(
    events: DataFrame, customer: DataFrame, duration: str = "1 hour"
) -> DataFrame:
    """Stream-static enrichment: join the (possibly streaming) event
    feed to a static dimension, then window-aggregate by the enriched
    attribute. In streaming mode Spark re-broadcasts the static side
    per micro-batch — no state is kept for the dim, so this is the
    standard shape for joining a 100 TB/day feed against reference
    data."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    joined = events.join(dim, "user_id")
    return (
        joined.groupBy(F.window("ts", duration).alias("w"), "segment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "segment", "n_events", "sum_value")
    )


ENRICHED_ORACLE = """
SELECT
  time_bucket(INTERVAL 1 HOUR, e.ts) AS window_start,
  c.c_mktsegment AS segment,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


@query("stream_static_enrichment_join", oracle=ENRICHED_ORACLE, tags=("streaming", "join"))
def stream_static_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed aggregate over a stream-static dimension join (batch
    mode of the streaming transform; streaming execution pinned by
    tests/test_streaming.py)."""
    return enriched_segment_windows(
        load(spark, sf_dir, "events"), load(spark, sf_dir, "customer")
    )


# --- streaming HLL registers ----------------------------------------------

def hll_registers(df: DataFrame, key_col: str, m_buckets: int = 64) -> DataFrame:
    """HLL register table (bucket, m) over ``key_col`` — works
    UNCHANGED as a streaming aggregation because MAX is what a
    streaming state store keeps per group: each micro-batch folds its
    rows into the 64 running registers, giving distinct-so-far at
    every trigger without storing keys. Same portable md5/bin
    construction as sketch_hll_distinct, so the batch oracle and the
    streamed registers agree exactly (pinned in
    tests/test_streaming.py::test_stream_hll_registers_match_batch)."""
    hx = F.md5(F.col(key_col).cast("string"))
    return (
        df.select(
            (F.conv(F.substring(hx, 1, 2), 16, 10).cast("bigint") % m_buckets)
            .alias("bucket"),
            (
                F.lit(57)
                - F.length(F.bin(F.conv(F.substring(hx, 3, 14), 16, 10).cast("bigint")))
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m"))
    )


STREAM_HLL_ORACLE = """
WITH h AS (
  SELECT md5(CAST(event_id AS VARCHAR)) AS hx FROM events
), bw AS (
  SELECT CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % 64 AS bucket,
         57 - length(bin(CAST(('0x' || substr(hx, 3, 14)) AS BIGINT))) AS rho
  FROM h
), regs AS (
  SELECT bucket, MAX(rho) AS m FROM bw GROUP BY bucket
), s AS (
  SELECT CAST(SUM(CAST(power(2, 32 - LEAST(m, 32)) AS BIGINT)) AS BIGINT)
         + (64 - COUNT(*)) * CAST(4294967296 AS BIGINT) AS denom,
         COUNT(*) AS n_regs
  FROM regs
), ex AS (
  SELECT COUNT(DISTINCT event_id) AS exact_distinct FROM events
)
SELECT ex.exact_distinct,
       CAST(0.709 AS DOUBLE) * 4096.0 * 4294967296.0 / CAST(s.denom AS DOUBLE)
         AS hll_est,
       s.n_regs,
       ex.exact_distinct < 256
       OR abs((CAST(0.709 AS DOUBLE) * 4096.0 * 4294967296.0 / CAST(s.denom AS DOUBLE))
              / CAST(ex.exact_distinct AS DOUBLE) - 1.0) <= 0.35 AS bound_ok
FROM ex CROSS JOIN s
"""


@query("stream_hll_distinct_events", oracle=STREAM_HLL_ORACLE, tags=("streaming", "approx", "agg"))
def stream_hll_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-events-so-far as a STREAMING sketch (batch mode of
    hll_registers — the real readStream leg is pytest-driven like the
    window entries): 64 MAX-registers are the entire state, so the
    streaming aggregation answers COUNT(DISTINCT) at every trigger in
    O(64) memory where exact streaming distinct state grows with the
    key space. The estimate arithmetic is the exact-integer form of
    sketch_hll_distinct; bound gated to the raw-HLL quotable regime."""
    ev = load(spark, sf_dir, "events")
    regs = hll_registers(ev, "event_id")
    s = regs.agg(
        (
            F.sum(
                F.pow(
                    F.lit(2.0),
                    (F.lit(32) - F.least(F.col("m"), F.lit(32))).cast("double"),
                ).cast("bigint")
            )
            + (F.lit(64) - F.count("*")) * F.lit(4294967296).cast("bigint")
        ).alias("denom"),
        F.count("*").alias("n_regs"),
    )
    est = (
        F.lit(0.709) * F.lit(4096.0) * F.lit(4294967296.0)
        / F.col("denom").cast("double")
    )
    ex = ev.agg(F.countDistinct("event_id").alias("exact_distinct"))
    return ex.crossJoin(F.broadcast(s)).select(
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        est.alias("hll_est"),
        F.col("n_regs").cast("bigint").alias("n_regs"),
        (
            (F.col("exact_distinct") < 256)
            | (
                F.abs(est / F.col("exact_distinct").cast("double") - F.lit(1.0))
                <= F.lit(0.35)
            )
        ).alias("bound_ok"),
    )
