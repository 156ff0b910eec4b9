"""Stream-stream interval join (Structured Streaming north-star).

The reference has no streaming surface (SURVEY.md §2B Streaming row —
DuckDB v1.5.5), so like streaming/windows.py this is extension, not
parity. The transform is a DataFrame→DataFrame function with identical
semantics in batch and streaming mode:

- **Batch mode** (the catalog entry): a plain inner equi+range join —
  oracle-checkable against DuckDB.
- **Streaming mode** (tests/test_streaming_joins.py): both sides are
  file-source streams with watermarks; the event-time range condition
  plus the two watermarks is exactly what lets Spark bound join state
  (each side's buffered rows expire once the other side's watermark
  passes ``signup_ts + window``). An inner stream-stream join's FINAL
  output set is batch-equal regardless of micro-batch slicing, which
  is what the test pins.

Scale: the join shuffles both streams once on user_id; state per key
is bounded by (watermark delay + join window), the standard shape for
correlating two 100 TB/day feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, query


def signup_activity_join(events: DataFrame, window: str = "1 HOUR") -> DataFrame:
    """Correlate each non-signup activity with the same user's signup
    events at most ``window`` before it: the canonical two-stream
    attribution join. Works on batch or streaming inputs; in streaming
    mode both inputs must carry watermarks (see module docstring).
    """
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("signup_ts"),
        F.col("value").alias("signup_value"),
    )
    acts = events.filter(F.col("event_type") != "signup").select(
        "event_id", "user_id", "ts", "event_type"
    )
    return (
        acts.join(
            signups,
            (acts.user_id == signups.s_user_id)
            & (acts.ts >= signups.signup_ts)
            & (acts.ts < signups.signup_ts + F.expr(f"INTERVAL {window}")),
        )
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("string").alias("ts_str"),
            "event_type",
            F.col("signup_ts").cast("string").alias("signup_ts_str"),
            "signup_value",
        )
    )


STREAM_JOIN_ORACLE = """
SELECT
  a.event_id,
  a.user_id,
  CAST(a.ts AS VARCHAR) AS ts_str,
  a.event_type,
  CAST(s.ts AS VARCHAR) AS signup_ts_str,
  s.value AS signup_value
FROM events a
JOIN events s
  ON a.user_id = s.user_id
 AND s.event_type = 'signup'
 AND a.event_type <> 'signup'
 AND a.ts >= s.ts
 AND a.ts < s.ts + INTERVAL 1 HOUR
"""


@query("stream_stream_interval_join", oracle=STREAM_JOIN_ORACLE, tags=("streaming", "join"))
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mode of the two-stream attribution join (activities ⋈
    signups within 1 h, per user). Streaming execution with watermarked
    state expiry is pinned by tests/test_streaming_joins.py."""
    return signup_activity_join(load(spark, sf_dir, "events"))
