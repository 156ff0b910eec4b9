"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2B Streaming north-star: "applyInPandasWithState for
custom stateful operators" — no reference parity, DuckDB v1.5.5 has
no streaming state at all).

``running_user_totals`` keeps per-user running aggregates across
micro-batches: (n_events, sum_value, last_seen). Each micro-batch
emits the updated totals for the users present in that batch
("update"-mode semantics). State is one small tuple per user — at
100 TB/day event volume the state store scales with |users|, not
|events|, and Spark's HDFS/RocksDB state backends checkpoint it per
trigger.

The batch twin (plain groupBy over the same columns) is what tests
compare against after draining a replayed file stream: final emitted
totals per user must equal the batch aggregate — the unified-model
guarantee, extended to custom state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _update_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, sv, last_us = state.get
    else:
        n, sv, last_us = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        sv += float(pdf["value"].sum())
        batch_last = pdf["ts"].max()
        us = int(batch_last.value // 1000)
        last_us = us if last_us is None else max(last_us, us)
    state.update((n, sv, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [sv],
            "last_seen": [pd.Timestamp(last_us * 1000)],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals with explicit state. Input needs
    (user_id, ts, value); works only on streaming DataFrames (the
    batch twin is a plain groupBy — see tests)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """The batch twin of running_user_totals' final state."""
    return events.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.max("ts").alias("last_seen"),
    )
