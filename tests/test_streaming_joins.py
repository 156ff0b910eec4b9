"""Stream-stream interval join: real two-stream execution equals the
batch join, and watermarks actually bound/expire state (late-data
drop). Complements test_streaming.py's single-stream suites.

Unlike windowed aggregations (batch-equal under ANY replay order),
a watermarked stream-stream join is only batch-equal when the replay
respects event-time order to within the watermark delay — otherwise
rows older than the advancing watermark are dropped on ingest by
design. The equality test therefore replays time-RANGE-ordered
micro-batches (the shape of a real feed), and the late-data test pins
the drop behavior itself, deterministically, via a persisted
checkpoint across two runs."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.streaming.joins import signup_activity_join

from .conftest import SF_DIR


def _set_mtime(parquet_dir: str, mtime: float) -> None:
    for f in os.listdir(parquet_dir):
        os.utime(os.path.join(parquet_dir, f), (mtime, mtime))


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events replayed as 6 time-range-ordered micro-batch files:
    file i covers the i-th sextile of the ts range and carries mtime
    t0+i (the file source orders batches by modification time)."""
    root = str(tmp_path_factory.mktemp("ss_events"))
    ev = load(spark, SF_DIR, "events")
    bounds = ev.select(
        *[F.percentile_approx("ts", q, 10000).alias(f"q{i}") for i, q in enumerate((1 / 6, 2 / 6, 3 / 6, 4 / 6, 5 / 6))]
    ).collect()[0]
    cuts = [bounds[f"q{i}"] for i in range(5)]
    t0 = time.time() - 600
    lo = None
    for i in range(6):
        hi = cuts[i] if i < 5 else None
        sl = ev
        if lo is not None:
            sl = sl.filter(F.col("ts") > F.lit(lo))
        if hi is not None:
            sl = sl.filter(F.col("ts") <= F.lit(hi))
        p = os.path.join(root, f"b{i:02d}")
        sl.coalesce(1).write.mode("overwrite").parquet(p)
        _set_mtime(p, t0 + i)
        lo = hi
    return os.path.join(root, "*")


def test_stream_stream_join_equals_batch(spark, events_dir):
    """Both sides are watermarked file streams replayed in event-time
    order; the inner join's final output set is batch-equal."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
        .withWatermark("ts", "2 hours")
    )
    joined = signup_activity_join(stream)
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    got = sorted(tuple(r) for r in spark.table("ss_join_sink").collect())
    want = sorted(
        tuple(r) for r in signup_activity_join(spark.read.parquet(events_dir)).collect()
    )
    assert got == want
    assert len(got) > 0


def test_watermark_drops_late_rows(spark, tmp_path):
    """Event-time watermark semantics, pinned deterministically via a
    persisted checkpoint: run 1 ingests rows at 00:05 and 02:00
    (watermark advances to 01:50 and is checkpointed); run 2 ingests a
    replayed 00:10 row — its window [00:00, 01:00) closed below the
    checkpointed watermark, so it must NOT be counted."""
    d = tmp_path / "late"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    cols = ["event_id", "ts_s", "user_id", "event_type", "value", "props"]

    def write(rows, name):
        df = spark.createDataFrame(rows, cols).select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        p = str(d / name)
        df.coalesce(1).write.mode("overwrite").parquet(p)
        return p

    def run():
        schema = spark.read.parquet(str(d / "b1")).schema
        stream = (
            spark.readStream.schema(schema)
            .parquet(str(d / "*"))
            .withWatermark("ts", "10 minutes")
        )
        agg = (
            stream.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("start"), "n")
        )
        # file sink (memory sink can't recover from a checkpoint);
        # append mode emits a window only once FINALIZED (watermark
        # passed its end) — exactly the semantics under test
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    write(
        [
            (1, "2024-01-01 00:05:00", 10, "click", 1.0, "{}"),
            (2, "2024-01-01 02:00:00", 11, "click", 1.0, "{}"),
        ],
        "b1",
    )
    run()
    write([(3, "2024-01-01 00:10:00", 12, "click", 1.0, "{}")], "b2")  # late replay
    run()

    rows = [(str(r["start"]), r["n"]) for r in spark.read.parquet(out).collect()]
    # the hour-0 window finalized after run 1 with ONLY the on-time row;
    # run 2's late replay (event 3) was dropped by the checkpointed
    # watermark — no second emission, no recount. The 02:00 window never
    # finalizes (watermark stops at 01:50), so exactly one output row.
    assert rows == [("2024-01-01 00:00:00", 1)], rows
