"""applyInPandasWithState: running per-user totals across micro-batch
replay must converge to the batch aggregate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.streaming.stateful import (
    batch_user_totals,
    running_user_totals,
)

from .conftest import SF_DIR


def test_stateful_totals_converge_to_batch(spark, tmp_path):
    events = load(spark, SF_DIR, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "events_replay")
    events.repartition(6).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    # update mode emits one row per user per micro-batch that touched
    # them; the LAST emission per user is the running total — compare
    # against the batch twin
    emitted = spark.table("user_totals").toPandas()
    # multiple triggers ran: keep the max-n_events row per user
    final = emitted.sort_values("n_events").groupby("user_id").tail(1)
    want = batch_user_totals(spark.read.parquet(src)).toPandas()

    got = {int(r.user_id): r for _, r in final.iterrows()}
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[int(w.user_id)]
        assert int(g.n_events) == int(w.n_events)
        assert math.isclose(float(g.sum_value), float(w.sum_value), rel_tol=1e-9)
        assert g.last_seen == w.last_seen
    # state actually accumulated across triggers: some user must have
    # been emitted more than once (6 files, 2 per trigger = 3 triggers)
    assert len(emitted) > len(final)
