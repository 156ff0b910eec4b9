"""Property-based checks for operators/timeseries.py: random
points/intervals compared against the naive range join, and random
sparse series interpolated against a pandas reference — generated edge
cases (empty overlap, boundary-exact timestamps, single-observation
groups) on top of the fixed-dataset DuckDB oracle entries."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from duckdb_vortex_spark.operators.timeseries import (
    interval_bin_join,
    time_bucket_interpolate,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

HOURS = st.integers(min_value=0, max_value=120)


@st.composite
def interval_case(draw):
    points = draw(st.lists(HOURS, min_size=1, max_size=20))
    intervals = draw(
        st.lists(st.tuples(HOURS, st.integers(1, 60)), min_size=1, max_size=8)
    )
    return points, intervals


def _ts(h):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(hours=int(h))


@given(case=interval_case())
@settings(**_SETTINGS)
def test_interval_bin_join_equals_naive(spark, case):
    points, intervals = case
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": range(len(points)), "pt": [_ts(h) for h in points]})
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "iid": range(len(intervals)),
                "lo": [_ts(s) for s, _ in intervals],
                "hi": [_ts(s + ln) for s, ln in intervals],
            }
        )
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_bin_join(pts, iv, "pt", "lo", "hi", bucket="day").collect()
    )
    want = sorted(
        (p_i, i_i)
        for p_i, h in enumerate(points)
        for i_i, (s, ln) in enumerate(intervals)
        if s <= h < s + ln
    )
    assert got == want


@st.composite
def series_case(draw):
    # sparse observations: (hour, value); unique hours
    obs = draw(
        st.lists(
            st.tuples(st.integers(0, 30), st.integers(-100, 100)),
            min_size=1,
            max_size=10,
            unique_by=lambda t: t[0],
        )
    )
    return obs


@given(obs=series_case())
@settings(**_SETTINGS)
def test_interpolate_equals_pandas(spark, obs):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_type": "a",
                "ts": [_ts(h) for h, _ in obs],
                "value": [float(v) for _, v in obs],
            }
        )
    )
    out = (
        time_bucket_interpolate(df)
        .orderBy("bucket")
        .select("bucket", "observed", "value_interp")
        .toPandas()
    )
    hours = sorted(h for h, _ in obs)
    # dense grid from min..max observed hour
    assert len(out) == hours[-1] - hours[0] + 1
    ref = pd.Series(
        {h: float(v) for h, v in obs},
        index=range(hours[0], hours[-1] + 1),
        dtype="float64",
    ).interpolate(method="index", limit_direction="both")
    for row, h in zip(out.itertuples(index=False), range(hours[0], hours[-1] + 1)):
        assert row.observed == (h in dict(obs))
        assert row.value_interp == pytest.approx(ref[h], abs=1e-9)
