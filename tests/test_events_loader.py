"""Pin BOTH vintages of the events.ts loader normalization
(catalog.load, VERDICT r2 item 9): round-1 testdata shipped
TIMESTAMP(NANOS), round-2 regenerated as TIMESTAMP(MICROS) NTZ. The
on-disk schema drives the branch, so both must stay covered even
though only one vintage is present in /root/testdata at a time.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from duckdb_vortex_spark import catalog


def _write_events(tmp_path, ts_array):
    table = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11], type=pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], type=pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))


# one µs past the epoch second, plus sub-µs nanos that DuckDB truncates
_NS = [1_704_067_200_000_000_789, 1_704_067_201_500_001_999]
_EXPECT_US = [1_704_067_200_000_000, 1_704_067_201_500_001]


def test_nanos_branch_truncates_to_micros(spark, tmp_path):
    """NANOS parquet: read as long (legacy conf), integer-DIV to µs —
    DuckDB's silent ns→µs truncation semantics, exactly."""
    _write_events(tmp_path, pa.array(_NS, type=pa.timestamp("ns")))
    df = catalog.load(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = sorted(r.ts for r in df.select("ts").collect())
    want = [
        datetime.datetime.fromtimestamp(us / 1e6, tz=datetime.timezone.utc).replace(
            tzinfo=None
        )
        for us in _EXPECT_US
    ]
    # pinned-UTC session: naive datetimes are UTC wall clock
    assert [t.replace(tzinfo=None) for t in got] == want


def test_micros_ntz_branch_casts_to_timestamp(spark, tmp_path):
    """MICROS (no tz) parquet: Spark surfaces TIMESTAMP_NTZ; the
    loader casts to TimestampType under the pinned-UTC session."""
    _write_events(
        tmp_path, pa.array(_EXPECT_US, type=pa.timestamp("us"))
    )
    df = catalog.load(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert df.count() == 2


def test_micros_utc_branch_passthrough(spark, tmp_path):
    """MICROS with UTC tz: already TimestampType — loader must not
    touch it (the identity branch)."""
    _write_events(
        tmp_path, pa.array(_EXPECT_US, type=pa.timestamp("us", tz="UTC"))
    )
    df = catalog.load(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got[0].replace(tzinfo=None) == datetime.datetime(2024, 1, 1, 0, 0, 0)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_vintages_agree_after_normalization(spark, tmp_path, unit):
    """Both vintages of the same instant normalize to identical µs
    timestamps — the invariant every downstream catalog entry relies
    on."""
    arr = (
        pa.array(_NS, type=pa.timestamp("ns"))
        if unit == "ns"
        else pa.array(_EXPECT_US, type=pa.timestamp("us"))
    )
    d = tmp_path / unit
    d.mkdir()
    _write_events(d, arr)
    df = catalog.load(spark, str(d), "events")
    got = sorted(
        r.us for r in df.selectExpr("unix_micros(ts) AS us").collect()
    )
    assert got == _EXPECT_US
