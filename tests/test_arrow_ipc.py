"""A16 Arrow exchange: lossless round-trips driver-side, via IPC
bytes, and executor-side (mapInArrow)."""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.sources.arrow_ipc import (
    from_arrow_table,
    from_ipc_bytes,
    map_arrow_batches,
    to_arrow_table,
    to_ipc_bytes,
)

from .conftest import SF_DIR


def test_arrow_table_roundtrip(spark):
    df = load(spark, SF_DIR, "nation")
    table = to_arrow_table(df)
    assert isinstance(table, pa.Table)
    back = from_arrow_table(spark, table)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_ipc_bytes_roundtrip(spark):
    df = load(spark, SF_DIR, "region")
    data = to_ipc_bytes(df)
    assert isinstance(data, bytes) and len(data) > 0
    back = from_ipc_bytes(spark, data)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_map_arrow_batches(spark):
    df = load(spark, SF_DIR, "supplier").select("s_suppkey", "s_acctbal")

    def double_bal(batches):
        import pyarrow.compute as pc

        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pc.multiply(b.column(1), pa.scalar(2.0))],
                names=["s_suppkey", "bal2"],
            )

    out = map_arrow_batches(df, double_bal, "s_suppkey long, bal2 double")
    joined = out.join(df, "s_suppkey")
    bad = joined.filter(
        F.abs(F.col("bal2") - 2 * F.col("s_acctbal")) > 1e-9
    ).count()
    assert bad == 0 and out.count() == df.count()
