"""A17 geometry helpers: WKB point round-trip + shapely-free WKB
byte-layout validation."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.functions.geo import wkb_point, wkb_point_xy

from .conftest import SF_DIR


def test_wkb_point_roundtrip(spark):
    s = load(spark, SF_DIR, "supplier").select(
        "s_suppkey",
        F.col("s_acctbal").cast("double").alias("x"),
        (F.col("s_nationkey") * 1.5).cast("double").alias("y"),
    )
    enc = s.select("s_suppkey", "x", "y", wkb_point("x", "y").alias("g"))
    dec = enc.select("s_suppkey", "x", "y", wkb_point_xy("g").alias("p"))
    bad = dec.filter(
        (F.col("p.x") != F.col("x")) | (F.col("p.y") != F.col("y"))
    ).count()
    assert bad == 0


def test_wkb_bytes_are_standard(spark):
    row = (
        spark.createDataFrame([(3.5, -7.25)], ["x", "y"])
        .select(wkb_point("x", "y").alias("g"))
        .collect()[0]
    )
    g = bytes(row.g)
    # standard little-endian WKB point: 0x01, type=1, then 2 doubles
    assert g[0] == 1
    assert struct.unpack("<I", g[1:5])[0] == 1
    assert struct.unpack("<d", g[5:13])[0] == 3.5
    assert struct.unpack("<d", g[13:21])[0] == -7.25


def test_geohash_classic_vector(spark):
    """The canonical geohash test point (57.64911N, 10.40744E) encodes
    to u4pruy... in every published implementation; pin our shift/mask
    form to it in BOTH dialects."""
    import duckdb

    from duckdb_vortex_spark.functions.geo import _geohash_sql

    spark_val = spark.range(1).selectExpr(
        f"{_geohash_sql('10.40744', '57.64911', True)} AS gh"
    ).collect()[0]["gh"]
    duck_val = duckdb.connect().execute(
        f"SELECT {_geohash_sql('10.40744', '57.64911', False)}"
    ).fetchone()[0]
    assert spark_val == duck_val == "u4pruy"
