"""Geometry column support (SURVEY.md §2A row A17 — peripheral).

The reference engine carries WKB geometry arrays via the ``vortex-geo``
crate (Cargo.lock:4223,4346-4367); no SQL surface is pinned by its
tests. Parity here is the storage convention + a couple of scalar
helpers:

- geometry at rest is **WKB in a BinaryType column** (the same
  convention Spark's ecosystem uses, e.g. GeoParquet);
- ``wkb_point`` / ``wkb_point_xy`` encode/decode little-endian WKB
  2-D points as vectorized Arrow-batched pandas UDFs (numpy struct
  packing — no per-row Python);
- planar ``st_distance`` / ``st_within_bbox`` are pure column math
  over (x, y) pairs, whole-stage-codegen'd, usable after decode.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, DoubleType, StructField, StructType

from ..catalog import load, query

_WKB_POINT_LE = b"\x01\x01\x00\x00\x00"  # little-endian, geometry type 1

# DataType objects (not DDL strings): string return types are parsed
# through the active session, which doesn't exist at import time.
_XY_TYPE = StructType([StructField("x", DoubleType()), StructField("y", DoubleType())])


@pandas_udf(BinaryType())
def wkb_point(x: pd.Series, y: pd.Series) -> pd.Series:
    """Encode (x, y) doubles as WKB 2-D points (vectorized)."""
    import numpy as np

    xs = np.asarray(x, dtype="<f8").tobytes()
    ys = np.asarray(y, dtype="<f8").tobytes()
    return pd.Series(
        [_WKB_POINT_LE + xs[i * 8 : i * 8 + 8] + ys[i * 8 : i * 8 + 8] for i in range(len(x))],
        dtype=object,
    )


@pandas_udf(_XY_TYPE)
def wkb_point_xy(wkb: pd.Series) -> pd.DataFrame:
    """Decode WKB 2-D points back to (x, y) (vectorized; raises on
    non-point geometries rather than guessing)."""
    import numpy as np

    buf = b"".join(wkb)
    n = len(wkb)
    if any(len(b) != 21 or b[:5] != _WKB_POINT_LE for b in wkb):
        raise ValueError("wkb_point_xy supports little-endian 2-D WKB points only")
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, 21)
    xs = arr[:, 5:13].copy().view("<f8").ravel()
    ys = arr[:, 13:21].copy().view("<f8").ravel()
    return pd.DataFrame({"x": xs, "y": ys})


def st_distance(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Planar euclidean distance."""
    return F.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))


def st_within_bbox(x: Column, y: Column, xmin, ymin, xmax, ymax) -> Column:
    return (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)


GEO_ORACLE = """
SELECT
  s_suppkey,
  CAST(round(sqrt(CAST(s_acctbal AS DOUBLE) * CAST(s_acctbal AS DOUBLE)
       + CAST(s_nationkey * 100 AS DOUBLE) * CAST(s_nationkey * 100 AS DOUBLE)), 6) AS DOUBLE)
    AS dist_origin,
  (CAST(s_acctbal AS DOUBLE) BETWEEN 0 AND 5000)
    AND (CAST(s_nationkey * 100 AS DOUBLE) BETWEEN 0 AND 1500) AS in_bbox
FROM supplier
"""


@query("geo_point_distance_bbox", oracle=GEO_ORACLE, tags=("geo",))
def geo_point_distance_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planar distance + bbox membership over synthetic (x, y) points
    derived from supplier columns; the WKB encode/decode pair is
    exercised in pytest (driver gate keeps scalar-only columns)."""
    s = load(spark, sf_dir, "supplier")
    x = F.col("s_acctbal").cast("double")
    y = (F.col("s_nationkey") * 100).cast("double")
    return s.select(
        "s_suppkey",
        F.round(st_distance(x, y, F.lit(0.0), F.lit(0.0)), 6).alias("dist_origin"),
        st_within_bbox(x, y, 0.0, 0.0, 5000.0, 1500.0).alias("in_bbox"),
    )


RADIUS_ORACLE = """
WITH pts AS (
  SELECT s_suppkey AS id,
         CAST(s_suppkey % 97 AS BIGINT) AS x,
         CAST(s_suppkey % 89 AS BIGINT) AS y
  FROM supplier
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
FROM pts a
JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 25
"""


@query("geo_points_within_radius", oracle=RADIUS_ORACLE, tags=("geo", "join"))
def geo_points_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join: point pairs within planar distance 5, compared
    on SQUARED distance (no sqrt — exact integer arithmetic on the
    synthetic grid, and the standard trick for avoiding fp comparisons
    in range predicates).

    Executed as a grid-cell bucket join, the scale shape (identical
    candidate→verify structure to the LSH dedup path): each point has
    one home cell of side r; the probe side explodes to its 3×3
    neighborhood, the build side keeps its single home cell, and the
    join is a plain equi join on the cell key. |Δx|,|Δy| ≤ r implies
    the cells differ by at most 1, so the neighborhood is a complete
    candidate set; the build cell being unique and the 9 probe cells
    distinct means each qualifying pair is produced EXACTLY once — no
    dedup, no BroadcastNestedLoopJoin (plan-linted catalog-wide)."""
    r = 5
    s = load(spark, sf_dir, "supplier")
    pts = s.select(
        F.col("s_suppkey").alias("id"),
        (F.col("s_suppkey") % 97).cast("bigint").alias("x"),
        (F.col("s_suppkey") % 89).cast("bigint").alias("y"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(offsets).alias("o"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.floor(F.col("xa") / r) + F.col("o.dx")).alias("cx"),
        (F.floor(F.col("ya") / r) + F.col("o.dy")).alias("cy"),
    )
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.floor(F.col("x") / r).alias("cx"),
        F.floor(F.col("y") / r).alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, ["cx", "cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= r * r))
        .select("id_a", "id_b", d2.cast("bigint").alias("dist2"))
    )


_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_sql(lon: str, lat: str, spark_dialect: bool) -> str:
    """Build the geohash-6 expression (30 interleaved bits, lon first,
    base32 chars) in either engine's SQL dialect — identical structure
    and arithmetic, only the shift spelling differs (Spark:
    shiftright(); DuckDB: >>). One SQL string per side keeps plan
    construction O(1) py4j calls (the PQ plan-construction lesson)."""
    lon_q = f"LEAST(CAST(floor(({lon} + 180.0) / 360.0 * 32768.0) AS BIGINT), 32767)"
    lat_q = f"LEAST(CAST(floor(({lat} + 90.0) / 180.0 * 32768.0) AS BIGINT), 32767)"

    def shr(x: str, n: int) -> str:
        return f"shiftright({x}, {n})" if spark_dialect else f"({x} >> {n})"

    terms = []
    for i in range(15):
        terms.append(f"({shr(lon_q, 14 - i)} & 1) * {1 << (29 - 2 * i)}")
        terms.append(f"({shr(lat_q, 14 - i)} & 1) * {1 << (28 - 2 * i)}")
    z = "(" + " + ".join(terms) + ")"
    chars = [
        f"substring('{_GH32}', CAST(({shr(z, 25 - 5 * k)} & 31) AS INT) + 1, 1)"
        for k in range(6)
    ]
    if spark_dialect:
        return "concat(" + ", ".join(chars) + ")"
    return " || ".join(chars)


_GH_LON = "(CAST(s_suppkey % 3600 AS DOUBLE) / 10.0 - 180.0)"
_GH_LAT = "(CAST(s_suppkey % 1737 AS DOUBLE) / 10.0 - 86.8)"

GEOHASH_ORACLE = f"""
WITH pts AS (
  SELECT s_suppkey,
         {_GH_LON} AS lon,
         {_GH_LAT} AS lat,
         {_geohash_sql(_GH_LON, _GH_LAT, spark_dialect=False)} AS geohash6
  FROM supplier
)
SELECT s_suppkey, lon, lat, geohash6,
       substring(geohash6, 1, 4) AS geohash4,
       COUNT(*) OVER (PARTITION BY substring(geohash6, 1, 4)) AS n_in_cell4
FROM pts
"""


@query("geo_geohash_cells", oracle=GEOHASH_ORACLE, tags=("geo", "window"))
def geo_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding (Niemeyer's public-domain scheme: interleave
    lon/lat bits MSB-first, lon first, base32 without a/i/l/o) as pure
    shift/mask column algebra — 30 bits → 6 characters, pinned against
    the classic u4pruy test vector in pytest. Cell-prefix counts show
    the spatial-bucketing use: geohash prefixes ARE the grid keys for
    spatial joins/aggregation (the proximity-join shape of
    geo_points_within_radius, but with a portable string key that
    range-partitions and prefix-prunes in any store).

    Scale: encoding is map-side only; the cell count is one shuffle on
    the 4-char prefix — at 100 TB the same expression computes inside
    the scan and feeds write_partitioned(geohash4) so spatial
    predicates prune directories before any footer I/O."""
    s = load(spark, sf_dir, "supplier")
    gh = F.expr(_geohash_sql(_GH_LON, _GH_LAT, spark_dialect=True))
    pts = s.select(
        "s_suppkey",
        F.expr(_GH_LON).alias("lon"),
        F.expr(_GH_LAT).alias("lat"),
        gh.alias("geohash6"),
    )
    from pyspark.sql import Window as W

    gh4 = F.substring("geohash6", 1, 4)
    return pts.select(
        "s_suppkey", "lon", "lat", "geohash6",
        gh4.alias("geohash4"),
        F.count("*").over(W.partitionBy(gh4)).alias("n_in_cell4"),
    )


# --- point in polygon -----------------------------------------------------

# Closed non-convex ring on the same synthetic integer grid as the
# radius entry; consecutive vertex pairs are the edge list (no
# horizontal edges, but the half-open crossing rule handles them
# anyway). One Python literal generates BOTH dialects' edge tables.
_POLY = [(10, 10), (80, 20), (60, 40), (80, 70), (30, 80), (20, 40)]
_EDGES = list(zip(_POLY, _POLY[1:] + _POLY[:1]))

_EDGE_VALUES = ", ".join(f"({x1}, {y1}, {x2}, {y2})" for (x1, y1), (x2, y2) in _EDGES)

PIP_ORACLE = f"""
WITH pts AS (
  SELECT s_suppkey AS id,
         CAST(s_suppkey % 97 AS BIGINT) AS px,
         CAST(s_suppkey % 89 AS BIGINT) AS py
  FROM supplier
), edges(x1, y1, x2, y2) AS (
  VALUES {_EDGE_VALUES}
), c AS (
  SELECT p.id,
    CAST(COUNT(*) FILTER (WHERE ((e.y1 > p.py) != (e.y2 > p.py))
      AND ((e.x1 - p.px) * (e.y2 - e.y1) + (p.py - e.y1) * (e.x2 - e.x1))
          * (e.y2 - e.y1) > 0) AS BIGINT) AS n_cross
  FROM pts p CROSS JOIN edges e
  GROUP BY p.id
)
SELECT id, n_cross, (n_cross % 2 = 1) AS inside FROM c
"""


@query("geo_point_in_polygon", oracle=PIP_ORACLE, tags=("geo",))
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon by ray casting against a fixed non-convex ring
    — the membership predicate behind geofencing and spatial joins,
    completing the geo family (distance, bbox, radius join, geohash
    cells).

    Exactness: the crossing test is division-free — "px left of the
    edge at height py" is evaluated cross-multiplied,
    ((x1−px)(y2−y1) + (py−y1)(x2−x1))·(y2−y1) > 0, so membership is
    pure BIGINT sign arithmetic on the integer grid: identical across
    engines, no epsilon, no float ray. The half-open rule
    (y1>py) ≠ (y2>py) counts each vertex crossing exactly once and
    skips horizontal edges.

    Scale: the polygon is a 6-row LITERAL exploded per point (no join
    in the Spark plan at all — a polygon table would broadcast); work
    is O(points · edges) map-side with one point-key aggregate. For
    many-polygon workloads the same predicate runs after a
    geohash-cell candidate join (geo_geohash_cells is the bucket
    key)."""
    s = load(spark, sf_dir, "supplier")
    pts = s.select(
        F.col("s_suppkey").alias("id"),
        (F.col("s_suppkey") % 97).cast("bigint").alias("px"),
        (F.col("s_suppkey") % 89).cast("bigint").alias("py"),
    )
    edge_arr = F.array(
        *[
            F.struct(
                F.lit(x1).alias("x1"),
                F.lit(y1).alias("y1"),
                F.lit(x2).alias("x2"),
                F.lit(y2).alias("y2"),
            )
            for (x1, y1), (x2, y2) in _EDGES
        ]
    )
    e = pts.select("id", "px", "py", F.explode(edge_arr).alias("e")).select(
        "id", "px", "py", "e.x1", "e.y1", "e.x2", "e.y2"
    )
    t = (F.col("x1") - F.col("px")) * (F.col("y2") - F.col("y1")) + (
        F.col("py") - F.col("y1")
    ) * (F.col("x2") - F.col("x1"))
    crossing = (
        (F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py"))
    ) & (t * (F.col("y2") - F.col("y1")) > 0)
    c = e.groupBy("id").agg(
        F.count(F.when(crossing, 1)).cast("bigint").alias("n_cross")
    )
    return c.select("id", "n_cross", (F.col("n_cross") % 2 == 1).alias("inside"))
