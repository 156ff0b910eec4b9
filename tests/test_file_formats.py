"""CSV / JSON readers (SURVEY.md §2B "parquet/csv/json readers" — the
DuckDB built-ins the reference product ships with): typed round-trips
through Spark's native sources, with schema inference and explicit
schemas."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load

from .conftest import SF_DIR


def _nation_subset(spark):
    return load(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def test_csv_roundtrip(spark, tmp_path):
    df = _nation_subset(spark)
    path = str(tmp_path / "nation_csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .schema(df.schema)
        .csv(path)
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_schema_inference(spark, tmp_path):
    df = _nation_subset(spark)
    path = str(tmp_path / "nation_csv_inf")
    df.write.mode("overwrite").option("header", True).csv(path)
    inferred = spark.read.option("header", True).option("inferSchema", True).csv(path)
    # inference picks the narrowest integer type that fits the data
    assert [f.dataType.simpleString() for f in inferred.schema.fields] == [
        "int", "string", "int",
    ]
    assert inferred.count() == df.count()


def test_json_roundtrip_with_nested(spark, tmp_path):
    df = _nation_subset(spark).select(
        "n_nationkey",
        F.struct("n_name", "n_regionkey").alias("info"),
        F.array("n_regionkey", F.lit(99)).alias("tags"),
    )
    path = str(tmp_path / "nation_json")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(df.schema).json(path)
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


def test_jsonl_lines_semantics(spark, tmp_path):
    """Spark's json source is JSONL (one object per line) — the same
    lines DuckDB's read_json_auto consumes; cross-checked via duckdb."""
    import duckdb
    import glob

    df = _nation_subset(spark)
    path = str(tmp_path / "nation_jsonl")
    df.coalesce(1).write.mode("overwrite").json(path)
    files = glob.glob(f"{path}/part-*.json")
    got = duckdb.sql(
        f"SELECT n_nationkey, n_name, n_regionkey FROM read_json_auto('{files[0]}') ORDER BY n_nationkey"
    ).fetchall()
    want = [tuple(r) for r in df.orderBy("n_nationkey").collect()]
    assert got == want
