"""DDL/DML parity with the reference's pinned surface
(/root/reference/test/sql/table.test:8-53): CREATE TABLE with the full
type matrix, INSERT INTO ... SELECT from a generator, scan back, and
the INSERT-projection expressions of table.test:31-49 — run through
Spark SQL against a managed (spark-warehouse) table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def managed_table(spark, tmp_path):
    name = "t_type_matrix"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_create_insert_select_type_matrix(spark, managed_table):
    """CREATE TABLE (table.test:8-27 type list, Spark-mapped per
    SURVEY.md §1.2) + INSERT INTO ... SELECT over a range generator
    (table.test:30-50) + scan-back aggregation."""
    spark.sql(
        f"""
        CREATE TABLE {managed_table} (
          id_col BIGINT,
          bool_col BOOLEAN,
          tinyint_col TINYINT,
          smallint_col SMALLINT,
          int_col INT,
          bigint_col BIGINT,
          ubigint_col DECIMAL(20,0),
          float_col FLOAT,
          double_col DOUBLE,
          decimal_col DECIMAL(10,2),
          varchar_col STRING,
          date_col DATE,
          timestamp_col TIMESTAMP_NTZ,
          blob_col BINARY
        ) USING parquet
        """
    )
    spark.sql(
        f"""
        INSERT INTO {managed_table}
        SELECT
          seq                                   AS id_col,
          seq % 2 = 0                           AS bool_col,
          CAST(seq % 128 AS TINYINT)            AS tinyint_col,
          CAST(seq % 32768 AS SMALLINT)         AS smallint_col,
          CAST(seq AS INT)                      AS int_col,
          seq * 10                              AS bigint_col,
          CAST(seq * 10 AS DECIMAL(20,0))       AS ubigint_col,
          CAST(seq AS FLOAT) / 100.0            AS float_col,
          CAST(seq AS DOUBLE) / 1000.0          AS double_col,
          CAST(CAST(seq AS DECIMAL(10,2)) / 10.0 AS DECIMAL(10,2)) AS decimal_col,
          'Value ' || CAST(seq AS STRING)       AS varchar_col,
          DATE_ADD(DATE '1992-03-22', CAST(seq AS INT)) AS date_col,
          TIMESTAMP_NTZ '2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0, seq) AS timestamp_col,
          CAST('blob-' || CAST(seq AS STRING) AS BINARY) AS blob_col
        FROM (SELECT id + 1 AS seq FROM range(100))
        """
    )
    back = spark.table(managed_table)
    assert back.count() == 100
    agg = back.agg(
        F.sum("bigint_col"), F.count("varchar_col"), F.max("date_col")
    ).collect()[0]
    assert agg[0] == sum((i + 1) * 10 for i in range(100))
    assert agg[1] == 100
    # second INSERT appends (table.test INSERT is additive)
    spark.sql(
        f"INSERT INTO {managed_table} SELECT * FROM {managed_table} WHERE id_col <= 10"
    )
    assert spark.table(managed_table).count() == 110


def test_md5_concat_cast_expressions(spark):
    """table.test:43,49 expression parity: string concat of mixed
    types and md5 over a cast — checked against literal values."""
    row = spark.sql(
        """
        SELECT
          'Value ' || CAST(42 AS STRING) AS concat_val,
          md5(CAST('42' AS BINARY)) AS md5_val,
          CAST(CAST(7 AS DECIMAL(10,2)) / 10.0 AS DECIMAL(10,2)) AS dec_val
        """
    ).collect()[0]
    assert row.concat_val == "Value 42"
    import hashlib

    assert row.md5_val == hashlib.md5(b"42").hexdigest()
    from decimal import Decimal

    assert row.dec_val == Decimal("0.70")
