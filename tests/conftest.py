"""Shared fixtures: one SparkSession per test run + the DuckDB oracle.

The oracle comparison reproduces the driver's gate semantics
(row-count + column names + order-insensitive canonical value match)
so a green local suite predicts a green CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from duckdb_vortex_spark.catalog import TABLES
from duckdb_vortex_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dvs-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        # repr round-trips doubles exactly; both engines emit float64
        return repr(float(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonicalize(pdf: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    """Sort columns by name, values to canonical strings, sort rows."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        tuple(_canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return list(pdf.columns), rows


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    spark_pdf = spark_df.toPandas()
    duck_pdf = con.execute(sql).fetchdf()
    s_cols, s_rows = canonicalize(spark_pdf)
    d_cols, d_rows = canonicalize(duck_pdf)
    assert s_cols == d_cols, f"[{name}] column mismatch: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ][:5]
        raise AssertionError(f"[{name}] value mismatch, first diffs: {diffs}")
