"""The capstone parity suite: the reference's OWN sqllogictest files
(/root/reference/test/sql/*.test) executed against this engine through
the corpus-pinned dialect translator (compat/slt.py). Every statement
and golden query block must pass."""

from __future__ import annotations

import glob
import os

import pytest

from duckdb_vortex_spark.compat.slt import run_slt_file

FILES = sorted(glob.glob("/root/reference/test/sql/*.test"))
SLOW = sorted(glob.glob("/root/reference/test/sql/*.test_slow"))


@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(f) for f in FILES])
def test_reference_slt(spark, tmp_path, path):
    res = run_slt_file(spark, path, str(tmp_path))
    assert res.ok, res.failures
    assert res.statements_ok + res.queries_ok > 0


@pytest.mark.parametrize("path", SLOW, ids=[os.path.basename(f) for f in SLOW])
def test_reference_slt_slow(spark, tmp_path, path):
    """The 40k-row tier (table.test_slow:2,50)."""
    res = run_slt_file(spark, path, str(tmp_path))
    assert res.ok, res.failures


def test_translator_rewrites():
    """The corpus-pinned dialect rewrites, unit-level."""
    from duckdb_vortex_spark.compat.slt import translate

    t = translate
    # inclusive generate_series → exclusive range, bare and aliased
    assert "range(0, 5)" in t("SELECT * from generate_series(0, 4)")
    assert "id AS seq" in t("SELECT seq FROM generate_series(1, 100) AS t(seq)")
    # timestamp precisions unify to NTZ; literals too
    out = t("CREATE TABLE x (a TIMESTAMP_S, b TIMESTAMP_MS, c TIMESTAMP, d TIMESTAMP_NS)")
    assert out.count("TIMESTAMP_NTZ") == 4
    assert "TIMESTAMP_NTZ '2025-01-01'" in t("SELECT TIMESTAMP '2025-01-01'")
    # interval constructors
    assert "make_interval(0, 0, 0, 0, 0, 0, n)" in t("SELECT ts + to_seconds(n)")
    assert "date_add(DATE '1992-03-22', n)" in t("SELECT DATE '1992-03-22' + to_days(n)")
    # sum over boolean comparison gets the int cast
    assert "sum(CAST(a = b AS INT))" in t("SELECT sum(a = b) FROM x")
    # unsigned + blob type mapping, trailing commas
    out = t("CREATE TABLE x (u UBIGINT, b BLOB,)")
    assert "DECIMAL(20,0)" in out and "BINARY" in out and ",)" not in out
