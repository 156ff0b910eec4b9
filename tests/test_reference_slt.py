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
