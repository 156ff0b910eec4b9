"""The central correctness gate, run locally: every catalog entry with
an oracle is executed on Spark AND DuckDB over the same parquet tables
and compared exactly (driver-gate semantics, see conftest)."""

from __future__ import annotations

import pytest

from duckdb_vortex_spark import catalog

from .conftest import SF_DIR, assert_matches_oracle

ENTRIES = catalog.entries()


@pytest.mark.parametrize("name", sorted(ENTRIES))
def test_catalog_entry(name, spark, oracle):
    e = ENTRIES[name]
    df = e.builder(spark, SF_DIR)
    if e.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors driver's weak gate
    else:
        assert_matches_oracle(df, oracle, e.oracle, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as se

    qs, os_ = se.queries(), se.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
