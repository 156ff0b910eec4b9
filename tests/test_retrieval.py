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
    # every fused row came from at least one leg (rank 0 = absent)
    assert all(r["lex_rank"] > 0 or r["dense_rank"] > 0 for r in a)


def test_rrf_matches_python_referee_on_random_lists(spark):
    """Property: for random pairs of rank lists, hybrid_rrf equals an
    independent pure-Python RRF implementation (same quantization)."""
    import random

    rng = random.Random(7)
    for trial in range(5):
        ids = list(range(1, 30))
        rng.shuffle(ids)
        lex_ids = ids[: rng.randint(0, 12)]
        rng.shuffle(ids)
        den_ids = ids[: rng.randint(0, 12)]
        lex = [(i, r + 1) for r, i in enumerate(lex_ids)]
        den = [(i, r + 1) for r, i in enumerate(den_ids)]
        mu = lambda r: int(1_000_000 / (60 + r) + 0.5)
        want = {}
        for i, r in lex:
            want[i] = want.get(i, 0) + mu(r)
        for i, r in den:
            want[i] = want.get(i, 0) + mu(r)
        top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        schema = "doc_id bigint, rank bigint"
        got = hybrid_rrf(
            spark.createDataFrame(lex or [(0, 0)], schema).filter(F.col("rank") > 0),
            spark.createDataFrame(den or [(0, 0)], schema).filter(F.col("rank") > 0),
            k_final=10,
        ).collect()
        assert [(r["doc_id"], r["rrf_mu"]) for r in got] == top, f"trial {trial}"


def test_ann_tuning_curve_ivf_recall_monotone_in_n_probe(spark):
    """Semantic pin beyond the hash oracle: IVF recall@k is PROVABLY
    non-decreasing in n_probe — candidate sets are nested (probe sets
    grow) and scoring is exact cosine, so a true top-k hit can only be
    displaced by a higher-cosine candidate, which is itself a true
    top-k hit. (No such guarantee for IVF-PQ: ADC is approximate, a
    wrong high-scorer can displace a true one — deliberately not
    asserted.) Also pins the fixed query-set size across all configs."""
    from duckdb_vortex_spark.operators.retrieval import (
        retrieval_ann_tuning_curve,
    )

    rows = retrieval_ann_tuning_curve(spark, SF_DIR).collect()
    nq = {r["n_queries"] for r in rows}
    assert len(nq) == 1 and nq.pop() > 0
    ivf = {
        (r["k"], r["n_probe"]): r["recall_mu"]
        for r in rows
        if r["method"] == "ivf"
    }
    for k in (1, 10):
        seq = [ivf[(k, np_)] for np_ in (1, 2, 4)]
        assert seq == sorted(seq), f"IVF recall@{k} not monotone: {seq}"
        assert seq[-1] > 0, f"IVF recall@{k} zero at max probe"
