"""AQE skew-join contract pins for the r12 skewed-replica leg
(VERDICT r11 next #2): the claim "the merge-pinned fact-fact plans
survive Zipfian keys via AQE skew-split" has two load-bearing engine
facts, pinned here on synthetics so a Spark upgrade that changes
either breaks CI, not the 100-TB story:

1. An INNER sort-merge join under a hot key DOES get split by
   OptimizeSkewedJoin once the hot partition crosses the byte
   thresholds — the q21/q12 family defense. (Locally the thresholds
   must be scaled far below the 256 MB default: map-output sizes are
   compressed, and sf-scale partitions are a few MB at most. The
   skew_replica_leg harness makes the same scaling argument for its
   tuned variant.)
2. A LEFT SEMI join can only split LEFT-side skew. Right-side (build
   side) skew is structurally un-splittable — duplicating the stream
   side against build fragments would duplicate semi matches — so
   q4-shaped plans (lineitem on the semi's right) rely on the sorted
   stream, not AQE, and extreme cases fall back to
   ``plans/skew.salted_aggregate`` downstream.

The markers asserted ("SortMergeJoin(skew=true)", "AQEShuffleRead
skewed") are the ones scripts/skew_replica_leg.py greps for — if the
plan text changes shape, this file and that harness fail together.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_vortex_spark.plans.lint import formatted_plan

# scaled-down skew thresholds (see module docstring point 1)
_TUNED = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(32 << 10),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(16 << 10),
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _tuned(spark):
    old = {k: spark.conf.get(k, None) for k in _TUNED}
    for k, v in _TUNED.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _hot(spark, n=400_000, pct_hot=90):
    """(k, v, pad) with pct_hot% of rows on k=0; the sha2 pad keeps
    the hot partition's map-output bytes incompressible so it crosses
    the scaled thresholds."""
    return spark.range(n).select(
        F.when(F.col("id") % 100 < pct_hot, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )


def _uniform(spark, n=400_000):
    return spark.range(n).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))


def _final_plan(df):
    """Run the query (small result) and return the FINAL adaptive plan
    of the same QueryExecution."""
    agg = df.groupBy().count()
    agg.collect()
    return formatted_plan(agg)


def test_inner_smj_skew_split_engages(spark):
    with _tuned(spark):
        j = _hot(spark).hint("merge").join(_uniform(spark), "k")
        plan = _final_plan(j)
    assert "skew=true" in plan and "skewed" in plan, plan[:2000]


def test_semi_join_right_side_skew_cannot_split(spark):
    """q4's shape: the skewed fact sits on the semi join's RIGHT
    (existence-set) side — Spark must NOT split it (splitting the
    build of a semi would duplicate stream matches). If an upgrade
    ever changes this, q4's skew defense should be re-derived."""
    with _tuned(spark):
        left = _uniform(spark)
        right = _hot(spark)
        j = left.hint("merge").join(
            right, left["k"] == right["k"], "left_semi"
        )
        plan = _final_plan(j)
    assert "SortMergeJoin" in plan and "LeftSemi" in plan
    assert "skew=true" not in plan, plan[:2000]


def test_semi_join_left_side_skew_does_split(spark):
    """The complementary direction: LEFT-side skew on a semi join is
    splittable, so a q4-shaped query with the skew on the PROBE side
    is still covered by AQE."""
    with _tuned(spark):
        left = _hot(spark)
        right = _uniform(spark)
        j = left.hint("merge").join(
            right, left["k"] == right["k"], "left_semi"
        )
        plan = _final_plan(j)
    assert "SortMergeJoin" in plan and "LeftSemi" in plan
    assert "skew=true" in plan, plan[:2000]


def test_window_counts_hot_isolated_matches_plain_window(spark):
    """r13 (VERDICT r12 next #6): the salted-window escape for the
    q21-class shape (same-key window consumers, where AQE's skew
    split is a net loss — the r12 leg measured the forced split's
    extra exchange at +34 %). `window_counts_hot_isolated` must be
    row-identical to the plain window on a hot-key distribution, its
    hot rows must ride a broadcast join (never key-shuffled), and an
    impossible threshold must degrade to exactly the plain window."""
    from duckdb_vortex_spark.plans.skew import window_counts_hot_isolated

    df = _hot(spark, n=100_000, pct_hot=60).withColumn(
        "late", (F.col("v") % 3 == 0).cast("int")
    )
    aggs = {"n": ("*", "count"), "nlate": ("late", "sum")}
    got = window_counts_hot_isolated(df, ["k"], aggs, hot_row_threshold=5_000)
    w = Window.partitionBy("k")
    want = df.withColumn("n", F.count("*").over(w)).withColumn(
        "nlate", F.sum("late").over(w)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the hot path is a broadcast attach: plan carries a broadcast
    # join and the plain window still exists for the cold keys
    plan = formatted_plan(got)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "Window" in plan
    # unreachable threshold -> everything cold -> still identical
    got_all_cold = window_counts_hot_isolated(
        df, ["k"], aggs, hot_row_threshold=1 << 40
    )
    assert (
        sorted(map(tuple, got_all_cold.collect()))
        == sorted(map(tuple, want.collect()))
    )
    with pytest.raises(ValueError):
        window_counts_hot_isolated(df, ["k"], {"x": ("v", "avg")}, 10)
    # the production path: hot keys known upfront (sampled upstream) —
    # totals computed only for them, same row-identical result
    got_known = window_counts_hot_isolated(
        df, ["k"], aggs, hot_row_threshold=0, hot_keys=[0]
    )
    assert (
        sorted(map(tuple, got_known.collect()))
        == sorted(map(tuple, want.collect()))
    )
    # the module's own motivating case — the NULL hot key (r13 review:
    # a plain name-equality attach join can never match NULL, which
    # would silently send every NULL-key row down the cold path as one
    # fat partition). Both detection and hot_keys=[None] must isolate
    # it, and results must still match the plain window.
    dfn = df.withColumn("k", F.when(F.col("k") == 0, F.lit(None)).otherwise(F.col("k")))
    wantn = dfn.withColumn("n", F.count("*").over(w)).withColumn(
        "nlate", F.sum("late").over(w)
    )
    gotn = window_counts_hot_isolated(dfn, ["k"], aggs, hot_row_threshold=5_000)
    rows_n = sorted(repr(tuple(r)) for r in gotn.collect())  # None-safe sort
    assert rows_n == sorted(repr(tuple(r)) for r in wantn.collect())
    gotn_known = window_counts_hot_isolated(
        dfn, ["k"], aggs, hot_row_threshold=0, hot_keys=[None]
    )
    assert sorted(repr(tuple(r)) for r in gotn_known.collect()) == rows_n
    # and the isolation actually happened: the attach join is
    # null-safe — Catalyst rewrites `a <=> b` equi-join keys into
    # (coalesce(a, ...), isnull(a)) pairs, so the NULL key matched
    # its totals row instead of falling to the cold path
    plan_n = formatted_plan(gotn)
    assert "<=>" in plan_n or "isnull(" in plan_n, plan_n[:2000]


def test_window_hot_isolation_spreads_exact_duplicate_rows(spark):
    """ADVICE r13 + r14: a hot key whose rows are EXACT duplicates
    must still be spreadable over n_salts sub-partitions — but the
    spread source must not silently make the shuffle's row→partition
    mapping nondeterministic (the r14 form's retry hazard). r15
    contract: the default salt is deterministic content hashing (a
    row id IN the data spreads under it with no parameter — the
    preferred escape); ``row_unique=True`` is the explicit opt-in for
    identity-less duplicates, since no deterministic per-row function
    can spread equal rows. Results are row-identical to the plain
    window in both modes (output never depends on salt values: hot
    rows take the broadcast totals)."""
    from duckdb_vortex_spark.plans.skew import (
        _content_salt,
        window_counts_hot_isolated,
    )

    # 50k copies of the SAME row (plus a row id variant) — the
    # pathological duplicate hot key
    df = spark.range(50_000).select(
        F.col("id").alias("rid"), F.lit(0).alias("k"), F.lit(7).alias("v")
    )
    salts = df.select(
        _content_salt(["rid", "k", "v"], 16).alias("s")
    ).distinct().count()
    assert salts == 16, "a row id in the data must spread under the default salt"
    salts_nd = df.select(
        _content_salt(["k", "v"], 16, row_unique=True).alias("s")
    ).distinct().count()
    assert salts_nd > 1, "row_unique opt-in must spread duplicate rows"

    for frame, kw in (
        (df, {}),  # row id present: default salt spreads
        (df.drop("rid"), {"row_unique": True}),  # identity-less opt-in
        (df.drop("rid"), {}),  # collapsed salt still gives right answers
    ):
        got = window_counts_hot_isolated(
            frame,
            ["k"],
            {"n": ("*", "count"), "sv": ("v", "sum")},
            hot_row_threshold=1_000,
            **kw,
        )
        rows = got.collect()
        assert len(rows) == 50_000
        assert all(r["n"] == 50_000 and r["sv"] == 350_000 for r in rows)


def test_window_hot_isolation_rejects_colliding_agg_names(spark):
    """ADVICE r13: an aggs output name that collides with an input
    column would duplicate that column in the final select — reject."""
    from duckdb_vortex_spark.plans.skew import window_counts_hot_isolated

    df = spark.range(10).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="collide"):
        window_counts_hot_isolated(df, ["k"], {"v": ("v", "sum")}, 5)
