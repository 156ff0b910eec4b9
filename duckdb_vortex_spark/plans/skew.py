"""Skew-handling utilities for 100 TB-scale shuffles (SURVEY.md §2C
scale design; BASELINE.json north-star "design every operator for
100 TB scale").

Spark's AQE skew-join handling (enabled in session.py) splits
oversized partitions at runtime, but two patterns still need explicit
salting at extreme skew — a groupBy where one key holds >1 executor's
worth of rows, and a join against a dimension where one foreign key
dominates (the classic "null key" / "default value" hot spot):

- ``salted_aggregate``: two-phase aggregation. Phase 1 shuffles on
  (key, salt) spreading the hot key over ``n_salts`` reducers; phase 2
  combines the per-salt partials (tiny shuffle: n_salts rows per key).
  Works for any algebraic aggregate (sum/count/min/max; avg = sum+count
  combined at the end).
- ``salted_broadcast_left``: replicate-and-salt equi-join — the big
  side gets a random salt, the small side is exploded ``n_salts``×,
  then a plain equi-join on (key, salt) never concentrates a hot key
  in one task. Only sensible when the small side fits ``n_salts``×
  in memory; for larger dims prefer AQE.

Salting discipline (r15, ADVICE r14): every salt that feeds a shuffle
is DETERMINISTIC by default — pure row content (xxhash64 % n), so a
retried or speculative map task re-derives the same salt and the
shuffle's row→partition mapping is stable. The r14 design mixed
``monotonically_increasing_id()`` into the salt wherever the output
is salt-value-independent, reasoning that SPARK-23207's
indeterminate-stage rollback covers the nondeterminism — but that
rollback only protects stages Spark actually MARKS indeterminate
(round-robin repartition/sort); nondeterministic SQL expressions
feeding hash partitioning are not reliably flagged, so a map-task
retry after a fetch failure could re-salt rows into different reduce
partitions and duplicate or drop rows. Logical salt-invariance of the
OUTPUT does not cover that retry row loss.

The deterministic default has one documented gap: a hot key whose
rows are EXACT duplicates across every column collapses onto ONE
salt, and the fat partition survives (ADVICE r13). That gap is
FUNDAMENTAL, not an implementation choice: any deterministic per-row
function assigns equal rows equal salts — "hash a unique id column"
only helps when such a column exists, and then the rows aren't
byte-identical and the default content salt (which hashes every
column) already spreads them. The real escapes, in preference order:

1. Give rows identity upstream: a stored surrogate key / row id in
   the data itself. The default content salt then spreads with no
   extra parameter — this is the production answer (at 100 TB, rows
   without identity are a lineage problem before they are a skew
   problem).
2. ``row_unique=True``: explicit opt-in mixing
   ``monotonically_increasing_id()`` (partition id + per-partition
   counter). Retry-stable in practice when the salted frame derives
   from deterministic lineage — a straight file scan with no
   preceding shuffle re-reads the same split in the same order on
   retry — and hazardous when a shuffle precedes it (reduce-input
   arrival order varies across attempts). The caller owns that
   lineage judgment; checkpointing the salted frame before the
   shuffle removes the hazard at the cost of a materialization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_salt(
    cols: Sequence[str], n_salts: int, row_unique: bool = False
) -> Column:
    """Salt in [0, n_salts). Content-derived (xxhash64 of ``cols``) by
    default — deterministic under task retry, the property every
    shuffle-feeding salt needs (module docstring, ADVICE r14).

    ``row_unique=True`` is the explicit opt-in for spreading
    BYTE-IDENTICAL rows (no deterministic per-row function can — equal
    inputs hash equal): mixes ``monotonically_increasing_id()``, whose
    retry stability is a property of the frame's lineage, not of the
    expression — see the module docstring's escape #2 for when that
    is safe."""
    parts: list[Column] = [F.col(c) for c in cols]
    if row_unique:
        parts.append(F.monotonically_increasing_id())
    return F.pmod(F.xxhash64(*parts), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase salted groupBy.

    ``aggs`` maps output column → (input column, fn) with fn in
    {"sum", "count", "min", "max"}. The phase-1 partial and phase-2
    combiner are derived per fn (count combines with sum).
    ``salt_source_cols`` defaults to all non-group columns used by the
    aggregates — any per-row-varying column works.
    """
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    combine_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    bad = [fn for _, (_, fn) in aggs.items() if fn not in partial_fns]
    if bad:
        raise ValueError(f"unsupported salted aggregate fns: {bad}")

    salt_cols = salt_source_cols or sorted({c for _, (c, _) in aggs.items()})
    salted = df.withColumn("__salt", _content_salt(salt_cols, n_salts))
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[partial_fns[fn](c).alias(out) for out, (c, fn) in aggs.items()]
    )
    return phase1.groupBy(*group_cols).agg(
        *[combine_fns[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    row_unique: bool = False,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` with the big side salted and the
    small side replicated n_salts×, so a hot join key spreads across
    ``n_salts`` tasks instead of one.

    ``how`` is validated: only join types whose semantics live
    entirely on the BIG side are legal. Each big row carries exactly
    one salt, so inner/left(_outer)/left_semi/left_anti against the
    replicated small side are row-identical to the unsalted join. For
    ``right``/``full`` the construction is WRONG by n_salts−1 spurious
    null-extended clones per small-side row (every replicated salt the
    big row does NOT carry goes unmatched) — VERDICT r13 wrong #1 —
    so those raise instead of silently returning garbage. If you need
    a right/full salted join, swap the sides (right ≡ left flipped)
    or use AQE skew handling.

    Salt source (r15, ADVICE r14): content-hash of the big side's
    columns — deterministic under task retry, and already
    duplicate-spreading whenever any column (a key, a row id) varies
    per row. Byte-identical hot rows need ``row_unique=True`` (no
    deterministic per-row function can spread equal rows); its retry
    caveat and the preferred upstream-row-id alternative are in the
    module docstring."""
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "semi", "left_semi", "leftsemi",
        "anti", "left_anti", "leftanti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_broadcast_left cannot honor how={how!r}: the small "
            "side is replicated n_salts x, so right/full joins emit "
            "n_salts-1 spurious null-extended rows per small-side row. "
            f"Allowed: {sorted(allowed)}. For right/full, flip the sides "
            "(big must be the left/preserved side) or rely on AQE."
        )
    # The salt is deterministic by default (r15, ADVICE r14 — see the
    # module docstring's retry argument; the r14 form mixed a
    # nondeterministic id unconditionally). The small side is
    # replicated across ALL salts, so any salt value joins identically;
    # the default's one gap is a hot key of BYTE-IDENTICAL rows
    # collapsing onto one salt — the explicit row_unique=True opt-in
    # (or an upstream row id, which makes the default spread) escapes.
    big_salt_src = [c for c in big.columns]
    big_s = big.withColumn(
        "__salt", _content_salt(big_salt_src, n_salts, row_unique=row_unique)
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")


def window_counts_hot_isolated(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    hot_row_threshold: int,
    n_salts: int = 16,
    hot_keys: list | None = None,
    row_unique: bool = False,
) -> DataFrame:
    """Aggregate-valued window (``fn(x) OVER (PARTITION BY key)``
    attached to every row) with HOT KEYS isolated — the salted-window
    escape for the q21-class shape (VERDICT r12 next #6).

    The r12 skew leg pinned the dilemma: same-key window consumers
    cannot take AQE's skew-split (splitting the hot partition breaks
    the clustering the window needs; a forced split inserts a full
    extra exchange — measured 1.57 → 2.10 s), so the default plan
    absorbs one fat task. That holds while the fat task's share of
    the critical path is small; past it, THIS is the escape:

    1. per-key row counts + partials computed grouped by
       ``(key, salt)``, combined per key in a second tiny aggregate
       (n_salts rows/key). Map-side partial aggregation already
       defuses most of the hot key's reduce-side mass for these
       algebraic fns; the salt is the guard for the paths where the
       combiner can't help (partial-agg disabled, or a future
       non-algebraic fn routed here) and costs one n_salts-rows/key
       combine.
    2. keys with ≥ ``hot_row_threshold`` rows — BY DEFINITION few
       (at most total_rows/threshold of them, each one executor-class
       or larger) — have their finished totals broadcast and
       null-safe-attached to every row (a broadcast LEFT join, so the
       classic NULL hot key is isolated too).
    3. ONE window over partition key ``(key, hot ? salt : 0)``: cold
       keys keep their full partition; hot keys' rows spread over
       ``n_salts`` sub-partitions, so the window sort has no fat
       task, and their (deliberately wrong) split-window values are
       discarded in favor of the broadcast totals by a hot-flag
       ``when``.

    Results are row-identical to the plain window (pinned in
    tests/test_skew_aqe.py). Price — the minimum for this shape, two
    passes over ``df`` (r13 A/B: the first cut used a hot/cold
    union of two consumers plus an anti-join = THREE passes; this
    form cut the salt arm's wall ~35 %): one pass computes the hot
    keys' totals, one pass attaches them and windows. Crossover vs absorb
    measured in SCALE.md (r13 salted-window leg): plain absorb rides
    the join's key clustering with ZERO extra exchange, so salt only
    wins when the fat task's critical-path share exceeds a full extra
    pass + exchange of the data. ``aggs`` maps output column →
    (input column, fn), fn ∈ {"sum", "count", "min", "max"} — the
    algebraic window functions, same contract as
    :func:`salted_aggregate`.

    Salt source (r15, ADVICE r14): deterministic content hash of all
    columns — already duplicate-spreading whenever any column varies
    per row. Byte-identical hot rows need ``row_unique=True`` (no
    deterministic per-row function can spread equal rows); retry
    caveat and the preferred upstream-row-id alternative in the
    module docstring.
    """
    from pyspark.sql import Window

    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    combine_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    window_fns = partial_fns  # window form of an algebraic fn = its partial
    bad = [fn for _, (_, fn) in aggs.items() if fn not in partial_fns]
    if bad:
        raise ValueError(f"unsupported window fns: {bad}")
    clash = sorted(set(aggs) & set(df.columns))
    if clash:
        # out_cols below would select the name twice (the input column
        # AND the window output), yielding a duplicate-named frame that
        # breaks any downstream select-by-name — reject loudly (ADVICE r13)
        raise ValueError(
            f"agg output name(s) {clash} collide with input columns; "
            "rename the outputs"
        )
    out_cols = [*df.columns, *aggs.keys()]
    salt_src = sorted({c for _, (c, _) in aggs.items() if c != "*"} | set(df.columns))
    # Deterministic content salt by default (r15, ADVICE r14): hashing
    # every column spreads a hot key as soon as ANY column varies per
    # row. The one gap — a hot key of byte-identical rows collapsing
    # onto one salt (ADVICE r13) — escapes via the explicit
    # row_unique=True opt-in (or an upstream row id, which makes the
    # default spread); the retry semantics are in the module docstring.
    salted = df.withColumn(
        "__salt", _content_salt(salt_src, n_salts, row_unique=row_unique)
    )
    if hot_keys is not None:
        # caller knows the hot keys (sampled upstream, or operational
        # knowledge — the production path: at scale you do NOT want a
        # full-key-space aggregate just to find the handful of hot
        # keys). Exact totals are computed only for those keys: the
        # filter is map-side (isin over a literal list), nothing cold
        # is shuffled. Single-column keys only — the common case.
        if len(key_cols) != 1:
            raise ValueError("hot_keys= supports single-column keys")
        # isin() can never match NULL — the classic "null key" hot
        # spot this module opens with; a None in hot_keys means
        # "isolate the NULL-key rows" and needs the explicit isNull
        vals = [v for v in hot_keys if v is not None]
        pred = F.col(key_cols[0]).isin(vals) if vals else F.lit(False)
        if any(v is None for v in hot_keys):
            pred = pred | F.col(key_cols[0]).isNull()
        hot_totals = (
            df.filter(pred)
            .groupBy(*key_cols)
            .agg(
                *[
                    partial_fns[fn](c).alias(f"__hot_{out}")
                    for out, (c, fn) in aggs.items()
                ]
            )
            .select(
                *key_cols,
                F.lit(True).alias("__is_hot"),
                *[f"__hot_{o}" for o in aggs],
            )
        )
    else:
        phase1 = salted.groupBy(*key_cols, "__salt").agg(
            F.count("*").alias("__n"),
            *[
                partial_fns[fn](c).alias(f"__hot_{out}")
                for out, (c, fn) in aggs.items()
            ],
        )
        hot_totals = (
            phase1.groupBy(*key_cols)
            .agg(
                F.sum("__n").alias("__n"),
                *[
                    combine_fns[fn](f"__hot_{out}").alias(f"__hot_{out}")
                    for out, (_, fn) in aggs.items()
                ],
            )
            .filter(F.col("__n") >= hot_row_threshold)
            .select(
                *key_cols,
                F.lit(True).alias("__is_hot"),
                *[f"__hot_{o}" for o in aggs],
            )
        )
    # eqNullSafe, not a name-equality join: a NULL hot key (the
    # classic default-value hot spot) must match its totals row —
    # NULL never equals NULL under a plain join, which would silently
    # send every NULL-key row down the cold path as ONE fat window
    # partition (the exact task this helper exists to eliminate).
    # The totals' key columns are RENAMED before the join (a
    # drop-by-Column after a join resolves unreliably and can silently
    # leave the right-side key shadowing the left one — r13 review).
    ht = hot_totals.select(
        *[F.col(kc).alias(f"__hk_{i}") for i, kc in enumerate(key_cols)],
        "__is_hot",
        *[f"__hot_{o}" for o in aggs],
    )
    cond = None
    for i, kc in enumerate(key_cols):
        term = F.col(kc).eqNullSafe(F.col(f"__hk_{i}"))
        cond = term if cond is None else cond & term
    tagged = salted.join(F.broadcast(ht), cond, "left").withColumn(
        "__wsalt", F.when(F.col("__is_hot"), F.col("__salt")).otherwise(F.lit(0))
    )
    w = Window.partitionBy(*key_cols, "__wsalt")
    for out, (c, fn) in aggs.items():
        tagged = tagged.withColumn(
            out,
            F.when(F.col("__is_hot"), F.col(f"__hot_{out}")).otherwise(
                window_fns[fn](c).over(w)
            ),
        )
    return tagged.select(*out_cols)


# --- driver-visible entry -------------------------------------------------

SALTED_AGG_ORACLE = """
SELECT
  l_returnflag,
  CAST(SUM(CAST(floor(l_quantity * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
    / 1000000.0 AS sum_qty,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def _register() -> None:
    from ..catalog import load, query

    @query("skew_salted_aggregate", oracle=SALTED_AGG_ORACLE, tags=("agg", "skew"))
    def skew_salted_aggregate(spark, sf_dir: str) -> DataFrame:
        """The extreme-skew aggregation path, driver-checked: lineitem
        grouped by l_returnflag (3 hot keys over every row — the shape
        where one reducer would own a third of the table). Phase 1
        shuffles on (key, content-salt) spreading each hot key over 16
        reducers; phase 2 combines 16 partials per key. Values are
        quantized to BIGINT before summing so both phases are exact
        long arithmetic — bit-identical to the oracle's single-phase
        GROUP BY (a salted DOUBLE sum would be order-dependent)."""
        li = load(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            F.floor(F.col("l_quantity") * F.lit(1000000) + F.lit(0.5))
            .cast("bigint")
            .alias("qty_q"),
        )
        out = salted_aggregate(
            li,
            ["l_returnflag"],
            {"sum_q": ("qty_q", "sum"), "n_rows": ("qty_q", "count")},
            n_salts=16,
        )
        return out.select(
            "l_returnflag",
            (F.col("sum_q").cast("double") / F.lit(1000000.0)).alias("sum_qty"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
        )


SALTED_JOIN_ORACLE = """
SELECT
  p.p_brand,
  CAST(SUM(CAST(floor(l.l_quantity * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
    / 1000000.0 AS sum_qty,
  COUNT(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand
"""


def _register_join() -> None:
    from ..catalog import load, query

    @query("skew_salted_join", oracle=SALTED_JOIN_ORACLE, tags=("join", "skew", "agg"))
    def skew_salted_join(spark, sf_dir: str) -> DataFrame:
        """The hot-foreign-key join path, driver-checked: lineitem joins
        part through ``salted_broadcast_left`` -- the big side gets a
        content-derived salt, the small side is replicated 8x, and the
        equi-join runs on (p_partkey, salt) so a dominant part key
        spreads over 8 tasks instead of one. Post-join aggregate uses
        quantized-BIGINT sums so the result is bit-identical to the
        oracle's unsalted join + GROUP BY.

        Scale: replication cost is 8x the DIMENSION (broadcast-sized
        by precondition), zero extra shuffles of the fact side -- the
        standard fix when one foreign key holds an executor's worth of
        fact rows and AQE's skew split cannot help (broadcast joins
        have no shuffle partitions to split)."""
        li = load(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").alias("p_partkey"),
            F.floor(F.col("l_quantity") * F.lit(1000000) + F.lit(0.5))
            .cast("bigint")
            .alias("qty_q"),
        )
        p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
        joined = salted_broadcast_left(li, p, on="p_partkey", n_salts=8)
        return (
            joined.groupBy("p_brand")
            .agg(F.sum("qty_q").alias("sum_q"), F.count("*").alias("n_rows"))
            .select(
                "p_brand",
                (F.col("sum_q").cast("double") / F.lit(1000000.0)).alias("sum_qty"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
            )
        )


_register()
_register_join()
