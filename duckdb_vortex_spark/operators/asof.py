"""As-of join: for each left row, the most recent right row at or
before (backward) / at or after (forward) its timestamp, per key.

The reference product exposes this as DuckDB's native ``ASOF JOIN``
(SURVEY.md §2B Joins — "no native Spark op"); this module supplies the
Spark-side operator. Strategy: **union + last-non-null window**, NOT a
range join — a range join explodes to O(|L|·|R|) pairs per key before
filtering, while the union-window form is one shuffle on the key plus
one sort, linear in |L|+|R|, and AQE-safe. This is the 100 TB-scale
shape: identical cost profile to any windowed aggregate.

Right-side duplicates at the same (key, ts) would make "the" matched
row ambiguous; callers should pre-aggregate the right side (the
catalog entry does), otherwise the later row in sort order wins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_SRC = "__asof_src"
_TS = "__asof_ts"
_MTS = "__asof_match_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join. Every ``left`` row is kept; value columns of
    ``right`` (everything except ``on`` + ``right_ts``) are filled from
    the nearest preceding (backward, ``left_ts >= right_ts``) or
    following (forward) right row within the same ``on`` group.

    Matches DuckDB ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``
    (inclusive) for ``backward``; ``<=`` for ``forward``.

    ``tolerance_us`` (pandas ``merge_asof(tolerance=...)`` semantics):
    matches farther than this many microseconds from the left
    timestamp are treated as no-match (values become NULL). Applied as
    a post-fill mask, so it adds zero shuffles.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    on = list(on)
    right_vals = [c for c in right.columns if c not in on and c != right_ts]
    fill_vals = list(right_vals)
    if tolerance_us is not None:
        fill_vals.append(_MTS)

    l2 = left.withColumn(_TS, F.col(left_ts)).withColumn(_SRC, F.lit(1))
    for c in right_vals:
        l2 = l2.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    if tolerance_us is not None:
        l2 = l2.withColumn(_MTS, F.lit(None).cast(dict(right.dtypes)[right_ts]))
    r2 = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SRC),
        *[F.col(c) for c in right_vals],
        *([F.col(right_ts).alias(_MTS)] if tolerance_us is not None else []),
    )
    left_cols = [c for c in left.columns]
    unioned = l2.select(*on, _TS, _SRC, *fill_vals, *[c for c in left_cols if c not in on]).unionByName(
        r2, allowMissingColumns=True
    )

    if direction == "backward":
        # right rows (src=0) sort before left rows at equal ts → inclusive
        w = (
            W.partitionBy(*on)
            .orderBy(F.col(_TS).asc(), F.col(_SRC).asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    else:
        w = (
            W.partitionBy(*on)
            .orderBy(F.col(_TS).desc(), F.col(_SRC).asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )

    filled = unioned.select(
        *on,
        _TS,
        _SRC,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_vals],
        *[c for c in left_cols if c not in on],
    )
    out = filled.filter(F.col(_SRC) == 1)
    if tolerance_us is not None:
        gap = F.unix_micros(F.col(_TS)) - F.unix_micros(F.col(_MTS))
        if direction == "forward":
            gap = -gap
        in_tol = F.col(_MTS).isNotNull() & (gap <= tolerance_us)
        out = out.select(
            *on,
            _TS,
            _SRC,
            *[F.when(in_tol, F.col(c)).otherwise(F.lit(None)).alias(c) for c in right_vals],
            *[c for c in left_cols if c not in on],
        )
    return out.drop(_SRC, _TS, _MTS)
