"""Property-based check of the custom as-of join: pandas merge_asof is
the canonical reference implementation for backward/forward/tolerance
semantics, so random small frames are compared against it directly —
complementing the DuckDB ASOF JOIN oracle entries (which pin one
dataset) with generated edge cases: duplicate left timestamps, keys
with no right rows, exact-equality matches, empty-ish sides."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_vortex_spark.operators.asof import asof_join

KEYS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=50)  # seconds; coarse so equal-ts cases occur


@st.composite
def frames(draw):
    left = draw(
        st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12, unique=True)
    )
    right = draw(
        st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12, unique=True)
    )
    return left, right


def _pdf(rows, val_offset=0):
    return pd.DataFrame(
        {
            "k": [k for k, _ in rows],
            "ts": pd.to_datetime([t * 1_000_000_000 for _, t in rows]),
            **({"v": [k * 100 + t + val_offset for k, t in rows]} if val_offset else {}),
        }
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=frames(), tol=st.sampled_from([None, 5, 0]))
def test_asof_matches_pandas_merge_asof(spark, direction, data, tol):
    left_rows, right_rows = data
    lp = _pdf(left_rows).sort_values(["ts", "k"], ignore_index=True)
    rp = _pdf(right_rows, val_offset=1).sort_values(["ts", "k"], ignore_index=True)

    want = pd.merge_asof(
        lp,
        rp,
        on="ts",
        by="k",
        direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    want_set = {
        (r.k, r.ts.value, None if pd.isna(r.v) else int(r.v))
        for r in want.itertuples()
    }

    ldf = spark.createDataFrame(lp[["k", "ts"]])
    rdf = spark.createDataFrame(rp)
    got = asof_join(
        ldf,
        rdf,
        on=["k"],
        left_ts="ts",
        right_ts="ts",
        direction=direction,
        tolerance_us=None if tol is None else tol * 1_000_000,
    )
    got_set = {
        (r.k, pd.Timestamp(r.ts).value, None if pd.isna(r.v) else int(r.v))
        for r in got.toPandas().itertuples()
    }
    assert got_set == want_set
