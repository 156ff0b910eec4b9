"""Property test for the tiered state-store listing (sinks.state_dirs /
read path math): under ANY valid interleaving of batch appends and
incremental compactions, the listing must cover every committed batch
id strictly below the reader's batch EXACTLY once — either inside one
segment's folded range or as a live batch dir — and never expose a
consumed (compacted) batch dir or a same/future batch. Pure directory
math, no SparkSession needed, so hypothesis can sweep hundreds of
histories cheaply."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_vortex_spark.streaming.sinks import (
    _compact_watermark,
    _segments,
    batch_dirs,
    state_dirs,
)


def _materialize_layout(base: str, history: list[tuple[str, int]]) -> tuple[set[int], int]:
    """Build the on-disk layout a history of ops produces.

    ops: ("batch", id) appends batch-id; ("compact", 0) folds all live
    batch dirs into the next segment (like compact_dataset_incremental,
    minus the data). Consumed batch dirs are removed (the GC ran).
    Returns (committed batch ids, next batch id)."""
    os.makedirs(base, exist_ok=True)
    committed: set[int] = set()
    live: list[int] = []
    seg = 0
    next_id = 0
    for op, _ in history:
        if op == "batch":
            os.makedirs(os.path.join(base, f"batch-{next_id:08d}"))
            committed.add(next_id)
            live.append(next_id)
            next_id += 1
        elif op == "compact" and live:
            upto = max(live)
            os.makedirs(os.path.join(base, f"compact-{seg:08d}-upto-{upto:08d}"))
            for b in live:
                os.rmdir(os.path.join(base, f"batch-{b:08d}"))
            live.clear()
            seg += 1
    return committed, next_id


@settings(max_examples=200, deadline=None)
@given(
    history=st.lists(
        st.tuples(st.sampled_from(["batch", "compact"]), st.just(0)),
        min_size=1,
        max_size=24,
    )
)
def test_state_listing_covers_every_earlier_batch_exactly_once(tmp_path_factory, history):
    base = str(tmp_path_factory.mktemp("tiered"))
    committed, next_id = _materialize_layout(base, history)

    # the next micro-batch (id = next_id) must see ALL committed
    # batches exactly once
    parts = state_dirs(base, next_id)
    covered: list[int] = []
    for p in parts:
        name = os.path.basename(p)
        if name.startswith("batch-"):
            covered.append(int(name.split("-", 1)[1]))
        else:  # segment: folds every id up to its watermark not in an
            # earlier segment — reconstruct from segment order
            pass
    # segment ranges: consecutive (prev_upto, upto]
    prev = -1
    for s in sorted(_segments(base)):
        upto = int(os.path.basename(s).rsplit("-", 1)[1])
        covered.extend(range(prev + 1, upto + 1))
        prev = upto
    assert sorted(covered) == sorted(committed), (
        f"listing covers {sorted(covered)} but committed {sorted(committed)}"
    )

    # no listing for the CURRENT batch ever exposes a consumed dir or
    # a same/future batch id
    watermark = _compact_watermark(base)
    for p in state_dirs(base, next_id):
        name = os.path.basename(p)
        if name.startswith("batch-"):
            bid = int(name.split("-", 1)[1])
            assert watermark < bid < next_id

    # a retry of any LIVE batch b sees exactly the ids < b
    for b in sorted(committed):
        if b <= watermark:
            continue  # folded: no longer retryable by contract
        parts_b = state_dirs(base, b)
        seen: list[int] = []
        prev = -1
        for s in sorted(_segments(base)):
            upto = int(os.path.basename(s).rsplit("-", 1)[1])
            seen.extend(range(prev + 1, upto + 1))
            prev = upto
        for p in parts_b:
            name = os.path.basename(p)
            if name.startswith("batch-"):
                seen.append(int(name.split("-", 1)[1]))
        assert sorted(seen) == sorted(x for x in committed if x < b), b


def test_segment_over_retryable_batch_fails_loudly(tmp_path):
    base = str(tmp_path / "bad")
    os.makedirs(os.path.join(base, "compact-00000000-upto-00000003"))
    try:
        state_dirs(base, 3)
    except ValueError as e:
        assert "still retryable" in str(e)
    else:
        raise AssertionError("expected ValueError for upto >= before")
