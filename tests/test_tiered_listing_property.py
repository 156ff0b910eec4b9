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
    _live_segments,
    _segments,
    batch_dirs,
    state_dirs,
)


def _materialize_layout(base: str, history: list[tuple[str, int]]) -> tuple[set[int], int]:
    """Build the on-disk layout a history of ops produces.

    ops: ("batch", _) appends batch-id; ("compact", _) folds all live
    batch dirs into the next MINOR segment; ("major", _) folds all
    live segments + live batch dirs into one MAJOR segment (like
    compact_dataset_incremental with max_segments, minus the data).
    The *_crash variants commit the segment but skip ALL GC — consumed
    batch dirs and superseded segments stay on disk, which the reader
    must ignore by watermark / seg-id rule alone.
    Returns (committed batch ids, next batch id)."""
    os.makedirs(base, exist_ok=True)
    committed: set[int] = set()
    live: list[int] = []
    live_segs: list[tuple[str, int]] = []  # (dirname, upto)
    seg = 0
    next_id = 0
    for op, _ in history:
        crash = op.endswith("_crash")
        op = op.removesuffix("_crash")
        if op == "batch":
            os.makedirs(os.path.join(base, f"batch-{next_id:08d}"))
            committed.add(next_id)
            live.append(next_id)
            next_id += 1
        elif op == "compact" and live:
            upto = max(live)
            name = f"compact-{seg:08d}-upto-{upto:08d}"
            os.makedirs(os.path.join(base, name))
            if not crash:
                for b in live:
                    os.rmdir(os.path.join(base, f"batch-{b:08d}"))
            live.clear()  # consumed either way; crash leaves garbage dirs
            live_segs.append((name, upto))
            seg += 1
        elif op == "major" and (live or live_segs):
            upto = max([u for _, u in live_segs] + live)
            name = f"compact-{seg:08d}-all-upto-{upto:08d}"
            os.makedirs(os.path.join(base, name))
            if not crash:
                for b in live:
                    os.rmdir(os.path.join(base, f"batch-{b:08d}"))
                for s, _u in live_segs:
                    os.rmdir(os.path.join(base, s))
            live.clear()
            live_segs = [(name, upto)]
            seg += 1
    return committed, next_id


@settings(max_examples=300, deadline=None)
@given(
    history=st.lists(
        st.tuples(
            st.sampled_from(
                ["batch", "compact", "major", "compact_crash", "major_crash"]
            ),
            st.just(0),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_state_listing_covers_every_earlier_batch_exactly_once(tmp_path_factory, history):
    base = str(tmp_path_factory.mktemp("tiered"))
    committed, next_id = _materialize_layout(base, history)

    def _segment_cover() -> list[int]:
        # LIVE segments only (a major supersedes smaller seg ids even
        # while crash-leftover dirs are still on disk); their folded
        # ranges are consecutive (prev_upto, upto] in seg-id order,
        # with the leading major covering [0, its upto]
        ids: list[int] = []
        prev = -1
        for s in _live_segments(base):
            upto = int(os.path.basename(s).rsplit("-", 1)[1])
            ids.extend(range(prev + 1, upto + 1))
            prev = upto
        return ids

    # the next micro-batch (id = next_id) must see ALL committed
    # batches exactly once
    covered = list(_segment_cover())
    for p in state_dirs(base, next_id):
        name = os.path.basename(p)
        if name.startswith("batch-"):
            covered.append(int(name.split("-", 1)[1]))
    assert sorted(covered) == sorted(committed), (
        f"listing covers {sorted(covered)} but committed {sorted(committed)}"
    )

    # no listing for the CURRENT batch ever exposes a consumed dir, a
    # superseded segment, or a same/future batch id
    watermark = _compact_watermark(base)
    live = set(_live_segments(base))
    for p in state_dirs(base, next_id):
        name = os.path.basename(p)
        if name.startswith("batch-"):
            bid = int(name.split("-", 1)[1])
            assert watermark < bid < next_id
        else:
            assert p in live, f"superseded segment exposed: {name}"

    # a retry of any LIVE batch b sees exactly the ids < b
    for b in sorted(committed):
        if b <= watermark:
            continue  # folded: no longer retryable by contract
        seen = list(_segment_cover())
        for p in state_dirs(base, b):
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
