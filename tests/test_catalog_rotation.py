"""Driver-sample rotation ordering (VERDICT r5 #1): the driver gates
the FIRST ~50 of ``catalog.entries()`` per round, so the iteration
order IS the re-validation schedule. Groups: never-sampled →
sampled-no-green (re-queues) → green oldest-last-green-round first,
so every entry's driver row refreshes every ceil(n/50) rounds instead
of the same head-of-registration greens re-sampling forever."""

from __future__ import annotations

from duckdb_vortex_spark import catalog


def test_every_entry_listed_exactly_once():
    names = list(catalog.entries())
    assert len(names) == len(set(names))
    assert set(names) == set(catalog._REGISTRY)


def test_green_entries_ordered_oldest_green_first():
    sampled, green = catalog._driver_rows()
    ents = catalog.entries()
    # walk past fresh + retry prefixes; the green run must be
    # non-decreasing in last-green round until the oracle-less tail
    rounds = [
        green[n]
        for n, e in ents.items()
        if e.oracle is not None and n in green
    ]
    assert rounds == sorted(rounds), "green group must rotate oldest-first"


def test_fresh_and_retry_precede_greens():
    sampled, green = catalog._driver_rows()
    ents = catalog.entries()
    seen_green = False
    for n, e in ents.items():
        if e.oracle is None:
            continue  # deferred tail, position unconstrained here
        if n in green:
            seen_green = True
        else:
            assert not seen_green, f"non-green {n!r} listed after a green entry"


def test_head_sample_revalidates_stale_rows():
    """The 50-head must re-validate the OLDEST driver rows first.
    Derived from whatever artifacts are on disk (ADVICE r6: the
    previous version hardcoded 'green round <= 3' and '>= 40', which
    rots as rounds accumulate): every green entry inside the head
    must be no NEWER than any green entry outside it — head greens
    come from the oldest observed green rounds, whatever those are."""
    sampled, green = catalog._driver_rows()
    ents = catalog.entries()
    head = list(ents)[:50]
    head_set = set(head)
    greens_in = [green[n] for n in head if n in green]
    greens_out = [
        green[n]
        for n, e in ents.items()
        if n not in head_set and e.oracle is not None and n in green
    ]
    if greens_in and greens_out:
        assert max(greens_in) <= min(greens_out), (
            "a head green is newer than a non-head green — rotation broken"
        )
    # fresh and retry entries must not be displaced past the head by
    # greens: any green in the head implies zero fresh/retry outside it
    if greens_in:
        for n, e in ents.items():
            if n in head_set or e.oracle is None:
                continue
            assert n in green, (
                f"non-green oracle entry {n!r} outside head while greens occupy it"
            )
