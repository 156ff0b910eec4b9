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
    """With 5 artifacts on disk the 50-head must be dominated by the
    OLDEST driver rows (r1–r3), not the entries the driver just
    checked — the r6 'done' criterion from VERDICT r5 #1."""
    sampled, green = catalog._driver_rows()
    head = list(catalog.entries())[:50]
    stale = sum(1 for n in head if green.get(n, 99) <= 3)
    fresh = sum(1 for n in head if n not in sampled)
    # fresh entries legitimately take head slots; everything else in
    # the head must be a stale green (or a re-queue, none expected now)
    assert stale + fresh >= 40
