"""Documented catalog counts must equal the live registry (VERDICT r6
#2: README/CATALOG hand-edited counts drifted two rounds running —
227-vs-228 in r5, 228-vs-230 in r6).  The literal count now appears
only in generated text (CATALOG.md and the README marker stanza, both
written by scripts/gen_catalog.py); this test fails the suite the
moment an entry is registered without re-running the generator."""

from __future__ import annotations

import os
import re

from duckdb_vortex_spark import catalog

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(ROOT, name)) as f:
        return f.read()


def test_catalog_md_count_matches_registry():
    es = catalog.entries()
    n_oracle = sum(1 for e in es.values() if e.oracle)
    m = re.search(r"(\d+) entries, (\d+) oracle-checked", _read("CATALOG.md"))
    assert m, "CATALOG.md missing the generated count line"
    assert (int(m.group(1)), int(m.group(2))) == (len(es), n_oracle), (
        "CATALOG.md stale — run python scripts/gen_catalog.py"
    )


def test_catalog_md_lists_every_entry():
    text = _read("CATALOG.md")
    missing = [n for n in catalog.entries() if f"| `{n}` |" not in text]
    assert not missing, f"CATALOG.md missing rows (run gen_catalog.py): {missing[:5]}"


def test_readme_count_stanza_matches_registry():
    es = catalog.entries()
    n_oracle = sum(1 for e in es.values() if e.oracle)
    text = _read("README.md")
    m = re.search(
        r"catalog-count:begin.*?catalog has (\d+) entries.*?all (\d+) "
        r"value-hash-checked.*?catalog-count:end",
        text,
        re.S,
    )
    assert m, "README.md missing the generated catalog-count stanza"
    assert (int(m.group(1)), int(m.group(2))) == (len(es), n_oracle), (
        "README.md stale — run python scripts/gen_catalog.py"
    )


def test_zero_oracle_less_entries():
    """VERDICT r7 #4/#7: the 'zero oracle-less entries' claim is now
    test-asserted like the entry count. Every catalog entry must carry
    a DuckDB oracle — an entry registered with oracle=None downgrades
    the driver's check to rows-only and must be a deliberate,
    test-updated decision, not a silent omission."""
    missing = [n for n, e in catalog.entries().items() if e.oracle is None]
    assert missing == [], f"entries without a DuckDB oracle: {missing}"


def test_no_handwritten_counts_elsewhere():
    """The entry count may appear ONLY in generated text: CATALOG.md
    and the README marker stanza.  Any other doc stating 'N entries'
    with a number near the catalog size is drift waiting to happen."""
    n = len(catalog.entries())
    suspects = range(max(0, n - 30), n + 31)
    for name in ("SCALE.md", "COVERAGE.md", "FORMAT.md", "TESTDATA.md"):
        if not os.path.exists(os.path.join(ROOT, name)):
            continue
        for i, line in enumerate(_read(name).splitlines(), 1):
            for m in re.finditer(r"(\d+)\s+(?:catalog\s+)?entries", line):
                assert int(m.group(1)) not in suspects, (
                    f"{name}:{i} hardcodes a catalog-sized entry count; "
                    "point at CATALOG.md instead"
                )
