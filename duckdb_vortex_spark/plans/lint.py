"""Physical-plan linting as a user-facing API (the programmatic form
of tests/test_plan_contracts.py): inspect an executed plan for the
three classic scale killers before shipping a pipeline to a cluster.

At 100 TB a plan defect is an outage, not a slowdown — a cartesian
product or a row-at-a-time Python UDF in the hot path can turn a
minutes job into a days job. `lint_plan` gives pipelines a cheap
pre-flight assertion: build the DataFrame, lint it, fail fast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

# (marker in the executed plan, finding, why it matters at scale)
_RULES = (
    (
        "CartesianProduct",
        "cartesian-product",
        "O(|L|*|R|) pair generation; almost always a missing join key",
    ),
    (
        "BroadcastNestedLoopJoin",
        "nested-loop-join",
        "per-row scan of the broadcast side; only correct for tiny dims "
        "or deliberate theta joins",
    ),
    (
        "BatchEvalPython",
        "row-python-udf",
        "row-at-a-time Python evaluation; use pandas_udf / built-ins "
        "(10-100x slower otherwise)",
    ),
)


@dataclass(frozen=True)
class PlanFinding:
    marker: str
    rule: str
    why: str


def formatted_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(df: DataFrame, allow: tuple[str, ...] = ()) -> list[PlanFinding]:
    """Return scale-killer findings in ``df``'s physical plan.

    ``allow`` suppresses rule names that are deliberate for this plan
    (e.g. ``("nested-loop-join",)`` for an intentional theta join).
    """
    plan = formatted_plan(df)
    return [
        PlanFinding(marker, rule, why)
        for marker, rule, why in _RULES
        if rule not in allow and marker in plan
    ]


def assert_plan_clean(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise ``AssertionError`` listing findings if the plan has any
    non-allowed scale killer."""
    findings = lint_plan(df, allow)
    if findings:
        detail = "; ".join(f"{f.rule} ({f.marker}): {f.why}" for f in findings)
        raise AssertionError(f"plan lint failed: {detail}")


# --- fact-table broadcast audit (the r11 q21-class finding) ----------------
#
# The three _RULES markers catch nested loops and row-Python, but a
# BroadcastHashJoin is usually GOOD — except when the build side is an
# unreduced fact table. Locally that happens silently: Spark estimates
# the PROJECTED size, so a 2-column slice of a huge table stays under
# the broadcast threshold long after the table itself cannot possibly
# be resident (r11: q21's orders build cost +0.86 s of 1.95 s at the
# 8x replica; q4's pruned lineitem slice broadcast a 4.8M-row build).
# This check walks each BroadcastExchange subtree and flags builds
# rooted at a fact-table scan with no data filter (join-key IsNotNull
# doesn't count) and no reducing operator (aggregate/semi/limit) in
# between.

import re as _re

_NOTNULL = _re.compile(r"isnotnull\([^)]*\)")
_CODEGEN = _re.compile(r"^\*\(\d+\) ")


def broadcast_subtrees(plan: str) -> list[str]:
    """The indented subtree under each BroadcastExchange node."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        indent = len(line) - len(line.lstrip(" :+-"))
        sub = [line]
        for nxt in lines[i + 1 :]:
            nindent = len(nxt) - len(nxt.lstrip(" :+-"))
            if nxt.strip() and nindent <= indent:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def _has_data_filter(subtree: str) -> bool:
    """A Filter with anything beyond join-key IsNotNull conjuncts."""
    for line in subtree.splitlines():
        s = _CODEGEN.sub("", line.strip(" :+-"))
        if not s.startswith("Filter "):
            continue
        residue = _NOTNULL.sub("", s[len("Filter ") :])
        residue = _re.sub(r"\bAND\b|\bOR\b|[()\s]", "", residue)
        if residue:
            return True
    return False


def _is_reduced(subtree: str) -> bool:
    """Aggregated / semi-joined / limited between scan and broadcast."""
    return any(
        k in subtree
        for k in ("HashAggregate", "SortAggregate", "LeftSemi", "Limit", "TakeOrdered")
    )


def fact_broadcast_findings(
    df: DataFrame, fact_tables: tuple[str, ...]
) -> list[str]:
    """Names of ``fact_tables`` scanned UNREDUCED on a broadcast build
    side of ``df``'s executed plan. Empty list = clean. Treat any hit
    as the q21-class scale bug unless the entry deliberately broadcasts
    a bounded slice the filter heuristic cannot see (declare it where
    you assert, the way tests/test_catalog_plan_lint.py::FACT_BCAST_OK
    does)."""
    plan = formatted_plan(df)
    hits: list[str] = []
    for sub in broadcast_subtrees(plan):
        if _has_data_filter(sub) or _is_reduced(sub):
            continue
        for t in fact_tables:
            if re_scan(sub, t) and t not in hits:
                hits.append(t)
    return hits


def re_scan(subtree: str, table: str) -> bool:
    """Does this subtree scan ``table`` (parquet path or vortex paths)?"""
    return bool(_re.search(rf"FileScan \w+ .*{table}\.parquet|paths.*{table}", subtree))
