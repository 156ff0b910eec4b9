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
