"""Physical-plan introspection: the engine's scale guardrails as a library.

The reference has no plan representation at all (SURVEY §4); this module is
how this engine makes its *physical* properties first-class: tests assert
them (tests/test_plans.py), tools/plan_audit.py prints the census, and
operators can self-check (e.g. refuse a nested-loop plan on a path that
must stay equi-keyed at 100 TB).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def physical_plan(df: DataFrame) -> str:
    """The executed (pre-AQE-finalization) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_profile(df: DataFrame | str) -> dict:
    """Compact plan census: join strategies, exchange count, partial-agg
    presence, scan pushdown evidence, nested-loop red flags."""
    plan = df if isinstance(df, str) else physical_plan(df)
    joins = {k: plan.count(k) for k in JOIN_KINDS if plan.count(k)}
    return {
        "joins": joins,
        "exchanges": plan.count("Exchange "),
        "partial_agg": plan.count("HashAggregate") >= 2 or "partial_" in plan,
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "nested_loop": "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan,
    }


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes whose PARTITION BY is empty — each one is a
    corpus-wide single-reducer sort at execution (Spark's `WindowExec:
    No Partition Defined` warning).  Walks the pre-AQE physical plan via
    py4j; returns one descriptive string per offending node.  Queries
    over unbounded inputs must keep this empty — a bounded-input global
    window (calendar/vocab-sized) should be restructured through the
    collect_list + fold idiom (operators/rankselect.py) instead, because
    plan text cannot tell the two apart."""
    out: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        # "Window"/"WindowGroupLimit" (no Exec suffix) are the LOGICAL
        # nodes — subquery plans under sparkPlan() are not yet planned
        # (PlanSubqueries runs in prepareForExecution), so a window
        # hiding inside a scalar/broadcast subquery surfaces logically
        if name in (
            "WindowExec",
            "WindowGroupLimitExec",
            "WindowInPandasExec",
            "Window",
            "WindowGroupLimit",
        ):
            if node.partitionSpec().isEmpty():
                out.append(f"{name}: {node.simpleStringWithNodeId()}")
        if name == "AdaptiveSparkPlanExec":
            # AQE wraps the real tree as a FIELD, not a child
            walk(node.initialPlan())
        # expression-embedded plans (scalar/broadcast subqueries) are not
        # children either — a global window hidden inside a subquery
        # would otherwise escape the walk entirely
        try:
            sit = node.subqueries().iterator()
            while sit.hasNext():
                walk(sit.next())
        except Exception:
            pass  # node types without subqueries() on this Spark build
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().sparkPlan())
    return out


def assert_no_nested_loop(df: DataFrame, context: str = "") -> None:
    """Raise if the plan contains a nested-loop/cartesian join — the
    guardrail for operators whose cost model assumes an equi-keyed plan."""
    if plan_profile(df)["nested_loop"]:
        raise AssertionError(
            f"nested-loop join in plan{' for ' + context if context else ''} — "
            "O(n·m) at scale; the join must ride an equi key"
        )
