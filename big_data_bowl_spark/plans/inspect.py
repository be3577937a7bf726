"""Physical-plan introspection utilities.

No custom Catalyst rules or strategies are needed for this engine
(SURVEY §4.3: every operator lowers to stock primitives) — what IS needed
at 100 TB is *verifying* that Catalyst produced the plan we designed for:
filters pushed into scans, dimensions broadcast, windows sharing
exchanges.  These helpers make plan shape a testable contract
(tests/test_plans.py) instead of a hope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, execute: bool = False) -> str:
    """The physical plan string.  With ``execute=True`` the frame is run
    first so AQE finalizes stage boundaries (codegen ids, chosen joins)."""
    if execute:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    """``EXPLAIN FORMATTED`` output — includes scan details
    (PushedFilters, ReadSchema) that the tree string truncates."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Fail unless every fragment appears in the scan's pushed-filter list."""
    plan = explain_formatted(df)
    if "PushedFilters: [" not in plan:
        raise AssertionError("no PushedFilters section in plan:\n" + plan)
    section = plan.split("PushedFilters")[1][:400]
    missing = [f for f in fragments if f not in section]
    if missing:
        raise AssertionError(f"filters not pushed: {missing}\n{section}")


def assert_broadcast_join(df: DataFrame, min_count: int = 1,
                          max_sort_merge: int | None = None) -> None:
    """Fail unless the plan broadcasts at least ``min_count`` joins (and
    optionally bounds the number of shuffle joins)."""
    plan = executed_plan(df)
    n_b = plan.count("BroadcastHashJoin")
    if n_b < min_count:
        raise AssertionError(f"expected ≥{min_count} BroadcastHashJoin, "
                             f"found {n_b}:\n{plan}")
    if max_sort_merge is not None:
        n_s = plan.count("SortMergeJoin")
        if n_s > max_sort_merge:
            raise AssertionError(f"expected ≤{max_sort_merge} SortMergeJoin, "
                                 f"found {n_s}:\n{plan}")


def count_exchanges(df: DataFrame, key_fragment: str = "") -> int:
    """Number of shuffle exchanges (optionally filtered to a partition-key
    fragment) — the scale-limiting resource of any plan."""
    plan = executed_plan(df)
    needle = f"Exchange hashpartitioning({key_fragment}" if key_fragment \
        else "Exchange "
    return plan.count(needle)
