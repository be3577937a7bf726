"""Plan linter: the scale discipline as one reusable gate.

`tests/test_plans.py` pins query-specific contracts (this join
broadcasts, that window shares an exchange).  The linter is the
complement: a generic sweep over any query's physical plan for the
anti-patterns that NEVER belong in a 100 TB engine, so every headline
query gets the check without writing a bespoke test — and a future
change that sneaks in a cartesian product or a row-wise Python UDF
fails CI with a named finding instead of a mysterious slowdown.

Checked anti-patterns:

- **CartesianProduct** — an unkeyed physical cross join.  The engine's
  legitimate crossJoins are 1-row scalar broadcasts, which plan as
  BroadcastNestedLoopJoin with a single-row build side, never as
  CartesianProduct.
- **BatchEvalPython** — a row-at-a-time Python UDF (pickled per row).
  The engine's three Python seams are all Arrow-batched
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas and the
  Arrow-enabled UDTF), which are allowed.
- **Shuffle budget** — optional `max_exchanges`: shuffles are the
  scale-limiting resource, and a query whose exchange count silently
  grows past its design budget has regressed even if still correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .inspect import executed_plan

FORBIDDEN = (
    ("CartesianProduct",
     "unkeyed cross join — candidates must come from an equi-join key "
     "(bucket/band/cell/prefix), never the full cross product"),
    ("BatchEvalPython",
     "row-at-a-time Python UDF — use Arrow-batched pandas UDFs / "
     "mapInPandas / an Arrow UDTF (the engine's declared seams)"),
)


def lint_plan(df: DataFrame, max_exchanges: int | None = None) -> list[str]:
    """Return a list of findings (empty = clean) for the query's
    physical plan."""
    plan = executed_plan(df)
    findings = []
    for needle, why in FORBIDDEN:
        n = plan.count(needle)
        if n:
            findings.append(f"{needle} x{n}: {why}")
    if max_exchanges is not None:
        # "ReusedExchange " contains the substring "Exchange " — subtract
        # it so a plan that REUSES a shuffle isn't double-billed for it.
        n_ex = plan.count("Exchange ") - plan.count("ReusedExchange ")
        if n_ex > max_exchanges:
            findings.append(
                f"Exchange x{n_ex} exceeds budget {max_exchanges}: "
                "shuffles are the scale-limiting resource — re-derive "
                "the query's shuffle budget or fix the regression")
    return findings


def assert_clean_plan(df: DataFrame,
                      max_exchanges: int | None = None) -> None:
    """Fail loud with every finding (the CI-gate form of lint_plan)."""
    findings = lint_plan(df, max_exchanges=max_exchanges)
    if findings:
        raise AssertionError(
            "plan lint failed:\n- " + "\n- ".join(findings)
            + "\n" + executed_plan(df))
