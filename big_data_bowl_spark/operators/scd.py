"""Slowly-changing-dimension (type 2) history and ordered funnel analysis.

Two warehouse staples the reference's pandas stack has no answer for at
scale; both are single-shuffle window/aggregate shapes here.

- :func:`scd2_history` turns an append-only change feed into versioned
  validity intervals: collapse consecutive duplicates per key (lag
  compare), then ``lead`` the next change's timestamp into ``valid_to``
  (null = current).  One window partitioning, two functions over it.
- :func:`funnel_stages` computes per-entity ordered-funnel progress
  (reach step N only AFTER step N-1) in ONE shuffle: events collect to a
  per-entity sorted array and a single ``aggregate`` fold walks it,
  advancing the stage on the first strictly-later matching event.  The
  equivalent CTE chain (min(ts) > t_prev per step) needs one
  aggregate+join PER STEP — k shuffles instead of one; per-entity event
  arrays are bounded (sessions/users), so the fold is safe to hold
  in-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import require_columns


def scd2_history(changes: DataFrame, keys: list[str], ts_col: str,
                 attr_cols: list[str],
                 tie_cols: list[str] | None = None) -> DataFrame:
    """Type-2 SCD build: one output row per (key, attribute-run) with
    ``valid_from`` (the run's first change ts), ``valid_to`` (the next
    run's start, null while current) and ``is_current``.  Consecutive
    changes with identical attributes collapse into one run, so replaying
    a verbose CDC feed yields minimal history."""
    require_columns(changes, [*keys, ts_col, *attr_cols], "scd2_history")
    order = [F.col(ts_col), *[F.col(c) for c in (tie_cols or [])]]
    w = Window.partitionBy(*keys).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = (F.lag(attrs).over(w).isNull()
               | (F.lag(attrs).over(w) != attrs))
    runs = changes.withColumn("__chg", changed).filter("__chg").drop("__chg")
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (runs.withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
                .withColumnRenamed(ts_col, "valid_from")
                .withColumn("is_current", F.col("valid_to").isNull())
                .select(*keys, *attr_cols,
                        "valid_from", "valid_to", "is_current"))


def _funnel_fold(events: DataFrame, entity_col: str, ts_col: str,
                 step_col: str, tie_col: str | None, max_group: int,
                 acc0, advance, name: str) -> DataFrame:
    """Shared scaffolding of the funnel family: per-entity sorted event
    array (collect + array_sort — the recurrence genuinely can't be
    windowed), the in-row ``aggregate`` fold, and the hot-key guard.
    The guard rides the live ``n_events`` column (``raise_error``
    branch — no extra pass, and not prunable), the same discipline as
    the fuzzy-join ``max_len``: a hot key (bot user, telemetry
    spammer) would otherwise build an unbounded single row.  Both
    funnel variants differ ONLY in their accumulator struct and
    advance rule."""
    require_columns(events, [entity_col, ts_col, step_col], name)
    order_cols: list[Column] = [F.col(ts_col).alias("t")]
    if tie_col:
        order_cols.append(F.col(tie_col).alias("tb"))
    order_cols.append(F.col(step_col).alias("s"))
    arr = F.array_sort(F.collect_list(F.struct(*order_cols)))
    guarded_n = F.when(
        F.col("n_events") <= max_group, F.col("n_events")
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"{name}[max_group={max_group}]: hot key "),
        F.col(entity_col).cast("string"),
        F.lit(" has "), F.col("n_events").cast("string"),
        F.lit(" events — bound the history or pre-aggregate"))
        ).cast("long"))
    return (events.groupBy(F.col(entity_col))
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       arr.alias("__arr"))
                  .select(F.col(entity_col),
                          F.aggregate(F.col("__arr"), acc0, advance)["stage"]
                           .cast("long").alias("stage"),
                          guarded_n.alias("n_events")))


def funnel_stages(events: DataFrame, entity_col: str, ts_col: str,
                  step_col: str, steps: list[str],
                  tie_col: str | None = None,
                  max_group: int = 1_000_000) -> DataFrame:
    """Ordered-funnel progress per entity: stage k means the entity hit
    ``steps[0]``, then ``steps[1]`` STRICTLY LATER, … up to ``steps[k-1]``
    (matching the min(ts) > t_prev CTE-chain semantics).  Single shuffle:
    per-entity sorted event array + one fold (see :func:`_funnel_fold`
    for the shared shape and the hot-key guard).  Returns
    (entity, stage, n_events)."""
    step_arr = F.array(*[F.lit(s) for s in steps])
    acc0 = F.struct(F.lit(0).alias("stage"),
                    F.lit(None).cast("timestamp").alias("t"))

    def _advance(a, e):
        # try_element_at: past the final step the lookup is null, the
        # equality is null, and the stage sticks (ANSI-safe)
        hit = (F.try_element_at(step_arr, a["stage"] + 1) == e["s"]) \
              & ((a["stage"] == 0) | (e["t"] > a["t"]))
        return F.struct(
            F.when(hit, a["stage"] + 1).otherwise(a["stage"]).alias("stage"),
            F.when(hit, e["t"]).otherwise(a["t"]).alias("t"))

    return _funnel_fold(events, entity_col, ts_col, step_col, tie_col,
                        max_group, acc0, _advance, "funnel_stages")


def windowed_funnel(events: DataFrame, entity_col: str, ts_col: str,
                    step_col: str, steps: list[str],
                    within_seconds: int,
                    tie_col: str | None = None,
                    max_group: int = 1_000_000) -> DataFrame:
    """Time-bounded conversion funnel: like :func:`funnel_stages`, but
    every later step must land within ``within_seconds`` of the FIRST
    step's (earliest) hit — the "converted within 24 h" product metric.
    Semantics are the bounded min-ts chain, anchored at t1 = the
    entity's earliest ``steps[0]`` event:

        stage k ⇔ hit steps[0..k-1] with each at ts strictly after the
        previous stage's ts AND ts ≤ t1 + within_seconds.

    Anchoring at the earliest first step (not max-over-restarts à la
    ClickHouse windowFunnel) keeps the statistic deterministic and
    exactly SQL-expressible — the oracle is the same CTE chain with the
    interval bound.  Shares :func:`_funnel_fold`'s scaffolding (sorted
    array, fold, hot-key guard); the accumulator additionally carries
    the anchor timestamp.  Returns (entity, stage, n_events)."""
    step_arr = F.array(*[F.lit(s) for s in steps])
    acc0 = F.struct(F.lit(0).alias("stage"),
                    F.lit(None).cast("timestamp").alias("t"),
                    F.lit(None).cast("timestamp").alias("t0"))
    bound = F.expr(f"INTERVAL {int(within_seconds)} SECONDS")

    def _advance(a, e):
        hit = (F.try_element_at(step_arr, a["stage"] + 1) == e["s"]) \
              & ((a["stage"] == 0)
                 | ((e["t"] > a["t"]) & (e["t"] <= a["t0"] + bound)))
        return F.struct(
            F.when(hit, a["stage"] + 1).otherwise(a["stage"]).alias("stage"),
            F.when(hit, e["t"]).otherwise(a["t"]).alias("t"),
            F.when(hit & (a["stage"] == 0), e["t"])
             .otherwise(a["t0"]).alias("t0"))

    return _funnel_fold(events, entity_col, ts_col, step_col, tie_col,
                        max_group, acc0, _advance, "windowed_funnel")
