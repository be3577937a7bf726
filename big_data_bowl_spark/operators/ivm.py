"""Incremental view maintenance: refresh a grouped rollup from a delta
batch without rescanning the base.

At 100 TB the point of a materialized rollup is that tomorrow's refresh
touches only tomorrow's partition.  The primitive is a MERGEABLE STATE
table: aggregate each batch alone into per-group partial states
(count / sum / min / max — any commutative monoid), then combine state
tables group-wise.  The merge operates at GROUP grain, not row grain —
a state table is bounded by the key cardinality no matter how many
trillions of rows produced it, so the refresh cost is O(delta + groups),
never O(base).  Non-monoid finals (mean, and variance via the
sum-of-squares extension) are derived from the state at finalize time,
exactly how Spark's own partial aggregation splits partial/final — this
operator is that same shape lifted to a persistable table boundary.

The append path is pure monoid merging.  Deletes split by
invertibility: count/sum retract with a signed merge, while min/max
(semilattice — deleting the row that held the max says nothing about
the new max) recompute for exactly the touched groups — see
:func:`retract_state`.

Sums reduce as integer cents (exact int64) per the engine-stability
rule in the verify conventions: a float fold's association-order drift
can cross the round-to-6 boundary; long sums cannot.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns

STATE_COLS = ("__n", "__sum_cents", "__min_cents", "__max_cents")


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-group mergeable partial state of one batch:
    (keys…, __n, __sum_cents, __min_cents, __max_cents)."""
    require_columns(df, [*keys, value_col], "agg_state")
    cents = F.round(F.col(value_col) * 100).cast("long")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(cents).alias("__sum_cents"),
        F.min(cents).alias("__min_cents"),
        F.max(cents).alias("__max_cents"))


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Combine state tables group-wise (count/sum add, min/max fold) —
    associative and commutative, so any refresh schedule (daily deltas,
    hierarchical reduces, out-of-order backfills) yields the same state."""
    for st in states:
        require_columns(st, [*keys, *STATE_COLS], "merge_states")
    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys).agg(
        F.sum("__n").alias("__n"),
        F.sum("__sum_cents").alias("__sum_cents"),
        F.min("__min_cents").alias("__min_cents"),
        F.max("__max_cents").alias("__max_cents"))


def finalize_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """Derive the user-facing aggregates from a state table.  Divisions
    are single IEEE ops over exact longs, so every engine that merges to
    the same state prints the same finals."""
    require_columns(state, [*keys, *STATE_COLS], "finalize_state")
    return state.select(
        *keys,
        F.col("__n").alias("n"),
        F.round(F.col("__sum_cents").cast("double") / 100.0, 6)
         .alias("sum_value"),
        F.round(F.col("__min_cents").cast("double") / 100.0, 6)
         .alias("min_value"),
        F.round(F.col("__max_cents").cast("double") / 100.0, 6)
         .alias("max_value"),
        F.round(F.col("__sum_cents").cast("double")
                / (100.0 * F.col("__n").cast("double")), 6)
         .alias("mean_value"))


def retract_state(state: DataFrame, deleted: DataFrame,
                  remaining: DataFrame, keys: list[str],
                  value_col: str) -> DataFrame:
    """CDC delete support for the rollup state — the module docstring's
    'route deletes through a group rescan of the touched keys' made
    code: count/sum are GROUP-invertible and retract by a signed merge,
    while min/max are semilattice aggregates (not invertible — deleting
    the row that held the max says nothing about the new max) and
    recompute FROM ``remaining`` for exactly the touched groups; every
    untouched group keeps its stored extrema.  Cost is
    O(deleted + touched-group rows + groups), never O(base) — the
    partial-recompute shape every production IVM engine (Materialize,
    Delta live tables) uses for non-invertible aggregates.

    ``remaining`` must be the post-delete base relation (callers have
    it by construction: it is what their MERGE/DELETE produced).
    Groups whose every row was deleted drop out of the state.  Returns
    a state table with the standard STATE_COLS."""
    require_columns(state, [*keys, *STATE_COLS], "retract_state")
    require_columns(deleted, [*keys, value_col], "retract_state")
    require_columns(remaining, [*keys, value_col], "retract_state")
    cents = F.round(F.col(value_col) * 100).cast("long")
    neg = deleted.groupBy(*keys).agg(
        (-F.count(F.lit(1))).alias("__n"),
        (-F.sum(cents)).alias("__sum_cents"))
    ns = (state.select(*keys, "__n", "__sum_cents")
               .unionByName(neg)
               .groupBy(*keys)
               .agg(F.sum("__n").alias("__n"),
                    F.sum("__sum_cents").alias("__sum_cents")))
    # NULL-SAFE key joins throughout: groupBy treats NULL as a
    # legitimate group (agg_state does), but a name-list join would
    # silently drop NULL-keyed groups from the maintained state — a
    # review-confirmed corruption on NULL group keys.
    touched = deleted.select(*keys).distinct().localCheckpoint(eager=True)
    t_alias = touched.select(*[F.col(k).alias(f"__t_{k}") for k in keys])
    t_cond = reduce(lambda a, b: a & b,
                    [F.col(k).eqNullSafe(F.col(f"__t_{k}"))
                     for k in keys])
    mm_re = (remaining.join(t_alias, t_cond, "left_semi")
                      .groupBy(*keys)
                      .agg(F.min(cents).alias("__min_cents"),
                           F.max(cents).alias("__max_cents")))
    mm_keep = (state.join(t_alias, t_cond, "left_anti")
                    .select(*keys, "__min_cents", "__max_cents"))
    mm = mm_keep.unionByName(mm_re)
    m_alias = mm.select(*[F.col(k).alias(f"__m_{k}") for k in keys],
                        "__min_cents", "__max_cents")
    m_cond = reduce(lambda a, b: a & b,
                    [F.col(k).eqNullSafe(F.col(f"__m_{k}"))
                     for k in keys])
    return (ns.filter(F.col("__n") > 0)
              .join(m_alias, m_cond)
              .select(*keys, *STATE_COLS))
