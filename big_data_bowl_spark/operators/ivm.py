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

Append-only by design: min/max are monoid-mergeable but NOT retractable
(deleting the row that held the max needs a rescan of its group), so
CDC-style retraction is out of scope here — route deletes through
``merge_upsert`` + a group rescan of the touched keys instead.

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
