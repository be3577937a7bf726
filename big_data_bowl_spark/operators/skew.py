"""Skew-handling operators: salted two-phase aggregation and salted
broadcast join.

At 100 TB a handful of hot keys (5 event types, a star receiver's plays)
concentrate a shuffle partition onto one executor.  AQE's skew-join
splitting covers sort-merge joins; for *aggregations* over low-cardinality
keys the fix is salting: phase 1 aggregates on (key, salt) — fanning each
hot key over N reducers — phase 2 merges the partials.  Only
decomposable aggregates (sum/count/min/max, and avg via sum+count)
participate; the result is bit-compatible with the direct groupBy up to
float association order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, keys: list[str], value: str,
               n_salts: int = 16, salt_on: str | None = None) -> DataFrame:
    """Two-phase skew-tolerant aggregation: sum/count/min/max/avg of
    ``value`` per ``keys``.

    Phase 1 groups on (keys, salt) where salt spreads rows of a hot key
    across ``n_salts`` reducers; phase 2 re-aggregates the ≤ n_salts
    partial rows per key — a trivially small shuffle.

    The salt must be deterministic per row content: a shuffle-map retry
    (executor loss) recomputes the task, and a nondeterministic salt
    (rand / monotonically_increasing_id) could route the same row to a
    different reducer than the original attempt — double-counting or
    dropping it.  Default: hash of every column.
    """
    salt_cols = [F.col(salt_on)] if salt_on else [F.col(c) for c in df.columns]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value).alias("__sum"),
        F.count(value).alias("__cnt"),
        F.min(value).alias("__min"),
        F.max(value).alias("__max"))
    return partial.groupBy(*keys).agg(
        F.sum("__sum").alias("total"),
        F.sum("__cnt").alias("n"),
        F.min("__min").alias("min"),
        F.max("__max").alias("max"),
        (F.sum("__sum") / F.sum("__cnt")).alias("mean"))


def salted_broadcast_join(fact: DataFrame, dim: DataFrame, key: str,
                          n_salts: int = 8) -> DataFrame:
    """Replicated-dimension salted join for when one fact key dominates AND
    the dimension is too large to broadcast outright but small enough to
    replicate n_salts ways: fact rows get a random salt, dim rows are
    exploded across all salts, and the join key becomes (key, salt) —
    spreading the hot key over n_salts tasks.  Salt is content-hashed
    (not monotonically_increasing_id) so shuffle-map retries re-derive
    identical routing — see salted_agg."""
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                         F.lit(n_salts)))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return (fact_s.join(dim_s, [key, "__salt"], "left")
                  .drop("__salt"))


def skew_profile(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Shuffle-key skew advisor: for each CANDIDATE key column, the
    group-size distribution statistics that decide whether a
    groupBy/join on that key needs salting (:func:`salted_agg`) or AQE
    skew splitting — max group share, and the p99/median group-size
    ratio (a hot-key detector that, unlike max alone, distinguishes
    one-big-key skew from a generally heavy tail).

    Per candidate: one count aggregate to the key grain, then one
    5-stat aggregate over the (small) size distribution — candidates
    evaluate independently and union, so profiling k keys costs k
    linear passes, no cross-key shuffle.  Returns one row per candidate
    (key, n_groups, n_rows, max_size, max_share, p50_size, p99_size,
    skew_ratio)."""
    from functools import reduce

    from ..schemas import require_columns
    require_columns(df, key_cols, "skew_profile")
    if not key_cols:
        raise ValueError("skew_profile: no candidate key columns given")
    outs = []
    for key in key_cols:
        sizes = (df.groupBy(key)
                   .agg(F.count(F.lit(1)).alias("__n")))
        outs.append(sizes.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("__n").alias("n_rows"),
            F.max("__n").alias("max_size"),
            F.round(F.percentile("__n", F.lit(0.5)), 6).alias("p50_size"),
            F.round(F.percentile("__n", F.lit(0.99)), 6).alias("p99_size"))
            .select(
                F.lit(key).alias("key"),
                "n_groups", "n_rows", "max_size",
                F.round(F.col("max_size").cast("double")
                        / F.col("n_rows").cast("double"), 6)
                 .alias("max_share"),
                "p50_size", "p99_size",
                F.round(F.col("p99_size") / F.col("p50_size"), 6)
                 .alias("skew_ratio")))
    return reduce(lambda a, b: a.unionByName(b), outs)
