"""Distribution-drift and model-quality statistics (ML-monitoring
tier): the exact two-sample Kolmogorov–Smirnov statistic and the exact
Mann–Whitney ROC AUC, both built for the 100 TB shape from the start:

- every cumulative pass runs on the DISTINCT-VALUE grain via
  :func:`~.windows.cumsum_distributed` (range-partitioned prefix sums),
  never a single-reducer global window over fact rows;
- every accumulation is INTEGER-EXACT: KS cross-multiplies in int64
  with an automatic in-plan DECIMAL(38,0) fallback (exact to ~1e19
  rows per side, fail-loud past that — overflow would otherwise become
  NULL and silently understate the max); AUC accumulates doubled
  midrank terms in DECIMAL(38,0) directly.

KS's two branches are computed as aggregates over the same gap
relation and a 1-row predicate selects which feeds the final division,
so the fast path costs one extra max-aggregate column and the slow
path is bit-identical to a DECIMAL-only formulation (property-tested
against the int64 branch on shared-range inputs in
tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns
from .windows import cumsum_distributed


def ks_two_sample(df: DataFrame, value_col: str, is_a_col: str,
                  force_decimal: bool = False) -> DataFrame:
    """Exact two-sample KS D over ``value_col``, samples split by the
    0/1 column ``is_a_col``.  Returns one row (na, nb, ks_stat) with
    ks_stat rounded at 6.

    D = max over distinct values of |F_a(v) − F_b(v)|; computed as
    max |cum_a·nb − cum_b·na| / (na·nb) so the max is taken over exact
    integers (int64 or DECIMAL(38,0) depending on na·nb) with ONE
    final division.  ``force_decimal`` pins the DECIMAL branch even in
    int64 range — the property-test hook proving the two branches
    agree on shared-range inputs."""
    require_columns(df, [value_col, is_a_col], "ks_two_sample")
    per_val = (df.groupBy(F.col(value_col).alias("__v"))
                 .agg(F.sum(is_a_col).alias("ca"),
                      F.sum(1 - F.col(is_a_col)).alias("cb")))
    # distinct-value grain + unique ordering → the distributed prefix
    # sum's contract holds exactly
    cum = cumsum_distributed(per_val, ["__v"], ["ca", "cb"])
    totals = df.agg(F.sum(is_a_col).alias("na"),
                    F.sum(1 - F.col(is_a_col)).alias("nb"))
    dec = "decimal(38,0)"
    gaps = cum.crossJoin(F.broadcast(totals)).select(
        F.abs(F.col("cum_ca") * F.col("nb")
              - F.col("cum_cb") * F.col("na")).alias("__g"),
        F.abs(F.col("cum_ca").cast(dec) * F.col("nb").cast(dec)
              - F.col("cum_cb").cast(dec) * F.col("na").cast(dec))
         .alias("__gd"),
        "na", "nb")
    nanb = F.col("na").cast("double") * F.col("nb").cast("double")
    in_range = (nanb < F.lit(9.2e18)) & F.lit(not force_decimal)
    # Past DECIMAL(38,0) itself (na·nb ≥ 1e38, ~1e19 rows per side) the
    # cross-products overflow to NULL in non-ANSI Spark and max() would
    # SKIP them — silently understating D.  Fail loud there instead:
    # the decimal branch is exact inside its range, and the range
    # boundary is a guard, not a cliff nobody sees.
    dec_ok = nanb < F.lit(1e38)
    return (gaps.groupBy("na", "nb")
                .agg(F.max("__g").alias("__m"),
                     F.max("__gd").alias("__md"))
                .select(
                    "na", "nb",
                    F.when(in_range,
                           F.round(F.col("__m").cast("double")
                                   / (F.col("na") * F.col("nb")), 6))
                     .when(dec_ok,
                           F.round((F.col("__md")
                                    / (F.col("na").cast(dec)
                                       * F.col("nb").cast(dec)))
                                   .cast("double"), 6))
                     .otherwise(F.raise_error(F.lit(
                         "ks_two_sample: na*nb exceeds DECIMAL(38,0) "
                         "exactness (~1e19 rows per side) — widen the "
                         "cross-multiply before trusting the max")))
                     .alias("ks_stat")))


def auc_exact(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """EXACT ROC AUC via the Mann–Whitney rank form with midrank tie
    handling — the model-quality companion of :func:`ks_two_sample`,
    built on the same distinct-value scale discipline:

        AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻)

    where R⁺ is the sum of positives' average ranks under an ascending
    score ordering.  Per distinct score s with b observations below it,
    t total and p positive AT it, the midrank contribution is
    p·(b + (t+1)/2); doubling clears the half, so

        2·R⁺ = Σ_s p·(2b + t + 1)

    is INTEGER-EXACT, accumulated in DECIMAL(38,0).  No overflow guard
    is needed: 2R⁺ ≤ n(n+1) and Spark's count() caps n at int64
    (~9.2e18), so the decimal accumulation tops out near 8.5e37 —
    strictly inside DECIMAL(38,0) for every row count the engine can
    represent at all.  AUC needs ONE final double division:

        AUC = (2R⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻)

    The cumulative pass runs on the DISTINCT-SCORE grain through
    cumsum_distributed (range-partitioned prefix sums, never a
    single-reducer window).  Returns one row (n_pos, n_neg, auc),
    auc unrounded (bit-identical across engines — every input to the
    division is an exact integer)."""
    require_columns(df, [score_col, label_col], "auc_exact")
    dec = "decimal(38,0)"
    per = (df.groupBy(F.col(score_col).alias("__s"))
             .agg(F.sum(F.col(label_col).cast("long")).alias("p"),
                  F.count(F.lit(1)).alias("t")))
    cum = cumsum_distributed(per, ["__s"], ["t"])
    b = F.col("cum_t") - F.col("t")
    term = (F.col("p").cast(dec)
            * (F.lit(2).cast(dec) * b.cast(dec)
               + F.col("t").cast(dec) + F.lit(1).cast(dec)))
    agg = cum.agg(F.sum(term).alias("r2"),
                  F.sum("p").cast(dec).alias("np"),
                  (F.sum("t") - F.sum("p")).cast(dec).alias("nn"))
    num = (F.col("r2") - F.col("np") * (F.col("np") + F.lit(1).cast(dec)))
    den = F.lit(2).cast(dec) * F.col("np") * F.col("nn")
    return agg.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        (num.cast("double") / den.cast("double")).alias("auc"))


def cusum_range(df: DataFrame, group_col: str, value_cents_col: str,
                order_cols: list[str]) -> DataFrame:
    """Mean-centered cumulative-sum RANGE per group — the classic CUSUM
    change-point signal: walk the ordered series accumulating
    S_t = Σ_{i≤t} (x_i − x̄); a stable series keeps the walk near 0,
    a level shift sends it on a long excursion, and the statistic
    range = max(S, 0) − min(S, 0) (the walk starts at S_0 = 0) grows
    linearly with the post-change run length.

    Exactness: with x as integer cents and group scalars n = count,
    tot = Σx (exact longs from ONE aggregate, broadcast back), the
    scaled term n·x_t − tot is an exact long and S_t·n is its exact
    prefix sum — accumulated as DECIMAL(38,0) (the auc_exact ceiling
    discipline: safe to ~1e38 before the n² growth matters), so the
    ordering-sensitive accumulation never touches a float.  One final
    division by n·100 converts back to value units; both engines
    convert the same decimal to the same double and round at 6.

    Shape: one group aggregate + broadcast join-back, one
    group-partitioned ordered window (parallel across groups — never a
    global window), one closing aggregate.  ``order_cols`` must be a
    unique ordering within each group.  Returns
    (group, n, cusum_range)."""
    require_columns(df, [group_col, value_cents_col, *order_cols],
                    "cusum_range")
    from pyspark.sql import Window
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(value_cents_col).alias("__tot"))
    # promote BEFORE the multiply: n·x at fact scale overflows long
    # well before the decimal ceiling (ANSI would fail loud, but the
    # contract here is exact-to-1e38, not exact-to-1e18)
    term = (F.col("__n").cast("decimal(38,0)") * F.col(value_cents_col)
            - F.col("__tot")).cast("decimal(38,0)")
    w = (Window.partitionBy(group_col)
               .orderBy(*[F.asc(c) for c in order_cols])
               .rowsBetween(Window.unboundedPreceding, 0))
    walked = (df.join(F.broadcast(stats), group_col)
                .withColumn("__s", F.sum(term).over(w)))
    zero = F.lit(0).cast("decimal(38,0)")
    return (walked.groupBy(group_col)
                  .agg(F.max("__n").alias("n"),
                       F.round((F.greatest(F.max("__s"), zero)
                                - F.least(F.min("__s"), zero))
                               .cast("double")
                               / (F.max("__n").cast("double") * 100.0), 6)
                        .alias("cusum_range")))


def wasserstein_two_sample(df: DataFrame, value_cents_col: str,
                           is_a_col: str) -> DataFrame:
    """Exact two-sample Wasserstein-1 (earth-mover) distance over an
    integer-cents value column, samples split by the 0/1 ``is_a_col`` —
    the magnitude-aware drift metric: where KS reports only the largest
    CDF gap, W1 integrates |F_a − F_b| over the value axis, so a small
    shift of a lot of mass and a large shift of a little mass both
    register proportionally.

    For atomic samples, W1 = Σ over consecutive distinct values of
    |F_a(v) − F_b(v)| · (v_next − v).  Everything before the single
    final division is EXACT: per-value cumulative counts via
    cumsum_distributed (distinct-value grain, deterministic-bucket
    prefix sums — no single-reducer window), the cross-multiplied gap
    |cum_a·nb − cum_b·na| in DECIMAL(38,0), times the integer cents
    step.  Neighbor steps cross bucket boundaries via the same
    offsets-table discipline as the prefix sums themselves: lag within
    the bucket, and the first row of each bucket takes the previous
    nonempty bucket's max value from a ``partitions``-row prefix pass.
    The engine accumulates interval terms anchored at the LEFT endpoint
    (|F(prev)|·(v−prev)); the oracle anchors at the right
    (|F(v)|·(next−v)) — algebraically identical, so the hash match
    verifies the telescoping, not a mirrored plan.  Returns one row
    (na, nb, w1) with w1 in value units rounded at 6."""
    require_columns(df, [value_cents_col, is_a_col],
                    "wasserstein_two_sample")
    from pyspark.sql import Window
    per_val = (df.groupBy(F.col(value_cents_col).alias("__v"))
                 .agg(F.sum(is_a_col).alias("ca"),
                      F.sum(1 - F.col(is_a_col)).alias("cb"))
                 .localCheckpoint(eager=True))  # feeds the cumsum AND
    # the gap pass; unpinned, each would re-aggregate the fact
    # keep_pid: the gap pass below reuses the SAME staged relation —
    # one quantile collection, one bucket exchange, not two
    cum = (cumsum_distributed(per_val, ["__v"], ["ca", "cb"],
                              keep_pid=True)
           .localCheckpoint(eager=True))
    w = Window.partitionBy("__pid").orderBy("__v")
    woff = (Window.orderBy("__pid")
                  .rowsBetween(Window.unboundedPreceding, -1))
    prev_last = (cum.groupBy("__pid")
                    .agg(F.max("__v").alias("__last"))
                    .withColumn("__prev_last",
                                F.max("__last").over(woff))
                    .select("__pid", "__prev_last"))
    gaps = (cum.join(F.broadcast(prev_last), "__pid")
               .withColumn("__prev", F.coalesce(F.lag("__v").over(w),
                                                F.col("__prev_last")))
               .filter(F.col("__prev").isNotNull())
               .select(F.col("__prev").alias("__v"),
                       (F.col("__v") - F.col("__prev")).alias("__gap")))
    totals = df.agg(F.sum(is_a_col).alias("na"),
                    F.sum(1 - F.col(is_a_col)).alias("nb"))
    dec = "decimal(38,0)"
    terms = (gaps.join(cum, "__v")
                 .crossJoin(F.broadcast(totals))
                 .select(
                     (F.abs(F.col("cum_ca").cast(dec)
                            * F.col("nb").cast(dec)
                            - F.col("cum_cb").cast(dec)
                            * F.col("na").cast(dec))
                      * F.col("__gap")).alias("__t")))
    # group-less agg so a degenerate input (one distinct value → zero
    # intervals) still yields the (na, nb, 0) row instead of vanishing
    s = terms.agg(F.coalesce(F.sum("__t"), F.lit(0).cast(dec))
                   .alias("__s"))
    return (totals.crossJoin(F.broadcast(s))
                  .select(
                      "na", "nb",
                      F.when((F.col("na") > 0) & (F.col("nb") > 0),
                             F.round(F.col("__s").cast("double")
                                     / (F.col("na").cast("double")
                                        * F.col("nb").cast("double")
                                        * 100.0), 6))
                       .otherwise(F.lit(0.0)).alias("w1")))
