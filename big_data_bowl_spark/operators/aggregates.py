"""Aggregation operators (SURVEY §2.4, A1–A18).

All are single hash-aggregations with map-side partial combine; the
"trajectory feature" block computes the reference's entire 15-feature route
table (routes.py:34-172) in ONE groupBy pass instead of pandas' eight
sequential groupby calls — one shuffle, one reduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import nan_to_null
from ..schemas import require_columns


def trajectory_features(df: DataFrame, group: list[str], order: str,
                        x: str, y: str, speed: str | None = None,
                        direction: str | None = None,
                        turn_thresh: float = 30.0) -> DataFrame:
    """A3–A8 fused: per-group ordered-trajectory features
    (engineer_route_features, bdb2026/routes.py:34-172):

    start/end coords (A3, min_by/max_by on the order column — no sort),
    net displacement + path length (A4, lag-diff then sum), speed mean/max/
    std (A5; stddev_samp = pandas ddof=1 default at routes.py:102),
    direction-change count over ``turn_thresh`` degrees with wraparound
    (A6, routes.py:117-126), lateral range (A7), frame count (A8).

    One window pass for the lag diffs + one groupBy — two stages total on a
    single shuffle key.
    """
    require_columns(df, group + [order, x, y], "trajectory_features")
    w = Window.partitionBy(*group).orderBy(order)
    step = F.sqrt(F.pow(F.col(x) - F.lag(x, 1).over(w), 2)
                  + F.pow(F.col(y) - F.lag(y, 1).over(w), 2))
    enriched = df.withColumn("__step", step)
    if direction is not None:
        d = F.abs(F.col(direction) - F.lag(direction, 1).over(w)) % 360
        enriched = enriched.withColumn(
            "__turn", F.when(F.least(d, 360 - d) > turn_thresh, 1).otherwise(0))

    aggs = [
        F.min_by(x, order).alias("start_x"),
        F.min_by(y, order).alias("start_y"),
        F.max_by(x, order).alias("end_x"),
        F.max_by(y, order).alias("end_y"),
        F.sum("__step").alias("path_length"),
        (F.max(y) - F.min(y)).alias("lateral_range"),
        F.count(F.lit(1)).alias("n_frames"),
    ]
    if speed is not None:
        aggs += [F.avg(speed).alias("speed_mean"),
                 F.max(speed).alias("speed_max"),
                 F.stddev_samp(speed).alias("speed_std")]
    if direction is not None:
        aggs.append(F.sum("__turn").alias("direction_changes"))
    out = enriched.groupBy(*group).agg(*aggs)
    return out.withColumn(
        "net_displacement",
        F.sqrt(F.pow(F.col("end_x") - F.col("start_x"), 2)
               + F.pow(F.col("end_y") - F.col("start_y"), 2)))


def scalar_threshold(df: DataFrame, agg: Column, alias: str = "__threshold") -> DataFrame:
    """A13: a global scalar aggregate broadcast against every row —
    the ``max()*0.5`` volume-threshold idiom (metrics.py:329-330).  A
    1-row crossJoin(broadcast(...)) keeps the whole thing in one job
    (no ``.first()`` round-trip through the driver)."""
    return df.crossJoin(F.broadcast(df.agg(agg.alias(alias))))


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """A15: frequency table (notebook ``value_counts`` everywhere)."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias("count")) \
             .orderBy(F.desc("count"), F.asc(col))


def group_stats(df: DataFrame, group: list[str], col: str,
                ddof: int = 1) -> DataFrame:
    """A5/A14 summary block: mean/max/min/std/median per group; exact median
    (Spark `median` interpolates like DuckDB quantile_cont)."""
    std = F.stddev_samp(col) if ddof == 1 else F.stddev_pop(col)
    return df.groupBy(*group).agg(
        F.avg(col).alias("mean"),
        F.max(col).alias("max"),
        F.min(col).alias("min"),
        nan_to_null(std).alias("std"),
        F.median(col).alias("median"),
        F.count(col).alias("n"),
    )


def ols_slope(df: DataFrame, group: list[str], x: str, y: str) -> DataFrame:
    """A18: Pearson r and OLS slope/intercept from covariance aggregates
    (np.polyfit(deg=1) at viz.py:431-436) — pure SQL aggregates, no MLlib
    needed for a 1-D trendline."""
    slope = F.covar_samp(x, y) / F.var_samp(x)
    return df.groupBy(*group).agg(
        nan_to_null(F.corr(x, y)).alias("pearson_r"),
        slope.alias("slope"),
        (F.avg(y) - slope * F.avg(x)).alias("intercept"),
        F.count(F.lit(1)).alias("n"),
    )


def equidepth_bins(df: DataFrame, col: str, n_bins: int = 10,
                   keep: tuple[str, ...] = ()) -> DataFrame:
    """Equi-depth (quantile) binning: assign each row the bucket between
    the exact (k/n)-quantile thresholds — the feature-engineering
    discretizer ntile() would need a global sort for.

    Two-phase instead: ONE exact-percentile aggregate produces the n−1
    thresholds (rounded to 6 so engines agree at bucket edges), the 1-row
    result broadcasts back, and the bucket index is an in-row count of
    thresholds strictly below the value — a map-only second pass, no
    global ordering anywhere.  Ties at a threshold go to the LOWER bucket
    on both engines (strict <).

    Unlike ntile, equal values always share a bucket (depth balance
    yields to value equality — the property you want for reproducible
    features).  Returns df's ``keep`` columns + (col, bin 1..n_bins)."""
    require_columns(df, [col, *keep], "equidepth_bins")
    fracs = [k / n_bins for k in range(1, n_bins)]
    thr = df.agg(F.transform(
        F.percentile(col, F.array(*[F.lit(f) for f in fracs])),
        lambda t: F.round(t, 6)).alias("__thr"))
    bucket = (F.size(F.filter(F.col("__thr"),
                              lambda t: t < F.col(col)))
              + 1).cast("long")
    return (df.select(*keep, col)
              .crossJoin(F.broadcast(thr))
              .select(*keep, col, bucket.alias("bin")))


def cooccurrence_pairs(df: DataFrame, group_col: str, item_col: str,
                       max_items_per_group: int | None = None) -> DataFrame:
    """Item co-occurrence counts (market-basket / co-click analysis):
    for every unordered item pair sharing a group, how many groups
    contain both.  Distinct (group, item) first, then a self-equi-join on
    the group with ``item_a < item_b`` — per-group fan-out is
    C(items-in-group, 2), so cost scales with group sizes, not corpus
    size (the J6 bounded-quadratic discipline; pass
    ``max_items_per_group`` to fail loud on degenerate groups).
    Returns (item_a, item_b, n_groups)."""
    require_columns(df, [group_col, item_col], "cooccurrence_pairs")
    items = df.select(group_col, item_col).distinct()
    if max_items_per_group is not None:
        from .checks import check_group_cardinality
        items = check_group_cardinality(items, [group_col],
                                        max_items_per_group)
    return _item_pair_counts(items, group_col, item_col)


def _item_pair_counts(items: DataFrame, group_col: str,
                      item_col: str) -> DataFrame:
    """Unordered within-group pair counts from an ALREADY-DISTINCT
    (group, item) relation — shared by cooccurrence_pairs and
    basket_lift so the latter derives pairs from the same relation its
    probabilities use (one distinct, not two)."""
    a = items.select(F.col(group_col).alias("__g"),
                     F.col(item_col).alias("item_a"))
    b = items.select(F.col(group_col).alias("__g"),
                     F.col(item_col).alias("item_b"))
    return (a.join(b, "__g")
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("n_groups")))


def basket_lift(df: DataFrame, group_col: str, item_col: str,
                min_pair_groups: int = 1) -> DataFrame:
    """Association metrics over the co-occurrence pairs: support, the
    two DIRECTIONAL confidences conf(a→b)=P(b|a) and conf(b→a)=P(a|b),
    and lift for every unordered item pair — the market-basket rules
    layer on :func:`cooccurrence_pairs`.  Both directions are emitted
    explicitly (not a max) so a consumer reading "confidence" can never
    over-read an undirected score as a directional rule strength.
    The per-item group counts and the total group count are item-grain /
    1-row tables broadcast onto the pairs; lift = P(ab)/(P(a)·P(b)) with
    every probability computed from the SAME distinct (group, item)
    relation, so numerators and denominators cannot drift.  Returns
    (item_a, item_b, n_ab, support, conf_ab, conf_ba, lift)."""
    require_columns(df, [group_col, item_col], "basket_lift")
    items = df.select(group_col, item_col).distinct()
    # pairs, item counts, and the total all derive from this ONE
    # distinct relation — one fact scan + one dedup exchange, which the
    # plan's ReusedExchange then shares across the three consumers
    pairs = _item_pair_counts(items, group_col, item_col) \
        .filter(F.col("n_groups") >= min_pair_groups)
    per_item = items.groupBy(item_col).agg(
        F.count(F.lit(1)).alias("__n_item"))
    total = items.select(group_col).distinct().agg(
        F.count(F.lit(1)).alias("__n_total"))
    out = (pairs
           .join(F.broadcast(per_item.select(
               F.col(item_col).alias("item_a"),
               F.col("__n_item").alias("__na"))), "item_a")
           .join(F.broadcast(per_item.select(
               F.col(item_col).alias("item_b"),
               F.col("__n_item").alias("__nb"))), "item_b")
           .crossJoin(F.broadcast(total)))
    n_ab = F.col("n_groups").cast("double")
    return out.select(
        "item_a", "item_b",
        F.col("n_groups").alias("n_ab"),
        F.round(n_ab / F.col("__n_total"), 6).alias("support"),
        F.round(n_ab / F.col("__na"), 6).alias("conf_ab"),
        F.round(n_ab / F.col("__nb"), 6).alias("conf_ba"),
        F.round(n_ab * F.col("__n_total")
                / (F.col("__na") * F.col("__nb")), 6).alias("lift"))


def transition_matrix(df: DataFrame, group_col: str, state_col: str,
                      order_cols: list[str]) -> DataFrame:
    """First-order Markov transition counts + probabilities over ordered
    per-group state sequences (user-journey analysis): lag the state
    within each group, count (prev, next) pairs, normalize per prev
    state.  One window shuffle on the group key; the per-prev totals are
    a states²-row aggregate broadcast back (never a whole-partition
    window).  Returns (prev_state, next_state, n, p)."""
    require_columns(df, [group_col, state_col, *order_cols],
                    "transition_matrix")
    w = Window.partitionBy(group_col).orderBy(*[F.asc(c) for c in order_cols])
    pairs = (df.withColumn("__prev", F.lag(F.col(state_col)).over(w))
               .filter(F.col("__prev").isNotNull())
               .groupBy(F.col("__prev").alias("prev_state"),
                        F.col(state_col).alias("next_state"))
               .agg(F.count(F.lit(1)).alias("n")))
    totals = pairs.groupBy("prev_state").agg(F.sum("n").alias("__tot"))
    return (pairs.join(F.broadcast(totals), "prev_state")
                 .select("prev_state", "next_state", "n",
                         F.round(F.col("n") / F.col("__tot"), 6).alias("p")))


def mutual_information(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Mutual information (and normalized MI) between two categorical
    columns — the feature-relevance / redundancy score a feature-selection
    pass computes for every candidate column pair:

        I(X;Y) = Σ_xy p(x,y) · ln( p(x,y) / (p(x)·p(y)) )
        NMI    = I(X;Y) / sqrt(H(X)·H(Y))        (0 when either H is 0)

    Shape: ONE scan of the fact table collapses to the joint-count grain
    (|X|·|Y| rows, one shuffle with map-side combine); the cell table is
    pinned (``localCheckpoint`` — it has four consumers: both marginals,
    the total, and the term join, and without the pin each subtree
    re-scans the fact table) so both marginals and the grand total derive
    from the tiny counts table and the fact table is scanned exactly
    once.  The marginal joins broadcast (cell table is
    category-bounded, independent of corpus size), so at 100 TB the cost
    is exactly one aggregate over the raw rows.

    Float discipline: every p·ln(p...) term rounds at 9 digits BEFORE the
    sums (the q_group_entropy precedent) so addition order across engines
    cannot flip the 6-digit outputs.  Returns a single row
    (n, mi, h_x, h_y, nmi).
    """
    require_columns(df, [col_x, col_y], "mutual_information")
    joint = (df.groupBy(col_x, col_y)
               .agg(F.count(F.lit(1)).alias("n_xy"))
               .localCheckpoint(eager=True))
    mx = joint.groupBy(col_x).agg(F.sum("n_xy").alias("n_x"))
    my = joint.groupBy(col_y).agg(F.sum("n_xy").alias("n_y"))
    tot = joint.agg(F.sum("n_xy").alias("n"))
    cells = (joint.join(F.broadcast(mx), col_x)
                  .join(F.broadcast(my), col_y)
                  .crossJoin(F.broadcast(tot)))
    n = F.col("n").cast("double")
    p_xy = F.col("n_xy").cast("double") / n
    p_x = F.col("n_x").cast("double") / n
    p_y = F.col("n_y").cast("double") / n
    mi_agg = (cells.select(
        "n",
        F.round(p_xy * F.log(p_xy / (p_x * p_y)), 9).alias("__mi_t"))
        .groupBy("n")
        .agg(F.round(F.sum("__mi_t"), 6).alias("mi")))

    # marginal entropies straight off the (already tiny) marginal
    # tables — |X| + |Y| rounded terms instead of |X|·|Y| weighted ones
    def _entropy(marg: DataFrame, cnt: str, out: str) -> DataFrame:
        p = F.col(cnt).cast("double") / n
        return (marg.crossJoin(F.broadcast(tot))
                    .select(F.round(-p * F.log(p), 9).alias("__t"))
                    .agg(F.round(F.sum("__t"), 6).alias(out)))

    hx = _entropy(mx, "n_x", "h_x")
    hy = _entropy(my, "n_y", "h_y")
    agg = (mi_agg.crossJoin(F.broadcast(hx))
                 .crossJoin(F.broadcast(hy)))
    return agg.select(
        "n", "mi", "h_x", "h_y",
        F.when((F.col("h_x") > 0) & (F.col("h_y") > 0),
               F.round(F.col("mi")
                       / F.sqrt(F.col("h_x") * F.col("h_y")), 6))
         .otherwise(F.lit(0.0)).alias("nmi"))


def item_similarity(df: DataFrame, group_col: str, item_col: str,
                    min_pair_groups: int = 1,
                    max_items_per_group: int | None = None) -> DataFrame:
    """Item-item similarity from co-occurrence — the candidate-generation
    step of an item-based recommender ("users who bought A also bought
    B"): for every unordered item pair, cosine and Jaccard over the sets
    of groups (baskets/users) containing each item:

        cosine  = n_ab / sqrt(n_a · n_b)
        jaccard = n_ab / (n_a + n_b − n_ab)

    Same one-distinct-relation discipline as :func:`basket_lift`: pairs
    come from the bounded within-group self-join (fan-out C(basket, 2) —
    pass ``max_items_per_group`` to fail loud on degenerate baskets),
    per-item group counts broadcast onto the pair table (item-grain,
    catalog-bounded).  ``min_pair_groups`` prunes the long tail BEFORE
    the count joins, so at 100 TB the surviving table is the
    co-purchase graph, never the catalog cross product.  Similarities
    are per-row scalar math on exact long counts (identical expression
    in the oracle — no float sums).  Returns
    (item_a, item_b, n_ab, n_a, n_b, cosine, jaccard)."""
    require_columns(df, [group_col, item_col], "item_similarity")
    items = df.select(group_col, item_col).distinct()
    if max_items_per_group is not None:
        from .checks import check_group_cardinality
        items = check_group_cardinality(items, [group_col],
                                        max_items_per_group)
    pairs = _item_pair_counts(items, group_col, item_col) \
        .filter(F.col("n_groups") >= min_pair_groups)
    per_item = items.groupBy(item_col).agg(
        F.count(F.lit(1)).alias("__n_item"))
    out = (pairs
           .join(F.broadcast(per_item.select(
               F.col(item_col).alias("item_a"),
               F.col("__n_item").alias("n_a"))), "item_a")
           .join(F.broadcast(per_item.select(
               F.col(item_col).alias("item_b"),
               F.col("__n_item").alias("n_b"))), "item_b"))
    n_ab = F.col("n_groups").cast("double")
    return out.select(
        "item_a", "item_b", F.col("n_groups").alias("n_ab"), "n_a", "n_b",
        F.round(n_ab / F.sqrt((F.col("n_a") * F.col("n_b"))
                              .cast("double")), 6).alias("cosine"),
        F.round(n_ab / (F.col("n_a") + F.col("n_b")
                        - F.col("n_groups")).cast("double"), 6)
         .alias("jaccard"))


def frequent_triples(df: DataFrame, group_col: str, item_col: str,
                     min_support: float = 0.003) -> DataFrame:
    """Frequent 3-itemsets with level-wise Apriori pruning (Agrawal &
    Srikant 1994) — the next rung above :func:`basket_lift`'s pairs.

    Level-wise shape: L1 (frequent items) filters the distinct
    (group, item) relation BEFORE any self-join, so the triple
    enumeration's per-basket fan-out is C(frequent-items-per-basket, 3),
    not C(basket-size, 3); L2 (frequent pairs) then prunes candidate
    triples map-side via three broadcast semi-joins before the count
    aggregate, bounding the shuffled candidate stream.  By support
    monotonicity the prune NEVER changes the result (a triple at
    support θ has every sub-pair at ≥ θ) — it exists purely to cut the
    candidate volume, which is why the oracle can verify with a direct
    count-and-threshold formulation.  For catalogs where the frequent-
    pair set outgrows broadcast range, move the pair prune AFTER the
    triple aggregate (triple-grain, post-shuffle, small) — same result,
    one knob.

    Support thresholds compare exact long counts against
    ``min_support · n_baskets`` as one IEEE double product on both
    engines.  Returns (item_a, item_b, item_c, n_abc, support)."""
    require_columns(df, [group_col, item_col], "frequent_triples")
    # the distinct relation feeds the basket total, L1, and the L1
    # semi-join — pin it so the upstream join+dedup runs once (its
    # absence measured 9s vs ~4s at sf0.1).  All four pins here are
    # LAZY (r14): every consumer lives in the one terminal job, so an
    # eager count-to-materialize job per pin was pure latency —
    # q_frequent_triples 5.06→3.51s interleaved min-of-3 at sf0.1,
    # output exceptAll-identical (the pagerank lazy-pin discipline)
    items = (df.select(group_col, item_col).distinct()
               .localCheckpoint(eager=False))
    total = (items.select(group_col).distinct()
                  .agg(F.count(F.lit(1)).alias("__nb")))
    thr = F.lit(float(min_support)) * F.col("__nb").cast("double")
    f1 = (items.groupBy(item_col)
               .agg(F.count(F.lit(1)).alias("__n1"))
               .crossJoin(F.broadcast(total))
               .filter(F.col("__n1").cast("double") >= thr)
               .select(item_col))
    # L1-filtered relation feeds the pair count AND the triple
    # enumeration's three sides — pin it once
    bf = (items.join(F.broadcast(f1), item_col, "left_semi")
               .localCheckpoint(eager=False))
    a = bf.select(F.col(group_col).alias("__g"),
                  F.col(item_col).alias("item_a"))
    b = bf.select(F.col(group_col).alias("__g"),
                  F.col(item_col).alias("item_b"))
    c = bf.select(F.col(group_col).alias("__g"),
                  F.col(item_col).alias("item_c"))
    # the per-basket ordered pair stream feeds the L2 count AND the
    # triple enumeration — pin it so the a⋈b join runs once
    ab = (a.join(b, "__g")
           .filter(F.col("item_a") < F.col("item_b"))
           .localCheckpoint(eager=False))
    f2 = (ab.groupBy("item_a", "item_b")
           .agg(F.count(F.lit(1)).alias("__n2"))
           .crossJoin(F.broadcast(total))
           .filter(F.col("__n2").cast("double") >= thr)
           .select("item_a", "item_b")
           .localCheckpoint(eager=False))  # three prune consumers
    f2_ac = f2.select("item_a", F.col("item_b").alias("item_c"))
    f2_bc = f2.select(F.col("item_a").alias("item_b"),
                      F.col("item_b").alias("item_c"))
    tri = (ab.join(c, "__g").filter(F.col("item_b") < F.col("item_c"))
            .join(F.broadcast(f2), ["item_a", "item_b"], "left_semi")
            .join(F.broadcast(f2_ac), ["item_a", "item_c"], "left_semi")
            .join(F.broadcast(f2_bc), ["item_b", "item_c"], "left_semi")
            .groupBy("item_a", "item_b", "item_c")
            .agg(F.count(F.lit(1)).alias("n_abc")))
    return (tri.crossJoin(F.broadcast(total))
               .filter(F.col("n_abc").cast("double") >= thr)
               .select("item_a", "item_b", "item_c", "n_abc",
                       F.round(F.col("n_abc").cast("double")
                               / F.col("__nb").cast("double"), 6)
                        .alias("support")))


def theil_sen_bounded(series: DataFrame, d_col: str, r_col: str,
                      max_grain: int = 50_000) -> DataFrame:
    """Theil–Sen estimator over a BOUNDED-grain integer series — one
    Spark job, one Arrow task.

    The input grain must be bounded by something other than the corpus
    (q_theil_sen's day grain is bounded by the calendar: ~2.4k days at
    ANY scale factor, so the quadratic pair set ceilings at ~2.9M).
    That bound is what licenses the shape here: the WHOLE estimator —
    pairwise slopes, exact slope median, residual median intercept —
    runs in ONE single-group ``applyInPandas`` task (numpy outer
    differences), so the query is a single job: scan → day aggregate →
    1-group exchange → Arrow batch → 1 row out.  The r10 form paid ~6
    fixed-latency jobs (two localCheckpoints + histogram-selection's
    scans) to keep 2.9M slope rows distributed — the right shape for an
    UNBOUNDED grain (compose ``median_distributed`` over the pair join,
    kept and property-tested as the documented scale path), pure
    overhead for a calendar-bounded one.

    RUNTIME GUARD (r12): the bounded-grain precondition is ENFORCED,
    not just documented — the operator is public API, and a caller
    passing an unbounded grain (user_id, doc_id) would get a silent
    single-task OOM (O(n²) numpy outer differences) instead of the
    documented scale path.  One cheap ``count()`` of the input grain
    runs before the 1-group exchange; above ``max_grain`` (default
    50k ⇒ ~1.25G pairs ≈ 10 GB of float64 slopes — already past what
    one Arrow task should hold) the call fails loud with a pointer to
    the ``median_distributed``-over-pair-join composition.  This is
    the ``nearest_in_group`` ``max_group`` discipline (SURVEY §4.3
    item 3): count the grain first, refuse the non-scalable shape.

    Value parity with the distributed form is bit-exact: slopes divide
    the same float64 cent/day deltas; medians take the mean of the two
    middle order statistics (quantile_cont 0.5); the slope rounds
    HALF-UP at 6 like ``F.round`` (java BigDecimal semantics,
    reproduced via ``decimal`` on ``repr`` — the shortest round-trip
    decimal both runtimes print) before the residual pass.

    ``r_col`` must be exact integer units (cents — see
    ``functions.scalar.cents``); returns 1 row (n_pairs, sen_slope,
    n_days, intercept) with both estimates rounded at 6.
    """
    require_columns(series, [d_col, r_col], "theil_sen_bounded")
    n_grain = series.count()
    if n_grain > max_grain:
        raise ValueError(
            f"theil_sen_bounded: input grain has {n_grain} rows > "
            f"max_grain={max_grain}; the single-task numpy estimator "
            f"is O(n^2) in the grain and would OOM one Arrow task. "
            f"For an unbounded grain, compose the pair join with "
            f"operators.windows.median_distributed (the documented "
            f"distributed form), or pre-aggregate to a bounded grain "
            f"(calendar days, buckets) before calling this.")

    def _round_half_up6(x: float) -> float:
        from decimal import ROUND_HALF_UP, Decimal
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))

    def fit(pdf):
        import numpy as np
        import pandas as pd

        d = pdf["__d"].to_numpy(dtype=np.int64)
        r = pdf["__r"].to_numpy(dtype=np.int64)
        order = np.argsort(d)
        d, r = d[order], r[order]
        n = int(len(d))
        iu, ju = np.triu_indices(n, k=1)
        # float64 of int64 cents/days is exact far past this grain;
        # the divisions are the same IEEE ops the column form ran
        s = ((r[ju] - r[iu]).astype(np.float64)
             / (d[ju] - d[iu]).astype(np.float64) / 100.0)
        s.sort()
        m = int(len(s))
        med = (s[(m + 1) // 2 - 1] + s[m // 2 + 1 - 1]) / 2.0
        sen = _round_half_up6(med)
        e = np.sort(r.astype(np.float64) / 100.0
                    - sen * d.astype(np.float64))
        icpt = (e[(n + 1) // 2 - 1] + e[n // 2 + 1 - 1]) / 2.0
        return pd.DataFrame([{"n_pairs": m, "sen_slope": sen,
                              "n_days": n,
                              "intercept": _round_half_up6(icpt)}])

    one = series.select(F.col(d_col).cast("long").alias("__d"),
                        F.col(r_col).cast("long").alias("__r"),
                        F.lit(1).alias("__one"))
    return (one.groupBy("__one")
               .applyInPandas(fit, "n_pairs long, sen_slope double, "
                                   "n_days long, intercept double"))
