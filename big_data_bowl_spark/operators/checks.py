"""Data-quality checks (SURVEY §5.1 → §7.2 item 8).

The reference enforces correctness with inline notebook assertion cells:
one-route-per-play uniqueness, no-NaN embeddings, feature-range bounds,
cluster-id validity (notebooks/BDB_2026.ipynb#cell53), tensor NaN and
padding-mask audits (#cell88), missing-value / outlier scans
(#cell23,#cell77).  Here each becomes a reusable check over a DataFrame
that computes ONE distributed aggregate pass (violation counts + a small
sample of offending rows) and fails loud — no ``collect()`` of the data,
so a check costs a scan at 100 TB, never driver memory.

Checks return the input frame on success so they chain inside pipelines:
``df = check_unique(check_no_nulls(df, cols), keys)``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns

_SAMPLE = 5


class DataQualityError(ValueError):
    """A data-quality check failed; message carries counts + samples."""


def _fail(name: str, n_bad: int, sample_df: DataFrame) -> None:
    rows = [tuple(r) for r in sample_df.limit(_SAMPLE).collect()]
    raise DataQualityError(
        f"{name}: {n_bad} violating rows; sample (≤{_SAMPLE}): {rows}")


def check_unique(df: DataFrame, keys: list[str],
                 name: str = "check_unique") -> DataFrame:
    """One row per key (e.g. one route per (game, play) —
    BDB_2026.ipynb#cell53's ``groupby(...).size()==1`` assertion)."""
    require_columns(df, keys, name)
    dupes = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
               .filter(F.col("n") > 1))
    n_bad = dupes.count()
    if n_bad:
        _fail(name, n_bad, dupes)
    return df


def check_no_nulls(df: DataFrame, cols: list[str],
                   name: str = "check_no_nulls") -> DataFrame:
    """No nulls/NaNs in the given columns (no-NaN embedding assertion,
    #cell53; post-imputation NaN guard, routes.py:209-211)."""
    require_columns(df, cols, name)
    dtypes = dict(df.dtypes)
    preds = [F.col(c).isNull() | (F.isnan(c) if dtypes[c] in ("float", "double")
                                  else F.lit(False)) for c in cols]
    bad = df.filter(reduce(lambda a, b: a | b, preds))
    n_bad = bad.count()
    if n_bad:
        _fail(name, n_bad, bad.select(*cols))
    return df


def check_in_range(df: DataFrame, col: str, lo: float, hi: float,
                   name: str = "check_in_range") -> DataFrame:
    """Feature-range bound (−20 ≤ route_depth ≤ 80 class of assertion,
    #cell53; speed ≤ 15 yd/s outlier scan, #cell23).  Nulls pass — pair
    with :func:`check_no_nulls` when they must not."""
    require_columns(df, [col], name)
    bad = df.filter(F.col(col).isNotNull()
                    & ((F.col(col) < lo) | (F.col(col) > hi)))
    n_bad = bad.count()
    if n_bad:
        _fail(f"{name}[{lo},{hi}]", n_bad, bad.select(col))
    return df


def check_values_in(df: DataFrame, col: str, allowed: list,
                    name: str = "check_values_in") -> DataFrame:
    """Categorical validity (cluster ids ∈ 0..k−1, #cell53)."""
    require_columns(df, [col], name)
    bad = df.filter(~F.col(col).isin(allowed) | F.col(col).isNull())
    n_bad = bad.count()
    if n_bad:
        _fail(name, n_bad, bad.select(col))
    return df


def check_group_cardinality(df: DataFrame, keys: list[str], max_n: int,
                            name: str = "check_group_cardinality") -> DataFrame:
    """No group exceeds ``max_n`` rows — the SURVEY §4.3 item-3 guard for
    the within-group cross join (J6/J8): the per-play pair fan-out is only
    safe because groups are bounded (≤22 players per frame key in the
    reference); an unbounded group turns the equi-join quadratic."""
    require_columns(df, keys, name)
    big = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") > max_n))
    n_bad = big.count()
    if n_bad:
        _fail(f"{name}[max={max_n}]", n_bad, big)
    return df


def check_nonempty(df: DataFrame, name: str = "check_nonempty") -> DataFrame:
    """Fail on an empty frame — the 0-row inner-join guard
    (preprocess.py:547-549) as a standalone check."""
    if df.isEmpty():
        raise DataQualityError(f"{name}: frame is empty (0 rows)")
    return df


def attach_observation(df: DataFrame, metrics: dict[str, "F.Column"],
                       name: str = "quality"):
    """Zero-extra-pass quality metrics: ``df.observe`` rides whatever
    action next materializes the frame, accumulating the named aggregate
    expressions on the executors as rows stream by — at 100 TB this is
    the difference between 'checks cost one more full scan' (every
    ``check_*`` above) and 'checks are free with the write'.

    Returns ``(observed_df, observation)``; read ``observation.get``
    AFTER an action on the returned frame.  Use the ``violations``
    helper for count-of-bad-rows metrics."""
    from pyspark.sql import Observation
    obs = Observation(name)
    return df.observe(obs, *[c.alias(k) for k, c in metrics.items()]), obs


def violations(cond: "F.Column") -> "F.Column":
    """Count of rows violating ``cond`` (i.e. where it is false or null)
    — the standard metric expression for :func:`attach_observation`."""
    return F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1))


def referential_profile(edges: list[tuple[str, DataFrame, list[str],
                                          DataFrame, list[str]]]) -> DataFrame:
    """Foreign-key integrity profile across a star/snowflake schema: for
    each declared (name, fact, fact_keys, dim, dim_keys) edge, the fact
    row count, the rows whose key has NO match in the dimension
    (orphans), and the rows with a NULL key — the referential-health
    report a warehouse runs before trusting its joins (a non-zero orphan
    count silently DROPS rows from every inner join downstream).

    Unlike the fail-loud checks above this is a PROFILE: it returns one
    row per edge instead of raising, so a pipeline can gate on
    thresholds (``pct_orphans < 0.001``) rather than absolutes.

    Shape per edge: ONE scan — the fact's key columns left-join the
    DISTINCT dimension keys carrying a hit marker (dimension-grain, so
    AQE broadcasts every dimension that fits; a fact-scale "dimension"
    degrades to a shuffled join — still one exchange each side), and one
    aggregate classifies every row as null-key / orphan / linked in the
    same pass.  An orphan is a NON-NULL key with no parent (a NULL key
    is its own category — it can never match, but it isn't a broken
    reference).  Edges evaluate independently (the result is a union of
    1-row aggregates), so nothing serializes at scale.  Returns
    (relation, n_rows, n_null_keys, n_orphans)."""
    outs = []
    for name, fact, fkeys, dim, dkeys in edges:
        require_columns(fact, fkeys, f"referential_profile[{name}]")
        require_columns(dim, dkeys, f"referential_profile[{name}]")
        null_key = reduce(lambda a, b: a | b,
                          [F.col(c).isNull() for c in fkeys])
        d_keys = (dim.select(*[F.col(d).alias(k)
                               for k, d in zip(fkeys, dkeys)])
                     .distinct()
                     .withColumn("__hit", F.lit(1)))
        j = fact.select(*fkeys).join(d_keys, fkeys, "left")
        outs.append(j.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(null_key, 1).otherwise(0)).alias("n_null_keys"),
            F.sum(F.when((~null_key) & F.col("__hit").isNull(), 1)
                   .otherwise(0)).alias("n_orphans"))
            .select(F.lit(name).alias("relation"),
                    "n_rows", "n_null_keys", "n_orphans"))
    return reduce(lambda a, b: a.unionByName(b), outs)


def anonymity_profile(df: DataFrame, quasi_cols: list[str],
                      sensitive_col: str,
                      k_threshold: int = 5) -> DataFrame:
    """k-anonymity / l-diversity risk profile — the privacy audit a
    governed warehouse runs before releasing a dataset: group by the
    quasi-identifier columns (the attributes an attacker can link
    externally), report each equivalence class's size (k) and its
    count of DISTINCT sensitive values (l), and flag classes below the
    k threshold.  A released table is k-anonymous iff no class is
    flagged, and l-diverse iff min(l_distinct) ≥ l — both read directly
    off this profile.

    One aggregate with map-side partial combine (the distinct count is
    exact per class — class cardinality is the quantity under audit, so
    a sketch would be self-defeating); class count is bounded by the
    quasi-identifier domain product, not the table.  A PROFILE like
    :func:`referential_profile`, not a fail-loud check: suppression /
    generalization policy belongs to the caller.  Returns
    (*quasi_cols, class_size, l_distinct, at_risk)."""
    require_columns(df, [*quasi_cols, sensitive_col], "anonymity_profile")
    return (df.groupBy(*quasi_cols)
              .agg(F.count(F.lit(1)).alias("class_size"),
                   F.countDistinct(sensitive_col).alias("l_distinct"))
              .withColumn("at_risk",
                          F.col("class_size") < F.lit(k_threshold)))


def fd_profile(candidates: list[tuple[str, DataFrame, list[str],
                                      str]]) -> DataFrame:
    """Approximate functional-dependency profile: for each candidate FD
    ``determinant → dependent`` (name, df, det_cols, dep_col), how close
    the data comes to satisfying it — the schema-discovery /
    normalization report profilers (Metanome's TANE family) produce, as
    a tolerance PROFILE rather than a boolean, because real warehouses
    hold FDs only approximately (g3-style error: the share of rows
    sitting in determinant groups that map to more than one dependent
    value).

    Shape per candidate: ONE shuffle to the determinant grain (count +
    exact distinct-dependent per group), then a tiny group-grain
    summary; candidates evaluate independently and union, so nothing
    serializes.  NULL dependents don't count as a distinct value
    (countDistinct semantics — a NULL reference is a missing fact, not
    a conflicting one).

    Returns (fd, n_groups, n_violating_groups, n_rows,
    violation_row_share) — share rounded at 6, one row per candidate."""
    if not candidates:
        raise ValueError("fd_profile: empty candidate list — nothing "
                         "to profile (check the caller's FD config)")
    outs = []
    for name, df, det_cols, dep_col in candidates:
        require_columns(df, det_cols + [dep_col], f"fd_profile[{name}]")
        g = (df.groupBy(*det_cols)
               .agg(F.count(F.lit(1)).alias("__n"),
                    F.countDistinct(dep_col).alias("__nd")))
        viol = F.col("__nd") > 1
        outs.append(g.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(viol, 1).otherwise(0)).alias("n_violating_groups"),
            F.sum("__n").alias("n_rows"),
            F.round(F.sum(F.when(viol, F.col("__n")).otherwise(0))
                     .cast("double") / F.sum("__n").cast("double"), 6)
             .alias("violation_row_share"))
            .select(F.lit(name).alias("fd"), "n_groups",
                    "n_violating_groups", "n_rows", "violation_row_share"))
    return reduce(lambda a, b: a.unionByName(b), outs)


def expectation_report(df: DataFrame,
                       expectations: list[tuple[str, str, object]]
                       ) -> DataFrame:
    """Declarative data-contract report (the Deequ/Great-Expectations
    shape on the module's fail-loud primitives): run a list of named
    expectations against one relation and emit (check, observed,
    threshold, passed) per row — a PROFILE like referential_profile, so
    pipelines gate on the report instead of dying mid-plan.

    Supported kinds (name, kind, arg):
      ("events nonempty",  "min_rows",       n)        observed = count
      ("value nulls",      "max_null_share", (col, s)) observed = share
      ("event_id unique",  "unique",         [cols])   observed = dupes
      ("value range",      "in_range",       (col, lo, hi))
                                                       observed = out-of-range rows
      ("type domain",      "allowed",        (col, [values]))
                                                       observed = bad rows

    Each expectation is ONE independent aggregate over the relation
    (counts are exact longs; shares one long/long division) and the
    report is their union — nothing serializes, and a caller that
    pins ``df`` pays one scan per check, the price of independent
    verdicts.  Returns (check, observed, threshold, passed)."""
    if not expectations:
        raise ValueError("expectation_report: empty expectation list")
    outs = []
    for name, kind, arg in expectations:
        if kind == "min_rows":
            agg = df.agg(F.count(F.lit(1)).cast("double")
                          .alias("observed"))
            thr, passed = float(arg), F.col("observed") >= float(arg)
        elif kind == "max_null_share":
            # every sum-based observed coalesces to 0 so an EMPTY
            # relation yields a real verdict, not passed=NULL that a
            # ~passed gate would silently wave through (review finding)
            col, share = arg
            agg = df.agg(F.coalesce(
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"), F.lit(0.0))
                .alias("observed"))
            thr, passed = float(share), F.col("observed") <= float(share)
        elif kind == "unique":
            agg = (df.groupBy(*arg).agg(F.count(F.lit(1)).alias("__c"))
                     .agg(F.coalesce(
                         F.sum(F.when(F.col("__c") > 1,
                                      F.col("__c") - 1).otherwise(0)),
                         F.lit(0)).cast("double").alias("observed")))
            thr, passed = 0.0, F.col("observed") <= 0
        elif kind == "in_range":
            col, lo, hi = arg
            agg = df.agg(F.coalesce(
                F.sum(F.when(F.col(col).isNotNull()
                             & ((F.col(col) < lo)
                                | (F.col(col) > hi)), 1)
                       .otherwise(0)), F.lit(0)).cast("double")
                .alias("observed"))
            thr, passed = 0.0, F.col("observed") <= 0
        elif kind == "allowed":
            col, values = arg
            agg = df.agg(F.coalesce(
                F.sum(F.when(F.col(col).isNotNull()
                             & ~F.col(col).isin(*values), 1)
                       .otherwise(0)), F.lit(0)).cast("double")
                .alias("observed"))
            thr, passed = 0.0, F.col("observed") <= 0
        else:
            raise ValueError(f"expectation_report: unknown kind {kind!r}")
        outs.append(agg.select(
            F.lit(name).alias("check"),
            F.round(F.col("observed"), 6).alias("observed"),
            F.lit(thr).alias("threshold"),
            passed.alias("passed")))
    return reduce(lambda a, b: a.unionByName(b), outs)
