"""Data-quality check functions (SURVEY §5.1 assertions as reusable ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_bowl_spark.operators.checks import (
    DataQualityError,
    check_in_range,
    check_no_nulls,
    check_nonempty,
    check_unique,
    check_values_in,
)


def _df(spark):
    return spark.createDataFrame([
        Row(g=1, p=1, v=1.0, c=0),
        Row(g=1, p=2, v=2.5, c=1),
        Row(g=2, p=1, v=3.0, c=2),
    ])


def test_checks_pass_and_chain(spark):
    df = _df(spark)
    out = check_unique(
        check_no_nulls(
            check_in_range(
                check_values_in(check_nonempty(df), "c", [0, 1, 2]),
                "v", 0.0, 10.0),
            ["g", "p", "v"]),
        ["g", "p"])
    assert out is df  # checks return the input frame for chaining


def test_check_unique_fails_on_dupes(spark):
    df = _df(spark).union(_df(spark).limit(1))
    with pytest.raises(DataQualityError, match="check_unique: 1"):
        check_unique(df, ["g", "p"])


def test_check_no_nulls_catches_null_and_nan(spark):
    df = spark.createDataFrame([Row(v=1.0), Row(v=None), Row(v=float("nan"))])
    with pytest.raises(DataQualityError, match="check_no_nulls: 2"):
        check_no_nulls(df, ["v"])


def test_check_in_range_bounds(spark):
    with pytest.raises(DataQualityError, match=r"\[0.0,2.0\]: 2"):
        check_in_range(_df(spark), "v", 0.0, 2.0)


def test_check_values_in(spark):
    with pytest.raises(DataQualityError, match="check_values_in: 1"):
        check_values_in(_df(spark), "c", [0, 1])


def test_check_nonempty(spark):
    with pytest.raises(DataQualityError, match="0 rows"):
        check_nonempty(_df(spark).filter("g > 99"))


def test_check_group_cardinality(spark):
    df = _df(spark)
    from big_data_bowl_spark.operators.checks import check_group_cardinality
    assert check_group_cardinality(df, ["g"], max_n=2) is df
    with pytest.raises(DataQualityError, match="check_group_cardinality"):
        check_group_cardinality(df, ["g"], max_n=1)


def test_nearest_in_group_guard_fails_loud_on_oversized_group(spark):
    """SURVEY §4.3 item 3: the within-group cross join is only safe for
    bounded groups — the in-plan assert_true guard must fail the job the
    moment a group exceeds max_group, and pass untouched below it."""
    from pyspark.sql import functions as F

    from big_data_bowl_spark.operators.joins import nearest_in_group

    left = spark.createDataFrame([Row(k=1, i=1, x=0.0), Row(k=1, i=2, x=5.0)])
    right = spark.createDataFrame(
        [Row(k=1, y=float(v)) for v in range(25)])  # 25 > a 22-player bound
    dist = F.abs(F.col("l.x") - F.col("r.y"))
    ok = nearest_in_group(left, right, ["k"], "i", dist, max_group=30)
    assert {r.i: r.min_dist for r in ok.collect()} == {1: 0.0, 2: 0.0}
    bad = nearest_in_group(left, right, ["k"], "i", dist, max_group=22)
    with pytest.raises(Exception, match="max_group"):
        bad.collect()


# ---------------------------------------------------------------------------
# Bloom-filter semi-join prune
# ---------------------------------------------------------------------------

def test_bloom_semi_join_exact_and_pruning(spark):
    """The Bloom prefilter never loses a true match (no false negatives)
    and the final semi-join removes false positives — result identical to
    the plain semi-join; and the prefilter genuinely prunes (survivor
    count << fact count at this selectivity)."""
    from big_data_bowl_spark.operators.joins import bloom_build, bloom_semi_join
    from big_data_bowl_spark.sources.io import read_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    l = read_table(spark, SF_SMALL, "lineitem")
    o = read_table(spark, SF_SMALL, "orders")
    keys = (o.filter(F.col("o_totalprice") > 450000)
             .select(F.col("o_orderkey").alias("l_orderkey")))
    got = sorted(r["l_orderkey"] for r in
                 bloom_semi_join(l, keys, "l_orderkey")
                 .select("l_orderkey").collect())
    want = sorted(r["l_orderkey"] for r in
                  l.join(keys.distinct(), "l_orderkey", "left_semi")
                   .select("l_orderkey").collect())
    assert got == want and len(want) > 0
    # the bits table is bounded by m_words regardless of key count
    assert bloom_build(keys, "l_orderkey", m_words=64).count() <= 64


def test_bloom_prefilter_joins_broadcast(spark):
    """Scale shape: all k bloom probes are BroadcastHashJoins of the
    constant-size word table — the fact is never shuffled for the
    prefilter."""
    from big_data_bowl_spark.operators.joins import bloom_semi_join
    from big_data_bowl_spark.plans import executed_plan
    from big_data_bowl_spark.sources.io import read_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    l = read_table(spark, SF_SMALL, "lineitem")
    o = read_table(spark, SF_SMALL, "orders")
    keys = (o.filter(F.col("o_totalprice") > 450000)
             .select(F.col("o_orderkey").alias("l_orderkey")))
    plan = executed_plan(bloom_semi_join(l, keys, "l_orderkey", k=4))
    assert plan.count("BroadcastHashJoin") >= 4, plan


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def test_cms_never_underestimates_and_prefilter_is_exact(spark):
    """CMS invariant: estimate ≥ true count for every value; and the
    heavy-hitter prefilter result equals the exact GROUP BY/HAVING."""
    from big_data_bowl_spark.operators.sketches import (
        cms_build, cms_heavy_hitters, with_cms_estimate)
    from big_data_bowl_spark.sources.io import read_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    l = read_table(spark, SF_SMALL, "lineitem").select("l_partkey")
    truth = {r["l_partkey"]: r["n"] for r in
             l.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    cms = cms_build(l, "l_partkey", w=256, d=4)  # small w → collisions
    distinct = l.distinct()
    est = {r["l_partkey"]: r["cms_est"] for r in
           with_cms_estimate(distinct, cms, "l_partkey", w=256, d=4)
           .collect()}
    assert all(est[k] >= truth[k] for k in truth), "CMS underestimated"

    hh = {r["l_partkey"]: r["n"] for r in
          cms_heavy_hitters(l, "l_partkey", min_count=5, w=256, d=4)
          .collect()}
    want = {k: n for k, n in truth.items() if n >= 5}
    assert hh == want


def test_cms_table_bounded_and_probes_broadcast(spark):
    """The counter table never exceeds d·w rows and every probe join is
    a BroadcastHashJoin — the fact side is not shuffled for estimation."""
    from big_data_bowl_spark.operators.sketches import cms_build, with_cms_estimate
    from big_data_bowl_spark.plans import executed_plan
    from big_data_bowl_spark.sources.io import read_table
    from tests.conftest import SF_SMALL

    l = read_table(spark, SF_SMALL, "lineitem").select("l_partkey")
    cms = cms_build(l, "l_partkey", w=64, d=3)
    assert cms.count() <= 64 * 3
    plan = executed_plan(with_cms_estimate(l, cms, "l_partkey", w=64, d=3))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_attach_observation_free_metrics(spark):
    """Metrics accumulate on the SAME action that materializes the frame
    (no second scan) and report exact violation counts."""
    from big_data_bowl_spark.operators.checks import (
        attach_observation, violations)
    from big_data_bowl_spark.sources.io import read_table
    from tests.conftest import SF_SMALL
    e = read_table(spark, SF_SMALL, "events")
    observed, obs = attach_observation(e, {
        "n_rows": F.count(F.lit(1)),
        "null_values": violations(F.col("value").isNotNull()),
        "bad_types": violations(F.col("event_type").isin(
            "click", "error", "purchase", "signup", "view")),
    })
    n = observed.count()  # the one action; metrics ride it
    got = obs.get
    assert got["n_rows"] == n
    assert got["bad_types"] == 0
    expected_nulls = e.filter(F.col("value").isNull()).count()
    assert got["null_values"] == expected_nulls


def test_fd_profile_counts_planted_violations(spark):
    """fd_profile counts exactly the planted violating groups/rows and
    reports zero for a holding FD; NULL dependents don't violate."""
    from big_data_bowl_spark.operators.checks import fd_profile
    rows = [
        # det=1 maps to a,a        -> holds (2 rows)
        (1, "a"), (1, "a"),
        # det=2 maps to a,b,b      -> violates (3 rows)
        (2, "a"), (2, "b"), (2, "b"),
        # det=3 maps to c,NULL     -> holds (NULL not distinct-counted)
        (3, "c"), (3, None),
    ]
    df = spark.createDataFrame(rows, "k long, v string")
    out = {r.fd: r for r in fd_profile([
        ("k -> v", df, ["k"], "v"),
        ("v -> k", df, ["v"], "k"),
    ]).collect()}
    r = out["k -> v"]
    assert (r.n_groups, r.n_violating_groups, r.n_rows) == (3, 1, 7)
    assert r.violation_row_share == round(3 / 7, 6)
    # v -> k: groups a{1,1,2} violates(3 rows incl a), b{2,2} holds,
    # c{3} holds, NULL{3} group: count(*) counts it, 1 distinct k
    r2 = out["v -> k"]
    assert (r2.n_groups, r2.n_violating_groups) == (4, 1)


def test_expectation_report_verdicts(spark):
    """Each expectation kind passes/fails on planted data, with the
    observed value it claims."""
    from big_data_bowl_spark.operators.checks import expectation_report
    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", None), (2, "a", 50.0)],
        "k long, t string, v double")
    got = {r.check: (r.observed, r.passed)
           for r in expectation_report(df, [
               ("rows", "min_rows", 5),
               ("v nulls", "max_null_share", ("v", 0.5)),
               ("k unique", "unique", ["k"]),
               ("v range", "in_range", ("v", 0.0, 10.0)),
               ("t domain", "allowed", ("t", ["a"])),
           ]).collect()}
    assert got["rows"] == (3.0, False)
    assert got["v nulls"] == (round(1 / 3, 6), True)
    assert got["k unique"] == (1.0, False)    # k=1 twice -> 1 extra row
    assert got["v range"] == (1.0, False)     # 50.0 out of range
    assert got["t domain"] == (1.0, False)    # 'b' not allowed
    import pytest as _pytest
    with _pytest.raises(ValueError, match="empty expectation"):
        expectation_report(df, [])


def test_expectation_report_empty_relation_has_real_verdicts(spark):
    """Sum-based expectations on an EMPTY relation coalesce to 0 and
    return true booleans — never passed=NULL a ~passed gate would
    silently wave through."""
    from big_data_bowl_spark.operators.checks import expectation_report
    df = spark.createDataFrame([], "k long, t string, v double")
    got = {r.check: (r.observed, r.passed)
           for r in expectation_report(df, [
               ("rows", "min_rows", 1),
               ("v nulls", "max_null_share", ("v", 0.5)),
               ("k unique", "unique", ["k"]),
               ("v range", "in_range", ("v", 0.0, 10.0)),
               ("t domain", "allowed", ("t", ["a"])),
           ]).collect()}
    assert got["rows"] == (0.0, False)
    for name in ("v nulls", "k unique", "v range", "t domain"):
        assert got[name] == (0.0, True), (name, got[name])


def test_theil_sen_bounded_guard_refuses_unbounded_grain(spark):
    """r12 (VERDICT item 2): the single-task O(n^2) estimator must
    count its grain first and fail loud above max_grain with a pointer
    to the distributed composition — the nearest_in_group max_group
    discipline applied to the other single-task operator."""
    from big_data_bowl_spark.operators.aggregates import theil_sen_bounded

    series = spark.range(40).select(
        F.col("id").alias("d"), (F.col("id") * 3 + 7).alias("r"))
    ok = theil_sen_bounded(series, "d", "r").collect()[0]
    assert ok.sen_slope == pytest.approx(0.03)  # cents/day -> /100
    assert ok.n_days == 40 and ok.n_pairs == 40 * 39 // 2
    with pytest.raises(ValueError, match="median_distributed"):
        theil_sen_bounded(series, "d", "r", max_grain=39)
