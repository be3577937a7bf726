"""Hand-fixture tests for the as-of join and skew operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_bowl_spark.operators.asof import asof_join
from big_data_bowl_spark.operators.ranges import interval_join
from big_data_bowl_spark.operators.skew import salted_agg, salted_broadcast_join
from big_data_bowl_spark.sources.io import read_table

from tests.conftest import SF_SMALL


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_backward_match(spark):
    left = spark.createDataFrame([
        Row(k=1, ts=_ts(10), lval="a"),
        Row(k=1, ts=_ts(20), lval="b"),
        Row(k=2, ts=_ts(5), lval="c"),     # no prior right row → null
    ])
    right = spark.createDataFrame([
        Row(k=1, ts=_ts(5), rv=100.0),
        Row(k=1, ts=_ts(15), rv=200.0),
        Row(k=2, ts=_ts(30), rv=300.0),    # after the left row
    ])
    out = {(r.k, r.lval): r.rv_asof
           for r in asof_join(left, right, ["k"], "ts", ["rv"]).collect()}
    assert out[(1, "a")] == 100.0   # latest right ≤ 00:10 is 00:05
    assert out[(1, "b")] == 200.0   # 00:15 beats 00:05
    assert out[(2, "c")] is None    # nothing at-or-before 00:05


def test_asof_exact_ts_inclusive(spark):
    left = spark.createDataFrame([Row(k=1, ts=_ts(10), lval="x")])
    right = spark.createDataFrame([Row(k=1, ts=_ts(10), rv=7.0)])
    out = asof_join(left, right, ["k"], "ts", ["rv"]).first()
    assert out.rv_asof == 7.0       # right row at exactly left.ts matches


def test_asof_keeps_all_left_rows(spark):
    e = read_table(spark, SF_SMALL, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view") \
             .select("user_id", "ts", "value")
    out = asof_join(purchases, views, ["user_id"], "ts", ["value"])
    assert out.count() == purchases.count()


def test_salted_agg_equals_direct(spark):
    e = read_table(spark, SF_SMALL, "events")
    salted = {r.event_type: r for r in
              salted_agg(e, ["event_type"], "value", n_salts=16).collect()}
    direct = {r.event_type: r for r in
              e.groupBy("event_type").agg(
                  F.sum("value").alias("total"),
                  F.count("value").alias("n"),
                  F.min("value").alias("min"),
                  F.max("value").alias("max"),
                  F.avg("value").alias("mean")).collect()}
    assert salted.keys() == direct.keys()
    for k in direct:
        assert salted[k].n == direct[k].n
        assert salted[k].min == direct[k].min
        assert salted[k].max == direct[k].max
        assert abs(salted[k].total - direct[k].total) < 1e-6
        assert abs(salted[k].mean - direct[k].mean) < 1e-9


def test_salted_broadcast_join_equals_plain(spark):
    e = read_table(spark, SF_SMALL, "events")
    dim = spark.createDataFrame(
        [Row(event_type=t, weight=i + 1.0)
         for i, t in enumerate(["click", "error", "purchase", "signup", "view"])])
    salted = salted_broadcast_join(e, dim, "event_type", n_salts=4) \
        .select("event_id", "weight")
    plain = e.join(dim, "event_type", "left").select("event_id", "weight")
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, plain.collect()))


# ---------------------------------------------------------------------------
# interval (range) join
# ---------------------------------------------------------------------------

def _ij_fixture(spark):
    left = spark.createDataFrame([
        Row(k=1, ts=_ts(10), ev="a"),
        Row(k=1, ts=_ts(20), ev="b"),
        Row(k=1, ts=_ts(31), ev="c"),      # 1 min outside every window
        Row(k=2, ts=_ts(10), ev="d"),      # right key, wrong interval
    ])
    right = spark.createDataFrame([
        Row(k=1, s=_ts(5), e=_ts(25), tag="w1"),   # catches a, b
        Row(k=1, s=_ts(20), e=_ts(30), tag="w2"),  # catches b (boundary)
        Row(k=2, s=_ts(40), e=_ts(50), tag="w3"),  # catches nothing
    ])
    return left, right


def _pairs(df):
    return sorted((r.ev, r.tag) for r in df.collect())


def test_interval_join_containment(spark):
    left, right = _ij_fixture(spark)
    out = interval_join(left, right, left_ts="ts", right_start="s",
                        right_end="e", on=[("k", "k")], payload=["tag"])
    # both interval ends inclusive; boundary row b ∈ w2 at exactly s=20
    assert _pairs(out) == [("a", "w1"), ("b", "w1"), ("b", "w2")]


def test_interval_join_bucketed_equals_naive(spark):
    """The bucketed plan is an optimization, never a semantics change —
    identical pairs for bucket widths far smaller and far larger than the
    interval length, and for the no-equi-key (pure overlap) case."""
    left, right = _ij_fixture(spark)
    naive = _pairs(interval_join(
        left, right, left_ts="ts", right_start="s", right_end="e",
        on=[("k", "k")], payload=["tag"], bucket_seconds=None))
    for width in (60, 300, 86400):
        got = _pairs(interval_join(
            left, right, left_ts="ts", right_start="s", right_end="e",
            on=[("k", "k")], payload=["tag"], bucket_seconds=width))
        assert got == naive, width
    no_keys_naive = _pairs(interval_join(
        left, right, left_ts="ts", right_start="s", right_end="e",
        on=[], payload=["tag"], bucket_seconds=None))
    no_keys_bucketed = _pairs(interval_join(
        left, right, left_ts="ts", right_start="s", right_end="e",
        on=[], payload=["tag"], bucket_seconds=300))
    assert no_keys_bucketed == no_keys_naive


def test_interval_join_bucketing_removes_nested_loop(spark):
    """With no equi keys the naive plan can only be a nested-loop cross
    product; the bucket column gives Catalyst an equi-join key, which is
    the entire point of the strategy at 100 TB."""
    left, right = _ij_fixture(spark)
    naive = interval_join(left, right, left_ts="ts", right_start="s",
                          right_end="e", on=[], payload=["tag"],
                          bucket_seconds=None)
    bucketed = interval_join(left, right, left_ts="ts", right_start="s",
                             right_end="e", on=[], payload=["tag"],
                             bucket_seconds=300)
    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()
    quadratic = ("NestedLoop", "CartesianProduct")
    assert any(q in plan(naive) for q in quadratic)
    assert not any(q in plan(bucketed) for q in quadratic)
