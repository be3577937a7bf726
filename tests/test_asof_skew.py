"""Hand-fixture tests for the as-of join and skew operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_bowl_spark.operators.asof import asof_join
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
