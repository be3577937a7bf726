"""Data-quality check functions (SURVEY §5.1 assertions as reusable ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

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
