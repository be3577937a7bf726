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
