"""Spark 4 custom Python DataSource: deterministic synthetic events."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_bowl_spark.sources.synthetic import SyntheticEventsDataSource


def _load(spark, rows, parts):
    spark.dataSource.register(SyntheticEventsDataSource)
    return (spark.read.format("synthetic_events")
            .option("rows", rows).option("partitions", parts).load())


def test_synthetic_source_parallel_and_deterministic(spark):
    df = _load(spark, 5000, 8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 5000
    assert df.select("event_id").distinct().count() == 5000
    # same content regardless of the partition layout
    a = df.agg(F.sum(F.hash(*df.columns)).alias("h")).collect()[0]["h"]
    b = (_load(spark, 5000, 3)
         .agg(F.sum(F.hash(*df.columns)).alias("h")).collect()[0]["h"])
    assert a == b
    types = {r["event_type"] for r in df.select("event_type").distinct().collect()}
    assert types == {"click", "error", "purchase", "signup", "view"}
