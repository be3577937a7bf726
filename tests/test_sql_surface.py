"""The engine is usable from pure SQL: load_catalog registers every table
as a temp view, and Spark SQL text produces exactly the DataFrame API's
results (same plans underneath — proves the declarative surface is
complete, not DataFrame-only)."""

from __future__ import annotations

from big_data_bowl_spark.queries import QUERIES
from big_data_bowl_spark.sources.io import load_catalog

from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_text_equals_dataframe_api(spark):
    load_catalog(spark, SF_SMALL)
    sql = spark.sql("""
        SELECT event_id, user_id,
               round(coalesce(value - lag(value) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 6)
               AS dvalue
        FROM events""")
    assert _rows(sql) == _rows(QUERIES["q_frame_diff"](spark, SF_SMALL))


def test_sql_join_agg_rank_equals_dataframe_api(spark):
    load_catalog(spark, SF_SMALL)
    sql = spark.sql("""
        WITH board AS (
            SELECT user_id, avg(value) AS mean_value,
                   count(*) AS n_events
            FROM events GROUP BY user_id)
        SELECT user_id, round(mean_value, 6) AS mean_value, n_events,
               rank() OVER (ORDER BY mean_value DESC) AS rank
        FROM board""")
    assert _rows(sql) == _rows(QUERIES["q_rank_leaderboard"](spark, SF_SMALL))
