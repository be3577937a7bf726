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


def test_sql_quota_sample_equals_dataframe_api(spark):
    """The r6 quota sampler is plain SQL too: the neutral hash chain,
    the per-source running sum, and the budget cut as one SQL text —
    same rows as the pipeline operator."""
    load_catalog(spark, SF_SMALL)
    sql = spark.sql("""
        WITH h0 AS (
            SELECT source, doc_id, n_chars,
                   pmod(pmod(doc_id, 2147483648) * 2654435761,
                        4294967296) AS hv
            FROM documents),
        h1 AS (SELECT source, doc_id, n_chars,
                      pmod((hv ^ shiftright(hv, 16)) * 73244475,
                           4294967296) AS hv FROM h0),
        h2 AS (SELECT source, doc_id, n_chars,
                      pmod((hv ^ shiftright(hv, 16)) * 73244475,
                           4294967296) AS hv FROM h1),
        h AS (SELECT source, doc_id, n_chars,
                     hv ^ shiftright(hv, 16) AS hv FROM h2),
        c AS (SELECT source, doc_id, n_chars,
                     sum(n_chars) OVER (PARTITION BY source
                                        ORDER BY hv, doc_id) AS cum
              FROM h)
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_kept
        FROM c WHERE cum <= 400
        GROUP BY source""")
    from pyspark.sql import functions as F

    from big_data_bowl_spark.pipeline.sampling import quota_sample
    from big_data_bowl_spark.sources.io import read_table
    d = read_table(spark, SF_SMALL, "documents")
    api = (quota_sample(d, "source", "doc_id", "n_chars", 400)
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.col("n_chars").cast("long")).alias("chars_kept")))
    assert _rows(sql) == _rows(api)
