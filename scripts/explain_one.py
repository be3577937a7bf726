"""Dump one query's .explain("formatted") to stdout — the per-change
plan-evidence helper for plans/r14/ (the committed before/after files the
judge checks claims against).  Usage:

    python scripts/explain_one.py q_name [sf_dir] > plans/r14/q_name_X.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    from big_data_bowl_spark.queries import QUERIES

    spark = (SparkSession.builder.master("local[4]")
             .appName("explain-one")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.autoBroadcastJoinThreshold",
                     str(64 * 1024 * 1024))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[name](spark, sf_dir)
    df.explain("formatted")


if __name__ == "__main__":
    main()
