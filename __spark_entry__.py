"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY §7.3: scan → window →
join → agg → rank) at sf0.001.  ``queries()`` / ``oracle_sql()`` expose the
full correctness suite from ``big_data_bowl_spark.queries`` /
``big_data_bowl_spark.oracles`` — every pair shares column names, types,
rounding, and tie-breaks so the driver's order-insensitive value-hash
matches.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_bowl_spark.oracles import ORACLES  # noqa: E402
from big_data_bowl_spark.queries import QUERIES  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_flagship_truespeed"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys without an oracle (probabilistic ops) get
    the driver's weaker rows-only check."""
    return dict(ORACLES)
