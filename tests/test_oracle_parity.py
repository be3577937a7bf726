"""Replicates the driver's t2 gate locally: every query in QUERIES with an
oracle must match DuckDB on row count, sorted column names, and an
order-insensitive value multiset (nulls normalized, floats pre-rounded by
the queries themselves).
"""

from __future__ import annotations

import math

import pytest

from big_data_bowl_spark.oracles import ORACLES
from big_data_bowl_spark.queries import QUERIES

from tests.conftest import SF_SMALL


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = None
                else:
                    v = round(v, 6)
                    if v == -0.0:
                        v = 0.0
            if v is not None and not isinstance(v, (str, bool)):
                try:
                    as_int = int(v)
                    v = as_int if as_int == v else float(v)
                except (TypeError, ValueError):
                    v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    assert name in QUERIES, f"oracle {name} has no Spark query"
    sdf = QUERIES[name](spark, SF_SMALL)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} "
        f"duck={sorted(duck_cols)}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")

    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mism = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mism, f"{name}: first value mismatches: {mism[:5]}"


def test_all_queries_run(spark):
    """Queries without oracles still must execute and return rows."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMALL)
        assert df.count() >= 0, name
