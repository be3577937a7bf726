"""Early warning for testdata regeneration drift: the driver rebuilds
/root/testdata between rounds and physical types have CHANGED before
(round 1: TIMESTAMP(NANOS); round 2: micros inferred as TIMESTAMP_NTZ —
which broke cast-to-double and rc=1'd the bench).  This test pins the
NORMALIZED dtypes every query was validated against, so drift fails here
with a named column instead of mid-query."""

from __future__ import annotations

import pytest

from big_data_bowl_spark.sources.io import TEST_TABLE_NAMES, read_table

from tests.conftest import SF_SMALL

EXPECTED = {
    "events": {"event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
               "event_type": "string", "value": "double", "props": "string"},
    "orders": {"o_orderkey": "bigint", "o_custkey": "bigint",
               "o_orderstatus": "string", "o_totalprice": "double",
               "o_orderdate": "timestamp", "o_orderpriority": "string"},
    "lineitem": {"l_orderkey": "bigint", "l_quantity": "double",
                 "l_extendedprice": "double", "l_discount": "double",
                 "l_shipdate": "timestamp"},
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string",
                  "source": "string", "n_chars": "bigint"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>",
                   "label": "int"},
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_normalized_dtypes_stable(spark, table):
    got = dict(read_table(spark, SF_SMALL, table).dtypes)
    for col, want in EXPECTED[table].items():
        assert got.get(col) == want, (
            f"{table}.{col}: read_table now yields {got.get(col)!r}, "
            f"queries were validated against {want!r} — testdata "
            f"regeneration drift; extend sources/io.py normalization "
            f"(see the dtype notes in sources/io.py:read_table)")


def test_all_tables_readable(spark):
    for t in TEST_TABLE_NAMES:
        assert read_table(spark, SF_SMALL, t).limit(1).count() >= 0
