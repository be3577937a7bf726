"""Physical-plan quality gates (SURVEY §4): these assert the *shape* of the
plan, not the result — the properties that decide whether a query survives
a 100× scale-up.

- filters/projections reach the parquet scan (PushedFilters / ReadSchema)
- small dimensions broadcast (BroadcastHashJoin, no shuffle of the fact)
- compatible windows share one shuffle (single Exchange for same keys)
- whole-stage codegen covers the expression work
"""

from __future__ import annotations

from big_data_bowl_spark.queries import QUERIES

from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMALL)
    return spark._jvm.org.apache.spark.sql.execution.debug \
        .package__ if False else df._sc._jvm.PythonSQLUtils \
        .explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark):
    plan = _formatted(spark, "q_filter_project")
    assert "PushedFilters: [" in plan
    # the pushed filter list must actually contain our predicates
    assert "l_returnflag" in plan.split("PushedFilters")[1][:200]


def test_projection_prunes_scan_columns(spark):
    plan = _formatted(spark, "q_filter_project")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the needed columns are read — not l_comment/l_tax/l_shipdate etc.
    assert "l_tax" not in read_schema
    assert "l_orderkey" in read_schema


def test_flagship_broadcasts_dimension(spark):
    plan = _plan(spark, "q_flagship_truespeed")
    assert "BroadcastHashJoin" in plan


def test_tpch_q5_broadcasts_all_dimensions(spark):
    plan = _plan(spark, "q_tpch_q5")
    # every dimension join is broadcast: the only SortMergeJoin permitted is
    # lineitem⋈orders (the two fact tables)
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1


def test_semi_join_stays_semi(spark):
    plan = _plan(spark, "q_semi_join")
    assert "LeftSemi" in plan


def test_window_chain_single_shuffle(spark):
    """q_cum_index runs two windows over the same partition keys — they
    must share ONE hash exchange on user_id, not re-shuffle."""
    plan = _plan(spark, "q_cum_index")
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_whole_stage_codegen_present(spark):
    df = QUERIES["q_tpch_q1"](spark, SF_SMALL)
    df.collect()  # AQE finalizes THIS df's plan only when it executes
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # codegen stages print as `*(n) Operator` in the finalized tree
    assert "*(" in plan


def test_sequence_build_single_shuffle(spark):
    plan = _plan(spark, "q_sequence_build")
    assert plan.count("Exchange hashpartitioning(user_id") <= 1
