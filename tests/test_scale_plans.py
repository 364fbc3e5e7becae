"""Physical-plan assertions: the scale properties SCALE.md claims must
be visible in the executed plans, not just asserted in prose.

These tests lock in: filter/column pushdown to the Parquet scan,
broadcast choice for dim joins, map-side partial aggregation, top-k
compiling to TakeOrderedAndProject / WindowGroupLimit rank pushdown,
and the bucketed join running with no Exchange on the join path.
"""

from __future__ import annotations

import re

import pytest

from weather_etl_spark.registry import load_all

SPECS = load_all()


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_scan_info(df) -> str:
    # formatted explain includes PushedFilters / ReadSchema per scan
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    df = SPECS["q_agg_q1"].fn(spark, sf_dir)
    plan = _optimized_scan_info(df)
    assert "PushedFilters:" in plan and "LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the referenced columns only
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "l_orderkey" not in m.group(1), "scan reads unused columns"


def test_q1_partial_aggregation_before_exchange(spark, sf_dir):
    plan = _executed_plan(SPECS["q_agg_q1"].fn(spark, sf_dir))
    assert "partial_sum" in plan, "no map-side partial aggregation"
    assert plan.index("partial_sum") > plan.index("Exchange"), (
        "partial agg must run below (after in tree order) the exchange"
    )


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _executed_plan(SPECS["q_join_star"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_global_topk_is_take_ordered(spark, sf_dir):
    plan = _executed_plan(SPECS["q_topk_global"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_grouped_topk_uses_rank_limit_pushdown(spark, sf_dir):
    plan = _executed_plan(SPECS["q_topk_group"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan.split("WindowGroupLimit")[-1] or (
        plan.count("WindowGroupLimit") >= 2
    ), "expected map-side partial rank limit"


def test_bucketed_join_has_no_exchange_on_join_path(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = SPECS["q_join_bucketed"].fn(spark, sf_dir)
        plan = _executed_plan(df)
        join_part = plan.split("Join")[1] if "Join" in plan else plan
        # The only allowed Exchange is the final tiny group-by on
        # o_orderstatus ABOVE the join; below the join: none.
        below_join = plan[plan.index("MergeJoin"):] if "MergeJoin" in plan else join_part
        assert "Exchange" not in below_join, (
            "bucketed join must read co-located buckets without shuffling"
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_knn_broadcasts_probe_set(spark, sf_dir):
    plan = _executed_plan(SPECS["q_llm_knn"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        "kNN must broadcast the bounded probe side"
    )


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    df = SPECS["q_join_dpp"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "dynamicpruning" in plan or "DynamicPruning" in plan, (
        "fact scan must carry a runtime partition-pruning subquery"
    )
