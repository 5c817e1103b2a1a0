"""Plan-quality tests: the physical plans the engine should produce —
pushdown, pruning, broadcast joins, no stray shuffles. Catching a plan
regression here is catching a 100x cost at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.plans import explain_str
from implementation_of_an_etl_process_spark.queries import relational as R
from tests.conftest import SF_ORACLE


def test_hypercube_plan_shape(spark):
    plan = explain_str(R.hypercube(spark, SF_ORACLE))
    # dims broadcast, fact streamed (tree section lists "... Inner ...")
    assert plan.count("BroadcastHashJoin Inner") == 3
    assert "SortMergeJoin" not in plan
    # no Expand: the two-level distinct rewrite is in effect
    assert "Expand" not in plan


def test_q1_scan_pruning_and_pushdown(spark):
    plan = explain_str(R.q1_pricing_summary(spark, SF_ORACLE))
    # the shipdate filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the 7 needed columns are read
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    for col in ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"]:
        assert col in read_schema
    assert "l_orderkey" not in read_schema  # not needed by Q1


def test_semi_join_plans_as_semi(spark):
    plan = explain_str(R.semi_join_customers(spark, SF_ORACLE))
    assert "LeftSemi" in plan


def test_whole_stage_codegen_covers_aggregate(spark):
    # AQE hides codegen stars until execution; disable it to inspect the
    # statically-planned codegen spans ("*(n)" markers in simple mode)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = explain_str(R.q1_pricing_summary(spark, SF_ORACLE), mode="simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "*(" in plan, plan
    # scan -> filter -> partial aggregate fused into one codegen stage
    assert "HashAggregate" in plan.split("Exchange")[-1], plan


def test_events_scan_prunes_props(spark):
    plan = explain_str(R.events_sessionize(spark, SF_ORACLE))
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "props" not in read_schema  # sessionize never reads the JSON blob
    assert "value" not in read_schema
