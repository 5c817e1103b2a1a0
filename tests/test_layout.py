"""Storage-layout scale tests: partition pruning and shuffle-free
bucketed joins, asserted on the physical plan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.plans import explain_str
from implementation_of_an_etl_process_spark.sources.sinks import (
    write_bucketed_table,
    write_partitioned_parquet,
)
from tests.conftest import SF_SMOKE


def test_partition_pruning(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned_parquet(orders, path, ["order_year"])
    # partition dirs exist
    years = {d for d in os.listdir(path) if d.startswith("order_year=")}
    assert len(years) >= 5
    pruned = spark.read.parquet(path).filter(F.col("order_year") == 1996)
    plan = explain_str(pruned)
    # planner must prune to a single partition directory
    assert "PartitionFilters" in plan
    assert pruned.count() == orders.filter(F.col("order_year") == 1996).count()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"]
    )
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        n_buckets=8,
        sort_cols=["o_orderkey"],
    )
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, "o_orderkey").groupBy("o_orderstatus").count()
        plan = explain_str(joined)
        # bucketed layout: the join key needs NO exchange anywhere (the
        # only shuffle left is the groupBy on o_orderstatus)
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and it still computes the right answer
        got = {r.o_orderstatus: r["count"] for r in joined.collect()}
        exp = {
            r.o_orderstatus: r["count"]
            for r in lineitem.join(
                orders, lineitem.l_orderkey == orders.o_orderkey
            )
            .groupBy("o_orderstatus")
            .count()
            .collect()
        }
        assert got == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
