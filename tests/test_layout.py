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


def test_zorder_write_skips_row_groups_in_both_dimensions(spark, tmp_path):
    """Z-order clustering: after a Morton-code sort on
    (o_custkey, o_totalprice), parquet min/max stats must let a narrow
    filter on EITHER column skip most row groups — the property a
    single-column sort only gives its leading column."""
    import pyarrow.parquet as pq

    from implementation_of_an_etl_process_spark.sources.sinks import (
        write_zordered_parquet,
    )

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    path = str(tmp_path / "orders_z")
    write_zordered_parquet(
        orders, path, ["o_custkey", "o_totalprice"], n_files=16
    )

    groups = []  # (cust_min, cust_max, price_min, price_max)
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            stats = {
                row.column(i).path_in_schema: row.column(i).statistics
                for i in range(row.num_columns)
            }
            groups.append(
                (
                    stats["o_custkey"].min,
                    stats["o_custkey"].max,
                    stats["o_totalprice"].min,
                    stats["o_totalprice"].max,
                )
            )
    assert len(groups) >= 8

    lo_c, hi_c = orders.agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).first()
    lo_p, hi_p = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).first()
    # a 5%-wide slice in each dimension
    c_a, c_b = lo_c, lo_c + (hi_c - lo_c) * 0.05
    p_a, p_b = lo_p, lo_p + (hi_p - lo_p) * 0.05
    cust_hit = sum(1 for g in groups if g[0] <= c_b and g[1] >= c_a)
    price_hit = sum(1 for g in groups if g[2] <= p_b and g[3] >= p_a)
    assert cust_hit / len(groups) <= 0.5, (cust_hit, len(groups))
    assert price_hit / len(groups) <= 0.5, (price_hit, len(groups))
    # layout-only: the data itself is unchanged
    assert spark.read.parquet(path).count() == orders.count()
