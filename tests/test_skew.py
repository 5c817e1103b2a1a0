"""Salting operators must be result-equivalent to their unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators import skew


def _skewed(spark):
    """90% of rows share one key."""
    return spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
        .alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_group_sum_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        r.k: (r.v_sum, r.cnt)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("v_sum"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    salted = {
        r.k: (r.v, r.cnt)
        for r in skew.salted_group_sum(
            df, ["k"], ["v"], n_salts=8, count_alias="cnt"
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][1] == salted[k][1]
        assert abs(plain[k][0] - salted[k][0]) < 1e-6


def test_salted_join_equals_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", 1), ("k1", 2), ("k42", 3)], ["k", "tag"]
    )
    plain = big.join(small, "k").groupBy("k", "tag").count()
    salted = skew.salted_join(big, small, "k", n_salts=8).groupBy("k", "tag").count()
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in salted.collect()
    }


def test_salted_left_join_keeps_unmatched(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("HOT", 1)], ["k", "tag"])
    out = skew.salted_join(big, small, "k", n_salts=4, how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("tag").isNull()).count() == big.filter(
        F.col("k") != "HOT"
    ).count()


def test_approx_distinct_error_bound(spark):
    """HLL++ at rsd=0.02 must land within ~6% of exact on real data."""
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    exact = orders.select(F.countDistinct("o_custkey")).first()[0]
    approx = orders.select(
        F.approx_count_distinct("o_custkey", 0.02)
    ).first()[0]
    assert abs(approx - exact) / exact < 0.06
