"""Property-based tests (SURVEY.md §5.3): partitioning invariance of
deterministic aggregation, dedup invariance under duplication, and the
rolling hash against a pure-Python reference."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.functions.text_exprs import (
    HASH_BASE,
    HASH_MOD,
    rolling_hash,
)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=200,
    ),
    n_parts=st.sampled_from([1, 3, 17]),
)
@_slow
def test_decimal_sum_partitioning_invariant(spark, values, n_parts):
    """The decimal-accumulate-to-double sum must not depend on how rows
    are partitioned (the property plain double sums lack)."""
    df = spark.createDataFrame([(v,) for v in values], "v double")
    out = (
        df.repartition(n_parts)
        .agg(F.sum(F.col("v").cast("decimal(24,6)")).cast("double").alias("s"))
        .first()["s"]
    )
    single = (
        df.coalesce(1)
        .agg(F.sum(F.col("v").cast("decimal(24,6)")).cast("double").alias("s"))
        .first()["s"]
    )
    assert out == single  # bitwise, not approx


@given(text=st.text(alphabet=st.characters(codec="ascii"), max_size=300))
@_slow
def test_rolling_hash_matches_python_reference(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(rolling_hash("t").alias("h")).first()["h"]
    expected = 0
    for ch in text:
        expected = (expected * HASH_BASE + ord(ch)) % HASH_MOD
    assert got == expected


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_distinct_counts_duplication_invariant(spark, seed):
    """Duplicating fact rows must not change COUNT DISTINCT (the
    reference dedupes by id in its per-group sets, ETL.java:170,242)."""
    rng = random.Random(seed)
    rows = [
        (rng.randint(1, 5), rng.randint(1, 30)) for _ in range(rng.randint(1, 80))
    ]
    df = spark.createDataFrame(rows, "g int, x int")
    doubled = df.union(df)
    base = {
        r.g: r.d
        for r in df.groupBy("g").agg(F.countDistinct("x").alias("d")).collect()
    }
    dup = {
        r.g: r.d
        for r in doubled.groupBy("g")
        .agg(F.countDistinct("x").alias("d"))
        .collect()
    }
    assert base == dup
