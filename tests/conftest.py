"""Shared pytest fixtures: one SparkSession per test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
REF_SAMPLE = "/root/reference/data-sample"


@pytest.fixture(scope="session")
def spark():
    from implementation_of_an_etl_process_spark import get_spark

    # Tests share one small-footprint session; 8 shuffle partitions keep
    # tiny-fixture jobs snappy (AQE coalesces anyway).
    spark = get_spark("pytest", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def tpch_smoke(spark):
    from implementation_of_an_etl_process_spark.sources import load_tables

    return load_tables(spark, SF_SMOKE)


def assert_df_equals_oracle(df, duck_rel, float_cols=(), tol=1e-9):
    """Compare a Spark DataFrame against a DuckDB relation, order- and
    column-order-insensitively (the driver's comparison model)."""
    import math

    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns
    duck_df = duck_rel.df() if hasattr(duck_rel, "df") else duck_rel
    assert sorted(spark_cols) == sorted(duck_df.columns.tolist()), (
        f"column mismatch: {sorted(spark_cols)} vs {sorted(duck_df.columns.tolist())}"
    )
    duck_rows = [
        tuple(rec[c] for c in spark_cols) for rec in duck_df.to_dict("records")
    ]
    assert len(spark_rows) == len(duck_rows), (
        f"row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    float_idx = {spark_cols.index(c) for c in float_cols}

    def key(row):
        return tuple(
            round(v, 6) if i in float_idx and isinstance(v, float) else v
            for i, v in enumerate(row)
        )

    for s, d in zip(sorted(spark_rows, key=key), sorted(duck_rows, key=key)):
        for i, (sv, dv) in enumerate(zip(s, d)):
            if i in float_idx:
                assert sv == dv or math.isclose(sv, dv, rel_tol=tol, abs_tol=tol), (
                    f"float mismatch col {spark_cols[i]}: {sv} vs {dv} in {s} / {d}"
                )
            else:
                assert sv == dv, f"mismatch col {spark_cols[i]}: {s} vs {d}"
