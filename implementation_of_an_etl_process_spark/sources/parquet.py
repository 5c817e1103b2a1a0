"""Parquet catalog helpers for the driver-provided test tables."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from implementation_of_an_etl_process_spark.schemas import TPCH_TABLES


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TPCH_TABLES,
    *,
    register_views: bool = False,
) -> dict[str, DataFrame]:
    """Load ``{name}.parquet`` tables from a scale-factor directory.

    Parquet scans get predicate pushdown, column pruning, and partition
    planning from Spark for free; this helper only names things. Missing
    tables are skipped so smaller fixture sets still load.
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(p):
            continue
        df = spark.read.parquet(p)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
