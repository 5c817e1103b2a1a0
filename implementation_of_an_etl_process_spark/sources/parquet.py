"""Parquet catalog helpers for the driver-provided test tables."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from implementation_of_an_etl_process_spark.schemas import TPCH_TABLES

# Schema memo for the immutable driver-provided tables, keyed by the
# resolved parquet path. First read per (process, path) infers the
# schema from the footer exactly as before (so the memo can never
# diverge from the file); every subsequent read passes it explicitly,
# which skips the footer-reading Spark job `spark.read.parquet` runs
# per call — profiled at ~25 ms/table/query-construction on local[32]
# (hypercube paid 4 of them, q5 six, EVERY bench pass; guide §1.2:
# don't re-derive what cannot change). The memo holds StructTypes
# (metadata), never rows, and is keyed on (path, mtime) — a table
# regenerated in-process at the same path (tests, schema-evolution
# flows) re-infers instead of silently reading the stale schema as
# nulls (r14 advice). Caveat that remains: a multi-file table whose
# files disagree on schema bypasses schema merge after the first read
# — the driver's tables are single-schema by contract.
_SCHEMA_MEMO: dict[tuple[str, float], object] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``spark.read.parquet(sf_dir/name.parquet)`` with the schema
    memoized per (path, mtime) — same DataFrame, no per-call footer
    job while the file is unchanged, fresh inference the moment it is
    rewritten."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        key = (path, os.stat(path).st_mtime)
    except OSError:
        key = (path, -1.0)  # let Spark raise its own missing-path error
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


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
