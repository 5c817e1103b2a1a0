"""The engine's query battery: every operator family exposed as a
(spark, sf_dir) -> DataFrame callable plus, where SQL-expressible, an
ANSI-SQL oracle string DuckDB can run on the same parquet tables.

This is the driver-contract surface (``__spark_entry__.py`` re-exports
it) and the living inventory of SURVEY.md §2 coverage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from implementation_of_an_etl_process_spark.queries import relational, relational2

_MODULES = [relational, relational2]

try:  # registered as they land
    from implementation_of_an_etl_process_spark.queries import textops

    _MODULES.append(textops)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import similarity

    _MODULES.append(similarity)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import streamingops

    _MODULES.append(streamingops)
except ImportError:  # pragma: no cover
    pass


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
