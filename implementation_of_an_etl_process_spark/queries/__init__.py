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
try:
    from implementation_of_an_etl_process_spark.queries import temporal

    _MODULES.append(temporal)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import udfs

    _MODULES.append(udfs)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import refnative

    _MODULES.append(refnative)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import pipelineops

    _MODULES.append(pipelineops)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import formats

    _MODULES.append(formats)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import functions2

    _MODULES.append(functions2)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import tpch

    _MODULES.append(tpch)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import pretrain

    _MODULES.append(pretrain)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import etlops

    _MODULES.append(etlops)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import graphops

    _MODULES.append(graphops)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import qualityops

    _MODULES.append(qualityops)
except ImportError:  # pragma: no cover
    pass
try:
    from implementation_of_an_etl_process_spark.queries import sql41

    _MODULES.append(sql41)
except ImportError:  # pragma: no cover
    pass


def _with_engine_confs(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """The driver calls these with ITS SparkSession, which lacks the
    engine's session confs (nanos-parquet reads, UTC) — apply them at
    call time; they are runtime-settable and idempotent."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from implementation_of_an_etl_process_spark.session import (
            ensure_engine_confs,
        )

        ensure_engine_confs(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update({k: _with_engine_confs(v) for k, v in m.QUERIES.items()})
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
