"""Plan shaping helpers.

``spread`` fixes the small-input parallelism trap: a row-expanding or
compute-heavy operator downstream of a small scan inherits the scan's
split count (often 1 task for a sub-128MB file), serializing work that
should fan out. At 100 TB inputs arrive pre-split so this is a no-op;
on small inputs it buys linear speedup for explode/score-heavy stages
(measured 17.5s -> 0.45s for shingle explosion of a single-file scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism when the
    input has materially fewer partitions; pass through otherwise (no
    gratuitous shuffle on already-parallel inputs)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (for tests asserting plan shape)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )
