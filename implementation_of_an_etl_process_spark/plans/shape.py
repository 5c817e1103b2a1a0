"""Plan shaping helpers.

``spread`` fixes the small-input parallelism trap: a row-expanding or
compute-heavy operator downstream of a small scan inherits the scan's
split count (often 1 task for a sub-128MB file), serializing work that
should fan out. At 100 TB inputs arrive pre-split so this is a no-op;
on small inputs it buys linear speedup for explode/score-heavy stages
(measured 17.5s -> 0.45s for shingle explosion of a single-file scan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ceiling for a FORCED broadcast hint, against the leaf-scan (on-disk,
# compressed) size. Deliberately conservative: the in-memory hash
# relation runs several times the parquet bytes, and a forced hint
# overrides AQE — past this size we'd rather let runtime stats decide.
BROADCAST_LIMIT_BYTES = int(
    os.environ.get("SPARK_GRAFT_BROADCAST_LIMIT", str(128 << 20))
)


def leaf_scan_bytes(df: DataFrame) -> int:
    """Sum of Catalyst's size estimates over the plan's LEAF relations.

    For the dimension-enrichment plans this engine broadcasts (FK->PK
    joins + projections/filters), output bytes are bounded by roughly
    the sum of the inputs — while Catalyst's own estimate for a join
    node without CBO stats is the *product* of its children (measured:
    a 3 MB x 300 KB join "estimated" at 859 GB), which would veto every
    broadcast. Leaves (parquet scans) carry real file sizes.
    """
    plan = df._jdf.queryExecution().optimizedPlan()  # noqa: SLF001
    leaves = plan.collectLeaves()
    return sum(
        int(leaves.apply(i).stats().sizeInBytes()) for i in range(leaves.size())
    )


def maybe_broadcast(df: DataFrame, limit_bytes: int | None = None) -> DataFrame:
    """Broadcast-hint ``df`` only when its leaf-scan bytes are under the
    limit; otherwise return it unhinted so AQE picks the join strategy
    from runtime sizes (broadcast promotion or SMJ, and skew splitting).

    An unconditional ``F.broadcast`` on a dimension side that grows with
    the data works at test scale and OOMs at 100x — the hint overrides
    every safety net. Size-gating keeps the single-probe plan where it's
    safe and degrades to a shuffle join where it isn't.
    """
    limit = BROADCAST_LIMIT_BYTES if limit_bytes is None else limit_bytes
    try:
        size = leaf_scan_bytes(df)
    except Exception:  # un-introspectable plan: let AQE decide
        return df
    return F.broadcast(df) if size <= limit else df


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
