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
import threading

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


#: Leaf-scan ceiling under which an operator may run its internal
#: materializations in LATENCY mode (AQE off): below this, a
#: multi-join pipeline's cost is dominated by AQE's per-shuffle-stage
#: job scheduling (~100ms each on local[32] — measured 27 vs 12 jobs,
#: 3.1s vs 1.9s, for the minhash hot-bucket guard at sf0.1), not by
#: data. At scale AQE's runtime re-planning (skew splits, broadcast
#: promotion, partition coalescing) is worth far more than the fixed
#: scheduling cost, so the gate fails OPEN: un-introspectable plans
#: and anything past the limit keep AQE.
LATENCY_MODE_LIMIT_BYTES = int(
    os.environ.get("SPARK_GRAFT_LATENCY_LIMIT", str(64 << 20))
)


def small_leaf_input(df: DataFrame, limit_bytes: int | None = None) -> bool:
    """True iff the plan's leaf relations are provably under the
    latency-mode ceiling (False on estimation failure — fail open to
    the AQE path)."""
    limit = LATENCY_MODE_LIMIT_BYTES if limit_bytes is None else limit_bytes
    try:
        return leaf_scan_bytes(df) <= limit
    except Exception:
        return False


class latency_mode:
    """Context manager: disable AQE for actions run inside the block
    (restoring the previous setting on exit) — the small-input latency
    path for operators whose internal pipelines pay more in AQE stage
    scheduling than they could gain from runtime re-planning. Callers
    MUST materialize (checkpoint/collect) inside the block; lazy frames
    escaping the block run under the restored setting.

    The AQE flag is SESSION-GLOBAL, so nesting/overlap is handled with
    a per-session re-entrancy counter under a lock: only the outermost
    enter records the true original value and only the last exit
    restores it (a naive save/restore would re-instate the inner
    block's "false" as the "original"). Caveat that can't be fixed
    here: any UNRELATED query running concurrently on the same
    SparkSession (multi-threaded driver, streaming micro-batches)
    executes with AQE off while a latency block is active — operators
    use this only around their own small-input materializations, and
    multi-query drivers should serialize around it."""

    _KEY = "spark.sql.adaptive.enabled"
    _lock = threading.RLock()
    #: id(session) -> [depth, original-value]; entry removed at depth 0
    _active: dict[int, list] = {}

    def __init__(self, spark, enabled: bool = True):
        self._spark = spark
        self._enabled = enabled

    def __enter__(self):
        if self._enabled:
            with self._lock:
                st = self._active.get(id(self._spark))
                if st is None:
                    old = self._spark.conf.get(self._KEY, "true")
                    self._active[id(self._spark)] = [1, old]
                    self._spark.conf.set(self._KEY, "false")
                else:
                    st[0] += 1
        return self

    def __exit__(self, *exc):
        if self._enabled:
            with self._lock:
                st = self._active.get(id(self._spark))
                if st is None:  # unbalanced exit — nothing to restore
                    return
                st[0] -= 1
                if st[0] <= 0:
                    del self._active[id(self._spark)]
                    self._spark.conf.set(self._KEY, st[1])
