"""Data-quality operators: column profiling and declarative constraint
checks (the Deequ/Great-Expectations capability, recomposed as plain
aggregates so one scan profiles every column).

Scale shape: ``profile`` is ONE pass over the table — all per-column
aggregates fuse into a single partial-aggregated reduction (no
per-column jobs, no driver loops); the row-per-column layout is
assembled from that one aggregate row with an executor-side stack.
``check`` families are each one aggregate (or one join for referential
integrity) and return counts, never row samples, so nothing large ever
reaches the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["profile", "check_rules", "referential_violations"]

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    distinct_mode: str = "exact",
) -> DataFrame:
    """Per-column profile in one scan: row count, nulls, distinct
    count, numeric min/max (numeric columns) and lexical min/max
    (string columns), each in its own typed output column.

    Output: (column, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str) — one row per profiled column.

    ``distinct_mode``: N exact distincts in one aggregate force
    Catalyst's Expand (input replicated N-fold before the shuffle) —
    fine for audits, wrong as a 100 TB default; ``"approx"`` swaps in
    HLL++ sketches, which partial-aggregate with no Expand and is the
    scale path for routine profiling.
    """
    if distinct_mode not in ("exact", "approx"):
        raise ValueError(f"unknown distinct_mode {distinct_mode!r}")
    nd = (
        F.count_distinct
        if distinct_mode == "exact"
        else F.approx_count_distinct
    )
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else list(df.columns)
    aggs: list[Column] = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}")
        )
        aggs.append(nd(F.col(c)).alias(f"_nd_{c}"))
        if dtypes.get(c) in _NUMERIC:
            aggs.append(F.min(c).cast("double").alias(f"_mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"_mx_{c}"))
        elif dtypes.get(c) == "string":
            aggs.append(F.min(c).alias(f"_ms_{c}"))
            aggs.append(F.max(c).alias(f"_xs_{c}"))
    one = df.agg(*aggs)
    # stack the single wide row into (column, ...) rows executor-side
    structs = []
    for c in cols:
        is_num = dtypes.get(c) in _NUMERIC
        is_str = dtypes.get(c) == "string"
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                (F.col(f"_mn_{c}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"_mx_{c}") if is_num else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"_ms_{c}") if is_str else F.lit(None).cast("string")).alias("min_str"),
                (F.col(f"_xs_{c}") if is_str else F.lit(None).cast("string")).alias("max_str"),
            )
        )
    return one.select(
        F.explode(F.array(*structs)).alias("p")
    ).select("p.*")


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named boolean rules in one scan. Each rule is a Column
    predicate over a row; NULL predicate results count as violations
    (unknown is not a pass). Output: (check, n_rows, n_violations,
    passed)."""
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
            ).alias(f"_v_{name}")
        )
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("check"),
            F.col("_rows").alias("n_rows"),
            F.col(f"_v_{name}").cast("long").alias("n_violations"),
            (F.col(f"_v_{name}") == 0).alias("passed"),
        )
        for name in rules
    ]
    return one.select(F.explode(F.array(*structs)).alias("c")).select("c.*")


def referential_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Foreign-key check: child rows whose key has no parent (anti
    join), returned as a count. NULL child keys are orphans too."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))


def write_with_audit(
    df: DataFrame, path: str, metrics: dict[str, Column], *, fmt: str = "parquet"
) -> dict[str, object]:
    """Write ``df`` while collecting audit metrics IN the same pass via
    the Observation API — zero extra scans: at 100 TB an after-the-fact
    ``COUNT(*)``/null-rate audit query re-reads the whole output; an
    observation rides the write for free.

    ``metrics`` maps name -> aggregate Column (COUNT/SUM/MIN/MAX style;
    must be commutative-aggregatable, the Observation contract).
    Returns the metric dict once the write has materialized it.
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.mode("overwrite").format(fmt).save(path)
    return obs.get
