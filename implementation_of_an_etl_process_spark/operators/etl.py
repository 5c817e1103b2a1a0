"""Classic warehouse-ETL operators Spark lacks as single verbs:
MERGE-style upsert and SCD type-2 history building.

The reference repo is an ETL pipeline frozen at one extract→cube→load
shape (``ETL.java``); these are the general load-side verbs a user of
any ETL engine expects. Both are pure DataFrame compositions — the
merge is one key-keyed shuffle (or a broadcast when the delta is
small), the history build is one window pass — so they inherit
Catalyst/AQE planning untouched.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "scd2_history"]


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    *,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics without a table format: rows in ``updates``
    replace same-key rows of ``base`` (whole-row update), unmatched
    update rows insert, and — when ``delete_col`` names a boolean column
    in ``updates`` — rows flagged there delete instead.

    Both inputs must share the schema (minus ``delete_col``). Duplicate
    keys in ``updates`` are rejected at plan time by a runtime assert
    column rather than silently last-writer-wins: MERGE on an ambiguous
    source is a correctness bug upstream.

    Scale shape: one full-outer hash join keyed on ``keys`` — Catalyst
    broadcasts the delta when it is small, AQE handles skewed keys; no
    driver-side state.
    """
    keys = list(keys)
    payload = [c for c in base.columns if c not in keys]
    upd_cols = set(updates.columns) - ({delete_col} if delete_col else set())
    if set(base.columns) != upd_cols:
        raise ValueError(
            f"merge_upsert: schema mismatch base={sorted(base.columns)} "
            f"updates={sorted(upd_cols)}"
        )
    # one-pass duplicate-key guard on the delta: count per key, raise
    # inside the plan if any key appears twice.
    dup_guard = F.count(F.lit(1)).over(W.partitionBy(*keys))
    u = updates.withColumn("_dup", dup_guard)
    u = u.withColumn(
        "_chk",
        F.when(
            F.col("_dup") > 1,
            F.raise_error(F.lit("merge_upsert: duplicate keys in updates")),
        ).otherwise(F.lit(1)),
    )
    marker = (
        F.col(delete_col) if delete_col else F.lit(False)
    ).alias("_del")
    u = u.select(
        *[F.col(c).alias(f"_u_{c}") for c in keys],
        *[F.col(c).alias(f"_u_{c}") for c in payload],
        marker,
        "_chk",
    )
    cond = None
    for k in keys:
        c = base[k] == u[f"_u_{k}"]
        cond = c if cond is None else cond & c
    joined = base.join(u, cond, "full_outer")
    kept = joined.filter(
        F.coalesce(F.col("_del"), F.lit(False)) == F.lit(False)
    )
    out_cols = [
        F.coalesce(kept[f"_u_{k}"], kept[k]).alias(k) for k in keys
    ] + [
        F.when(kept["_chk"].isNotNull(), kept[f"_u_{c}"])
        .otherwise(kept[c])
        .alias(c)
        for c in payload
    ]
    return kept.select(*out_cols)


def scd2_history(
    events: DataFrame,
    *,
    key_col: str,
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse a change stream into
    validity intervals per key.

    Consecutive rows (ordered by ``(ts_col, tiebreak_col)`` within each
    key) whose ``attr_cols`` are all unchanged merge into one interval.
    Output: key, attrs, ``valid_from`` (interval's first ts),
    ``valid_to`` (next interval's first ts, NULL for the open interval),
    ``is_current``.

    NULL attribute values compare with null-safe equality, so NULL→NULL
    is "no change". Two window passes over the same (key, ts, tiebreak)
    sort order — Catalyst reuses one shuffle+sort for both.
    """
    attr_cols = list(attr_cols)
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = W.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first_row = F.row_number().over(w) == 1
    runs = events.withColumn(
        "_run",
        F.sum(
            F.when(first_row | changed, 1).otherwise(0)
        ).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    grouped = runs.groupBy(key_col, "_run", *attr_cols).agg(
        F.min(F.struct(ts_col, tiebreak_col))[ts_col].alias("valid_from")
    )
    wk = W.partitionBy(key_col).orderBy(F.col("_run").asc())
    return grouped.select(
        key_col,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(wk).alias("valid_to"),
        F.lead("valid_from").over(wk).isNull().alias("is_current"),
    )
