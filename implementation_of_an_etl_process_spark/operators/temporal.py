"""Temporal join operators Spark lacks natively: as-of join and range
(interval) join — composed from built-in DataFrame ops per the engine's
design rule (composition first, Pandas UDF only if semantics demand).

- ``asof_join``: for each left row, the latest right row with
  ``right_ts <= left_ts`` per key. Implemented with the union +
  last-ignorenulls-window trick: one shuffle on (key), no range
  explosion, scales as a plain window. (This is how event-time feature
  lookup/backfill works in training-data pipelines.)
- ``range_join``: non-equi join of points into intervals. The bands
  side is broadcast (bounded literal table) so Catalyst plans a
  BroadcastNestedLoopJoin — the right physical shape when intervals
  are few; interval tables that are themselves huge would bucket by
  range instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: append the payload of the nearest right row per
    ``by`` key — ``backward`` (default) takes the LATEST right row
    at-or-before each left timestamp, ``forward`` the EARLIEST right
    row at-or-after it. One shuffle (the window partition) either way;
    the direction only flips the traversal order.

    ``tiebreak`` must be a unique right-side column: among right rows
    sharing (by, ts) the one with the greatest tiebreak wins, making
    results deterministic in both directions.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            by,
            F.col(right_ts).alias("_ts"),
            F.col(tiebreak).alias("_tb"),
            # One struct per right row, never NULL even when every payload
            # field is NULL: last(ignorenulls) then picks the latest right
            # ROW atomically — per-column last() would let an older row's
            # non-null value leak past a newer row's genuine NULL.
            F.struct(*payload_cols).alias("_payload"),
        )
        .withColumn("_side", F.lit(0))
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    # right rows order before left rows at equal ts (inclusive <= / >=);
    # tiebreak orders equal-ts right rows deterministically. Backward
    # walks time ascending (last non-null = latest at-or-before);
    # forward walks it descending (last non-null = earliest at-or-after).
    ts_order = (
        F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    )
    w = (
        W.partitionBy(by)
        .orderBy(ts_order, F.col("_side").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = u.withColumn("_payload", F.last("_payload", ignorenulls=True).over(w))
    for c in payload_cols:
        u = u.withColumn(c, F.col("_payload")[c])
    return u.filter(F.col("_side") == 1).drop("_ts", "_side", "_tb", "_payload")


def range_join(
    points: DataFrame,
    bands: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    inclusive_hi: bool = False,
) -> DataFrame:
    """Join point rows into [lo, hi) interval rows (broadcast bands)."""
    upper = (
        F.col(value_col) <= F.col(hi_col)
        if inclusive_hi
        else F.col(value_col) < F.col(hi_col)
    )
    return points.join(
        F.broadcast(bands), (F.col(value_col) >= F.col(lo_col)) & upper, "inner"
    )


def resample_ffill(
    events: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    step_expr: str = "interval 1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Resample an event stream onto a fixed per-key time grid with
    forward fill — the gap-filling step before feature windows or
    charting (DuckDB spells the fill side of this as ASOF JOIN; the
    oracle uses exactly that).

    Per key: bucket events to ``trunc_unit``, keep the last event per
    bucket (deterministic by ``(ts, tiebreak)``), lay a dense grid from
    the key's first to last bucket, and forward-fill the value struct
    (row-atomic, so a genuine NULL value forward-fills as NULL rather
    than letting an older non-null leak past it).

    Output: key, grid ``bucket`` timestamp, ``value`` (filled),
    ``observed`` (whether this bucket had its own event).

    Scale shape: one shuffle on key for the bucket-last aggregate, one
    for the grid window; the grid explode is executor-side (sequence +
    explode), never a driver loop. Dense grids multiply rows by
    (span/step) — bound the span upstream with a ts filter.
    """
    b = F.date_trunc(trunc_unit, F.col(ts_col))
    hourly = (
        events.select(
            F.col(key_col),
            b.alias("bucket"),
            F.struct(ts_col, tiebreak_col, value_col).alias("_row"),
        )
        .groupBy(key_col, "bucket")
        .agg(F.max("_row").alias("_row"))
        .select(
            key_col,
            "bucket",
            F.struct(F.col(f"_row.{value_col}").alias("v")).alias("_obs"),
        )
    )
    grid = (
        hourly.groupBy(key_col)
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            key_col,
            F.explode(
                F.expr(f"sequence(_lo, _hi, {step_expr})")
            ).alias("bucket"),
        )
    )
    joined = grid.join(hourly, [key_col, "bucket"], "left")
    w = (
        W.partitionBy(key_col)
        .orderBy(F.col("bucket").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        key_col,
        "bucket",
        F.last("_obs", ignorenulls=True).over(w)["v"].alias(value_col),
        F.col("_obs").isNotNull().alias("observed"),
    )
