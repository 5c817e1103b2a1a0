"""resample_ffill properties: dense grid, fill semantics, NULL
atomicity, per-bucket last-event choice."""

from __future__ import annotations

from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators.temporal import (
    resample_ffill,
)


def _ev(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double, event_id long"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_resample_fills_gaps_and_marks_observed(spark):
    ev = _ev(
        spark,
        [
            (1, "2024-01-01 00:10:00", 1.0, 1),
            (1, "2024-01-01 03:20:00", 4.0, 2),  # 2 empty hours between
        ],
    )
    out = resample_ffill(
        ev, key_col="user_id", ts_col="ts", value_col="value",
        tiebreak_col="event_id",
    ).orderBy("bucket").collect()
    assert len(out) == 4  # 00..03 dense
    assert [r["value"] for r in out] == [1.0, 1.0, 1.0, 4.0]
    assert [r["observed"] for r in out] == [True, False, False, True]


def test_resample_last_event_in_bucket_wins(spark):
    ev = _ev(
        spark,
        [
            (1, "2024-01-01 00:05:00", 1.0, 1),
            (1, "2024-01-01 00:55:00", 2.0, 2),  # later ts wins
            (1, "2024-01-01 00:55:00", 3.0, 9),  # equal ts: higher id wins
        ],
    )
    out = resample_ffill(
        ev, key_col="user_id", ts_col="ts", value_col="value",
        tiebreak_col="event_id",
    ).collect()
    assert len(out) == 1 and out[0]["value"] == 3.0


def test_resample_forward_fills_genuine_null(spark):
    # the latest observation has value NULL; the fill must carry the
    # NULL forward, not resurrect the older 5.0 (row-atomic struct fill)
    ev = _ev(
        spark,
        [
            (1, "2024-01-01 00:00:00", 5.0, 1),
            (1, "2024-01-01 01:00:00", None, 2),
            (1, "2024-01-01 03:00:00", 7.0, 3),
        ],
    )
    out = resample_ffill(
        ev, key_col="user_id", ts_col="ts", value_col="value",
        tiebreak_col="event_id",
    ).orderBy("bucket").collect()
    assert [r["value"] for r in out] == [5.0, None, None, 7.0]
