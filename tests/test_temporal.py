"""As-of and range join operator tests on crafted data."""

from __future__ import annotations

from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators.temporal import (
    asof_join,
    range_join,
)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 250), (3, 1, 50), (4, 2, 500)],
        "event_id long, u long, t long",
    )
    right = spark.createDataFrame(
        [(1, 90, 7.0, 11), (1, 50, 5.0, 12), (2, 600, 9.0, 13)],
        "u long, t long, v double, rid long",
    )
    out = {
        r.event_id: r.v
        for r in asof_join(
            left, right, by="u", left_ts="t", right_ts="t",
            payload_cols=["v"], tiebreak="rid",
        ).collect()
    }
    assert out[1] == 7.0  # latest <= 100 is t=90
    assert out[2] == 7.0  # latest <= 250 is still t=90
    assert out[3] == 5.0  # t=50 matches inclusively (<=)
    assert out[4] is None  # user 2's only right row is later (t=600)


def test_asof_tie_on_equal_ts_uses_tiebreak(spark):
    left = spark.createDataFrame([(1, 1, 100)], "event_id long, u long, t long")
    right = spark.createDataFrame(
        [(1, 100, 5.0, 1), (1, 100, 9.0, 2)], "u long, t long, v double, rid long"
    )
    out = asof_join(
        left, right, by="u", left_ts="t", right_ts="t",
        payload_cols=["v"], tiebreak="rid",
    ).collect()
    assert out[0].v == 9.0  # greatest tiebreak wins deterministically


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 25.0)], "id long, x double"
    )
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("high", 10.0, 20.0)], "band string, lo double, hi double"
    )
    got = {
        r.id: r.band
        for r in range_join(points, bands, value_col="x").collect()
    }
    assert got == {1: "low", 2: "low", 3: "high"}  # hi exclusive; 25 unmatched
    # inclusive_hi: 10.0 now matches BOTH bands (boundary overlap)
    inclusive = range_join(points, bands, value_col="x", inclusive_hi=True)
    assert inclusive.filter(F.col("id") == 3).count() == 2


def test_asof_forward_hand_computed(spark):
    """Forward as-of picks the EARLIEST right row at-or-after each left
    ts; equal-ts right rows resolve by greatest tiebreak; no later row
    -> NULL payload."""
    from implementation_of_an_etl_process_spark.operators.temporal import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 25), (3, "u", 40), (4, "v", 5)],
        ["eid", "k", "t"],
    )
    right = spark.createDataFrame(
        [("u", 10, 100, 1), ("u", 10, 101, 2), ("u", 30, 200, 3)],
        ["k", "t", "payload", "tb"],
    )
    out = {
        r["eid"]: r["payload"]
        for r in asof_join(
            left,
            right,
            by="k",
            left_ts="t",
            right_ts="t",
            payload_cols=["payload"],
            tiebreak="tb",
            direction="forward",
        ).collect()
    }
    assert out[1] == 101  # at-or-after 10: the t=10 rows, tb=2 wins
    assert out[2] == 200  # next is t=30
    assert out[3] is None  # nothing at-or-after 40
    assert out[4] is None  # key v has no right rows


def test_asof_direction_validation(spark):
    import pytest

    from implementation_of_an_etl_process_spark.operators.temporal import (
        asof_join,
    )

    df = spark.createDataFrame([(1, "u", 1)], ["eid", "k", "t"])
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(
            df, df, by="k", left_ts="t", right_ts="t",
            payload_cols=["eid"], tiebreak="eid", direction="sideways",
        )
