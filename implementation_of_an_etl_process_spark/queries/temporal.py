"""Battery entries: as-of join and range join, oracle-checked against
DuckDB's native ASOF JOIN and interval join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators.temporal import (
    asof_join,
    range_join,
)
from implementation_of_an_etl_process_spark.queries.relational import _t


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event: the value of the user's latest purchase
    at-or-before the click (event-time feature lookup)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # one row per (user, ts): greatest event_id wins ties, making the
    # as-of target unique (mirrored exactly in the oracle SQL)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("purchase_value"),
             F.max("event_id").alias("p_eid"))
    )
    out = asof_join(
        clicks,
        purchases,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["purchase_value"],
        tiebreak="p_eid",
    )
    return (
        out.select(
            "event_id",
            "user_id",
            F.round(F.coalesce("purchase_value", F.lit(-1.0)), 6).alias(
                "last_purchase_value"
            ),
        )
        .orderBy("event_id")
    )


ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, max_by(value, event_id) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       ROUND(COALESCE(p.purchase_value, -1.0), 6) AS last_purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND p.ts <= c.ts
ORDER BY c.event_id
"""


def asof_join_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every click, the value of the user's EARLIEST
    purchase at-or-after the click (time-to-conversion feature lookup —
    the mirror of `asof_join_events`, same one-shuffle window plan with
    the traversal order flipped)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("value", "event_id").alias("purchase_value"),
            F.max("event_id").alias("p_eid"),
        )
    )
    out = asof_join(
        clicks,
        purchases,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["purchase_value"],
        tiebreak="p_eid",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.round(F.coalesce("purchase_value", F.lit(-1.0)), 6).alias(
            "next_purchase_value"
        ),
    ).orderBy("event_id")


ASOF_FORWARD_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, max_by(value, event_id) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
), nxt AS (
  SELECT c.event_id, min_by(p.purchase_value, p.ts) AS v
  FROM clicks c JOIN purchases p
    ON p.user_id = c.user_id AND p.ts >= c.ts
  GROUP BY c.event_id
)
SELECT c.event_id, c.user_id,
       ROUND(COALESCE(n.v, -1.0), 6) AS next_purchase_value
FROM clicks c LEFT JOIN nxt n ON c.event_id = n.event_id
ORDER BY c.event_id
"""


def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    from implementation_of_an_etl_process_spark.plans import local_rows_df

    bands = local_rows_df(
        spark,
        [("budget", 0.0, 930.0), ("mid", 930.0, 970.0), ("premium", 970.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        range_join(part, bands, value_col="p_retailprice")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
        .orderBy("band")
    )


RANGE_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('budget', 0.0, 930.0), ('mid', 930.0, 970.0), ('premium', 970.0, 1e9)
)
SELECT band, COUNT(*) AS n_parts,
       MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band ORDER BY band
"""


def resample_ffill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One week of events resampled to a dense per-user hourly grid with
    forward fill (oracle: DuckDB ASOF LEFT JOIN onto the same grid)."""
    from implementation_of_an_etl_process_spark.operators.temporal import (
        resample_ffill,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("ts") < F.lit("2024-01-08"))
    out = resample_ffill(
        ev,
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        tiebreak_col="event_id",
    )
    return out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:00").alias("bucket"),
        "value",
        "observed",
    ).orderBy("user_id", "bucket")


RESAMPLE_SQL = """
WITH hourly AS (
  SELECT user_id, bucket, value FROM (
    SELECT user_id, date_trunc('hour', ts) AS bucket, value,
           ROW_NUMBER() OVER (
             PARTITION BY user_id, date_trunc('hour', ts)
             ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
  ) WHERE rn = 1
), grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
  FROM (SELECT user_id, MIN(bucket) mn, MAX(bucket) mx
        FROM hourly GROUP BY user_id)
)
SELECT g.user_id, strftime(g.bucket, '%Y-%m-%d %H:00') AS bucket,
       h.value, h.bucket = g.bucket AS observed
FROM grid g ASOF LEFT JOIN hourly h
  ON g.user_id = h.user_id AND g.bucket >= h.bucket
ORDER BY g.user_id, g.bucket
"""


QUERIES = {
    "asof_join_events": asof_join_events,
    "asof_join_forward_events": asof_join_forward_events,
    "range_join_price_bands": range_join_price_bands,
    "resample_ffill_events": resample_ffill_events,
}
ORACLES = {
    "asof_join_events": ASOF_SQL,
    "asof_join_forward_events": ASOF_FORWARD_SQL,
    "range_join_price_bands": RANGE_SQL,
    "resample_ffill_events": RESAMPLE_SQL,
}
