"""Battery entry that runs a real Structured Streaming pipeline.

The stream is driven with ``availableNow`` over a staged copy of the
events table and aggregated in complete mode — which must equal the
batch tumbling-window aggregation, so this streaming query gets a full
SQL oracle (same as events_tumbling_1h) rather than a rows-only check.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark import streaming as S
from implementation_of_an_etl_process_spark.queries.relational import (
    EVENTS_TUMBLING_SQL,
)


def streaming_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stage the events table as a streaming file source (ts re-encoded
    # to micros: the streaming scan declares TimestampType and cannot
    # use the batch nanosAsLong fallback).
    stage = tempfile.mkdtemp(prefix="events_stream_")
    try:
        (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
        q = (
            S.tumbling_counts(
                S.read_events_stream(spark, stage), exact_sums=True
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return (
            spark.table(name)
            .select(
                F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
                "total_value",
            )
            .orderBy("window_start", "event_type")
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (view->purchase attribution within
    1 hour), driven availableNow — with everything processed, the
    append-mode result must equal the batch range join, giving the
    stateful two-stream operator a full SQL oracle."""
    stage = tempfile.mkdtemp(prefix="events_attrib_")
    try:
        (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        stream = S.read_events_stream(spark, stage)
        name = f"stream_attrib_{uuid.uuid4().hex[:8]}"
        q = (
            S.attribution_join(
                stream.filter(F.col("event_type") == "view"),
                stream.filter(F.col("event_type") == "purchase"),
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return (
            spark.table(name)
            .select(
                "user_id",
                "purchase_id",
                "view_id",
                F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
                    "purchase_ts"
                ),
                F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias(
                    "view_ts"
                ),
            )
            .orderBy("purchase_id", "view_id")
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


STREAMING_ATTRIBUTION_SQL = """
SELECT v.user_id,
       p.event_id AS purchase_id,
       v.event_id AS view_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 1 HOUR
ORDER BY purchase_id, view_id
"""


QUERIES = {
    "streaming_tumbling_1h": streaming_tumbling_1h,
    "streaming_attribution_join": streaming_attribution_join,
}
ORACLES = {
    "streaming_tumbling_1h": EVENTS_TUMBLING_SQL,
    "streaming_attribution_join": STREAMING_ATTRIBUTION_SQL,
}
