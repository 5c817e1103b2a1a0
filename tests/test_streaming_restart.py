"""Checkpoint-restart resilience: a stopped stream resumed from its
checkpoint must process exactly the new input — no reprocessing of
already-committed files, no lost rows (the exactly-once file-sink
contract a 100 TB pipeline restarts depend on)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark import streaming as S
from implementation_of_an_etl_process_spark.queries.relational import (
    normalize_event_ts,
)
from tests.conftest import SF_SMOKE


def _write_split(spark, tmp_path, which: int) -> None:
    ev = normalize_event_ts(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    part = ev.filter(F.col("event_id") % 2 == which).coalesce(1)
    staged = str(tmp_path / f"stage_{which}")
    part.write.parquet(staged)
    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    for f in os.listdir(staged):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(staged, f), src / f"{which}.parquet")


def _run_once(spark, tmp_path) -> None:
    stream = S.read_events_stream(spark, str(tmp_path / "src"))
    q = (
        stream.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet").filter(
        F.col("event_type") == "click"
    )
    expected_total = batch.count()

    _write_split(spark, tmp_path, 0)
    _run_once(spark, tmp_path)
    sink = spark.read.parquet(str(tmp_path / "sink"))
    first = sink.count()
    assert 0 < first < expected_total

    # new file arrives while the query is DOWN; the restarted query must
    # pick up only the delta
    _write_split(spark, tmp_path, 1)
    _run_once(spark, tmp_path)
    sink = spark.read.parquet(str(tmp_path / "sink"))
    assert sink.count() == expected_total
    assert sink.select("event_id").distinct().count() == expected_total

    # a third restart with NO new input must be a no-op
    _run_once(spark, tmp_path)
    assert (
        spark.read.parquet(str(tmp_path / "sink")).count() == expected_total
    )
