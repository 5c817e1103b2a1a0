"""Structured Streaming operators."""

from implementation_of_an_etl_process_spark.streaming.ann import (
    ivfpq_ingest_sink,
)
from implementation_of_an_etl_process_spark.streaming.textingest import (
    text_index_ingest_sink,
)
from implementation_of_an_etl_process_spark.streaming.events import (
    read_events_stream,
    tumbling_counts,
    sliding_counts,
    session_windows,
    dedupe_stream,
    running_user_totals,
    running_user_totals_v2,
    incremental_cube_sink,
    attribution_join,
)

__all__ = [
    "ivfpq_ingest_sink",
    "text_index_ingest_sink",
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "dedupe_stream",
    "running_user_totals",
    "running_user_totals_v2",
    "incremental_cube_sink",
    "attribution_join",
]
