"""Streaming text-index maintenance: documents arrive as a stream, the
persisted BM25 index (operators/textindex.py) grows by appends.

The retrieval twin of :mod:`streaming.ann`: ingest is embarrassingly
incremental because nothing in the index is a frozen model — postings
append to their bucket partitions, corpus stats (N, total_len)
accumulate exactly in the meta sidecar, and df/idf are computed
append-fresh at query time, so a query issued right after a batch
lands already scores it correctly. Exactly-once comes from the
index's own batch ledger (``write_text_index``'s ``batch_id``
contract): foreachBatch may re-deliver a batch after a failure, and a
re-delivered id is a no-op instead of a silent double-append (which
would double tf/df for the affected documents and corrupt every
score).

Reference scope note: the reference engine (ETL.java) has no
streaming or retrieval surface; this composes the repo's own
persisted text index with the foreachBatch maintenance pattern used
by incremental_cube_sink, the dedup-index ingest, and
ivfpq_ingest_sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def text_index_ingest_sink(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """writeStream sink that appends each micro-batch of documents to
    the persisted text index at ``index_path`` (which must already
    exist — build the base with ``write_text_index(mode="overwrite")``,
    possibly on an empty seed frame).

    Returns the un-started writer; callers ``.start()`` it. With
    ``trigger_available_now`` the stream drains what's present and
    stops — the batch-ingest-shaped deployment; pass False for a
    continuous micro-batch loop."""
    from implementation_of_an_etl_process_spark.operators.textindex import (
        append_text_index,
    )

    def ingest(batch: DataFrame, batch_id: int) -> None:
        append_text_index(
            batch, index_path, text_col=text_col, batch_id=batch_id
        )

    writer = (
        doc_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(ingest)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer
