"""Streaming ANN-index maintenance: embeddings arrive as a stream,
the persisted IVF-PQ index grows by frozen-model appends.

The production loop at 10^9-vector scale: the coarse centroids and PQ
codebooks are trained ONCE (re-training is a re-index event, handled
offline), so ingest is embarrassingly incremental — each micro-batch
encodes against the frozen model and appends only the cell partitions
it touches. Exactly-once comes from the index's own batch ledger
(``write_ivfpq_index``'s ``batch_id`` contract): Structured
Streaming's foreachBatch may re-deliver a batch after a failure, and a
re-delivered id is a no-op instead of a silent double-append (which
would surface as duplicate cids in top-k results).

Reference scope note: the reference engine (ETL.java) has no
streaming or ANN surface; this composes the repo's own persisted
IVF-PQ index (operators/similarity.py) with the foreachBatch
maintenance pattern already used by incremental_cube_sink
(streaming/events.py) and the incremental hypercube
(streaming/hypercube.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ivfpq_ingest_sink(
    emb_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    *,
    corpus_vec: str,
    trigger_available_now: bool = True,
):
    """writeStream sink that appends each micro-batch of embeddings to
    the persisted IVF-PQ index at ``index_path`` (which must already
    exist — the frozen model lives in its meta sidecar; build it with
    ``write_ivfpq_index(mode="overwrite")``, typically on the seed
    corpus the model was trained on).

    Returns the un-started writer; callers ``.start()`` it. With
    ``trigger_available_now`` the stream drains what's present and
    stops — the batch-ingest-shaped deployment; pass False for a
    continuous micro-batch loop."""
    from implementation_of_an_etl_process_spark.operators.similarity import (
        append_ivfpq_index,
    )

    def ingest(batch: DataFrame, batch_id: int) -> None:
        append_ivfpq_index(
            batch, index_path, corpus_vec=corpus_vec, batch_id=batch_id
        )

    writer = (
        emb_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(ingest)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer
