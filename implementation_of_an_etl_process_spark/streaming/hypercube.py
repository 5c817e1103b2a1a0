"""Incremental maintenance of the reference hypercube from a stream of
invoice records (SURVEY.md §7 M4: "incremental cube maintenance via
foreachBatch merge").

Exact COUNT DISTINCT is not streaming-incremental as a single
aggregate, but the two-level functional-dependency rewrite (see
operators.hypercube) IS: the streaming aggregation maintains the
level-1 state keyed by (dims, contract, client) — plain mergeable sums
and counts, bounded by the number of distinct (dims, contract) pairs —
and each micro-batch's foreachBatch upserts those cumulative rows into
a parquet-backed level-1 table, then derives the final cube (including
exact nclients/ncontracts) by re-grouping level-1. Deriving from lvl1
costs O(|lvl1|), independent of how many invoices have streamed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIMS = ["geo", "type", "misc", "nature", "time"]


def streaming_hypercube_lvl1(
    invoice_stream: DataFrame, contracts: DataFrame, clients: DataFrame
) -> DataFrame:
    """Stream-static plan: streaming invoices joined to broadcast static
    dims, aggregated to the level-1 granularity (update mode emits the
    CUMULATIVE row per key each batch)."""
    enriched = (
        contracts.select(
            F.col("id").alias("contract_id"),
            F.col("id_client").alias("client_id"),
            "nature",
        ).join(
            F.broadcast(
                clients.select(F.col("id").alias("client_id"), "type", "geo", "misc")
            ),
            "client_id",
        )
    )
    return (
        invoice_stream.select(
            F.col("id_contract").alias("contract_id"),
            "time",
            "amount",
            "consumption",
        )
        .join(F.broadcast(enriched), "contract_id")
        .groupBy(*DIMS, "contract_id", "client_id")
        .agg(
            F.sum("consumption").cast("long").alias("_c"),
            F.sum(F.col("amount").cast("double")).alias("_a"),
            F.count(F.lit(1)).alias("_n"),
        )
    )


def hypercube_from_lvl1(lvl1: DataFrame) -> DataFrame:
    """Final cube (exact distincts) from the level-1 state table."""
    return (
        lvl1.groupBy(*DIMS)
        .agg(
            F.sum("_c").cast("long").alias("consumption"),
            F.round(F.sum("_a"), 2).alias("amount"),
            F.countDistinct("client_id").cast("long").alias("nclients"),
            F.count(F.lit(1)).cast("long").alias("ncontracts"),
            F.sum("_n").alias("ninvoices"),
        )
        .orderBy(*DIMS)
    )


def merge_lvl1_batch(batch: DataFrame, state_dir: str) -> None:
    """Upsert one micro-batch of CUMULATIVE level-1 rows into the
    geo-partitioned parquet state. IDEMPOTENT under checkpoint replay:
    update-mode rows carry cumulative per-key values, so re-merging a
    batch already (fully or partially) applied replaces the same keys
    with the same values — asserted by
    tests/test_streaming_hypercube.py::test_merge_replay_is_idempotent.
    Exposed as a standalone function so replay can be driven directly
    in tests; the streaming sink's foreachBatch delegates here.
    """
    keys = [*DIMS, "contract_id", "client_id"]
    spark = batch.sparkSession
    new = batch.persist()
    try:
        # computed for EVERY batch: an empty batch must be a no-op
        # even before any state exists — a 0-row partitionBy write
        # would leave a _SUCCESS-only dir that poisons later
        # spark.read.parquet schema inference
        touched = [r[0] for r in new.select("geo").distinct().collect()]
        if not touched:
            return
        if os.path.exists(state_dir):
            old = spark.read.parquet(state_dir).filter(
                F.col("geo").isin(touched)  # partition-pruned read
            )
            new = old.join(new, keys, "left_anti").unionByName(new)
        (
            # sized to the batch: len(touched) hash partitions means
            # a 1-geo straggler batch schedules 1 writer task, not
            # spark.sql.shuffle.partitions mostly-empty ones (a
            # hash collision folding two geos into one task still
            # writes one file per partition dir)
            new.repartition(len(touched), "geo")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("geo")
            .parquet(state_dir)
        )
    finally:
        batch.unpersist()


def incremental_hypercube_sink(
    lvl1_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    *,
    trigger_available_now: bool = True,
):
    """foreachBatch upsert of cumulative level-1 rows into parquet state.
    Read the maintained cube at any time with
    ``hypercube_from_lvl1(spark.read.parquet(state_dir))``.

    The state is PARTITIONED BY ``geo`` (a stable bounded dimension
    key) and each micro-batch rewrites ONLY the partitions its rows
    touch, via dynamic partition overwrite — so write amplification is
    O(state touched by the batch), not O(|total state|), and untouched
    partitions' files are never rewritten. (The round-2 design read,
    unioned, and overwrote the ENTIRE state directory every batch —
    a full-state rewrite regardless of batch size, plus a directory
    rename that only works on a single-node filesystem.)

    Restart safety: dynamic overwrite is not atomic across partitions,
    but the merge is idempotent — level-1 rows are CUMULATIVE per key
    (update-mode aggregation state), so when the checkpoint replays a
    batch after a mid-write crash, re-merging replaces the same keys
    with the same values. The driver-side ``collect`` of touched geos
    is bounded by the geo dimension's cardinality, same contract as a
    broadcast."""
    def merge(batch: DataFrame, batch_id: int) -> None:
        merge_lvl1_batch(batch, state_dir)

    writer = (
        lvl1_stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer
