#!/usr/bin/env python
"""Full-scale measurement of the PARTITIONED incremental-cube state.

Two numbers (BASELINE_NOTES.md "incremental streaming cube"):

1. Full stream: all 57.6M invoices through the level-1 upsert in
   multi-file micro-batches (uniform batches touch every geo, so this
   bounds the partitioning's overhead vs the round-2 full-rewrite
   design, which measured 105.9s on this host).
2. Partial batch: ONE additional micro-batch containing a single geo's
   invoices. The round-2 design paid a full-state rewrite here; the
   partitioned design must read+rewrite exactly one geo partition.
   Prints the merge wall time and the count of partition dirs whose
   files changed.

Finishes with a cube-vs-batch aggregate equality check (group count +
exact integer sums), the cheap full-scale version of the bit-exact
comparison the sample-data test performs row-for-row.

Usage: python tools/fullscale_stream_partial.py [data_dir] [n_batches]
Defaults: /tmp/fullscale (regenerate with tools/synth_fullscale.py), 4.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fullscale"
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def snapshot(state_dir: str) -> dict[str, tuple]:
    out: dict[str, tuple] = {}
    for d in os.listdir(state_dir):
        full = os.path.join(state_dir, d)
        if d.startswith("geo=") and os.path.isdir(full):
            out[d] = tuple(
                sorted(
                    (f, os.path.getsize(os.path.join(full, f)),
                     os.stat(os.path.join(full, f)).st_mtime_ns)
                    for f in os.listdir(full)
                    if not f.startswith(("_", "."))
                )
            )
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import (
        reference_hypercube,
    )
    from implementation_of_an_etl_process_spark.sources import (
        read_clients,
        read_contracts,
        read_invoices_bin,
    )
    from implementation_of_an_etl_process_spark.streaming.hypercube import (
        hypercube_from_lvl1,
        incremental_hypercube_sink,
        streaming_hypercube_lvl1,
    )

    spark = get_spark("fullscale-stream")
    clients = read_clients(spark, f"{DATA}/clients.csv")
    contracts = read_contracts(spark, f"{DATA}/contracts.csv")
    invoices = read_invoices_bin(spark, f"{DATA}/invoices.bin")

    work = tempfile.mkdtemp(prefix="fullscale_stream_")
    src = os.path.join(work, "src")
    state = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")
    try:
        t0 = time.monotonic()
        for i in range(N_BATCHES):
            invoices.filter(F.col("id") % N_BATCHES == i).write.mode(
                "append"
            ).parquet(src)
        stage_s = time.monotonic() - t0

        def drain() -> float:
            t = time.monotonic()
            stream = (
                spark.readStream.schema(invoices.schema)
                .option("maxFilesPerTrigger", "32")
                .parquet(src)
            )
            q = incremental_hypercube_sink(
                streaming_hypercube_lvl1(stream, contracts, clients),
                state,
                ckpt,
            ).start()
            q.awaitTermination()
            return time.monotonic() - t

        full_s = drain()
        n_inv = invoices.count()
        print(
            f"full stream: {n_inv} invoices, {N_BATCHES} staged batches, "
            f"stage {stage_s:.1f}s, stream {full_s:.1f}s "
            f"({n_inv / full_s / 1e3:.0f}k inv/s)"
        )

        before = snapshot(state)

        # one geo's invoices as a straggler micro-batch
        one_geo = clients.select("geo").first()[0]
        geo_contracts = contracts.join(
            F.broadcast(
                clients.filter(F.col("geo") == one_geo).select(
                    F.col("id").alias("cid")
                )
            ),
            F.col("id_client") == F.col("cid"),
            "left_semi",
        ).select(F.col("id").alias("gcid"))
        tail = invoices.join(
            F.broadcast(geo_contracts),
            invoices.id_contract == F.col("gcid"),
            "left_semi",
        )
        n_tail = tail.count()
        tail.coalesce(1).write.mode("append").parquet(src)
        partial_s = drain()
        after = snapshot(state)

        changed = [p for p in sorted(set(before) | set(after))
                   if before.get(p) != after.get(p)]
        print(
            f"partial batch: geo={one_geo}, {n_tail} invoices, "
            f"merge {partial_s:.1f}s, partitions changed "
            f"{len(changed)}/{len(after)} -> {changed[:5]}"
        )

        # the streamed multiset is invoices PLUS the tail batch (the
        # tail re-streams already-seen invoices, which the state must
        # count again) — read the staged source back so the batch
        # baseline aggregates exactly what was streamed
        got = hypercube_from_lvl1(spark.read.parquet(state))
        exp = reference_hypercube(
            clients, contracts, spark.read.parquet(src)
        )

        def agg(df):
            return df.agg(
                F.count(F.lit(1)).alias("groups"),
                F.sum("consumption").alias("cons"),
                F.sum("nclients").alias("ncl"),
                F.sum("ncontracts").alias("nco")
                if "ncontracts" in df.columns
                else F.sum("ncontrats").alias("nco"),
                F.sum("ninvoices").alias("ninv"),
            ).first()

        g, e = agg(got), agg(exp)
        print("cube check:", tuple(g), "==", tuple(e), "->", tuple(g) == tuple(e))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
