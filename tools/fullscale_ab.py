"""Controlled full-scale A/B: generic vs packed hypercube plan.

Runs both plans back-to-back (ABAB) in ONE session against the
full-benchmark-scale dataset (57.6M invoices), verifies the output
files are byte-identical, and prints per-run wall times. Back-to-back
in-session is the only trustworthy comparison on this host — effective
throughput swings ~3x on a minutes timescale (BASELINE_NOTES.md).

Usage: python tools/fullscale_ab.py [data_dir] [rounds]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fullscale"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as fh:
        while chunk := fh.read(1 << 20):
            h.update(chunk)
    return h.hexdigest()


def main() -> None:
    import os

    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import reference_hypercube
    from implementation_of_an_etl_process_spark.sources import (
        read_clients,
        read_contracts,
        read_invoices_bin,
        write_csv,
    )

    spark = get_spark("fullscale-ab", master="local[32]", shuffle_partitions=128)
    clients = read_clients(spark, os.path.join(DATA, "clients.csv"))
    contracts = read_contracts(spark, os.path.join(DATA, "contracts.csv"))
    invoices = read_invoices_bin(
        spark, os.path.join(DATA, "invoices.bin"),
        split_bytes=16 * 1024 * 1024, keep_id=False,
    )

    def run(packed: bool, out: str) -> float:
        t0 = time.monotonic()
        cube = reference_hypercube(clients, contracts, invoices, packed=packed)
        write_csv(cube, out, single_file=True)
        return time.monotonic() - t0

    times: dict[str, list[float]] = {"generic": [], "packed": []}
    for r in range(ROUNDS):
        for name, packed in (("generic", False), ("packed", True)):
            out = f"/tmp/ab_{name}.csv"
            dt = run(packed, out)
            times[name].append(dt)
            print(f"round {r} {name}: {dt:.1f}s", flush=True)
    h_g, h_p = md5("/tmp/ab_generic.csv"), md5("/tmp/ab_packed.csv")
    print(f"md5 generic={h_g} packed={h_p} identical={h_g == h_p}")
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.1f}s all={[round(t, 1) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
