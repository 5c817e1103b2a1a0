#!/usr/bin/env python
"""Synthesize the reference benchmark's full-scale dataset.

The reference's published 11.5s number (BASELINE.md; reference
README.md:76-82) was measured on 1M clients / 1.6M contracts / 57.6M
invoices (922 MB binary). This regenerates that shape deterministically
(numpy seed 42) with the same schemas and value domains
(reference README.md:12-37):

- clients.csv   id 1..1M, type [1,5], geo [1,578], misc [1,6]
- contracts.csv id 1..1.6M, id_client uniform over clients,
                nature [1,5], start/end constant (never read,
                ETL.java:100-110)
- invoices.bin  16-byte big-endian records (README.md:66): int id,
                int id_contract, byte time [1,36], float amount,
                short consumption, 1 pad byte

Usage: python tools/synth_fullscale.py [out_dir] [n_invoices]
Defaults: /tmp/fullscale, 57_600_000. Runs in ~1-2 min; needs ~2 GB RAM
and ~1.1 GB disk.
"""

from __future__ import annotations

import os
import sys

import numpy as np

N_CLIENTS = 1_000_000
N_CONTRACTS = 1_600_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fullscale"
    n_inv = int(sys.argv[2]) if len(sys.argv) > 2 else 57_600_000
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    # clients.csv
    ids = np.arange(1, N_CLIENTS + 1)
    cols = np.column_stack(
        [
            ids,
            rng.integers(1, 6, N_CLIENTS),
            rng.integers(1, 579, N_CLIENTS),
            rng.integers(1, 7, N_CLIENTS),
        ]
    )
    with open(f"{out}/clients.csv", "wb") as fh:
        fh.write(b"id,type,geo,misc\n")
        np.savetxt(fh, cols, fmt="%d", delimiter=",")

    # contracts.csv (start/end never read by the engine — constants)
    cids = np.arange(1, N_CONTRACTS + 1)
    ccols = np.column_stack(
        [
            cids,
            rng.integers(1, N_CLIENTS + 1, N_CONTRACTS),
            rng.integers(1, 6, N_CONTRACTS),
            np.full(N_CONTRACTS, 201410),
            np.full(N_CONTRACTS, 201710),
        ]
    )
    with open(f"{out}/contracts.csv", "wb") as fh:
        fh.write(b"id,id_client,nature,start,end\n")
        np.savetxt(fh, ccols, fmt="%d", delimiter=",")

    # invoices.bin — written in bounded chunks to cap memory
    dtype = np.dtype(
        [
            ("id", ">i4"),
            ("id_contract", ">i4"),
            ("time", "i1"),
            ("amount", ">f4"),
            ("consumption", ">i2"),
            ("pad", "V1"),
        ]
    )
    chunk = 8_000_000
    with open(f"{out}/invoices.bin", "wb") as fh:
        for lo in range(0, n_inv, chunk):
            n = min(chunk, n_inv - lo)
            rec = np.zeros(n, dtype=dtype)
            rec["id"] = np.arange(lo + 1, lo + n + 1)
            rec["id_contract"] = rng.integers(1, N_CONTRACTS + 1, n)
            rec["time"] = rng.integers(1, 37, n)
            # amounts: 2-dp values, exactly representable scale
            rec["amount"] = (
                rng.integers(100, 100_000, n).astype(np.float32) / 100.0
            )
            rec["consumption"] = rng.integers(0, 32_000, n)
            fh.write(rec.tobytes())
    size = os.path.getsize(f"{out}/invoices.bin")
    print(f"{out}: clients={N_CLIENTS} contracts={N_CONTRACTS} "
          f"invoices={n_inv} bin={size / 1e6:.0f} MB")


if __name__ == "__main__":
    main()
