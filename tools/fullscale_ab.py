"""Controlled full-scale A/B: generic vs packed hypercube plan, plus a
DuckDB end-to-end leg as a second same-host external yardstick beside
the reference's published 11.5s.

Runs all legs back-to-back (ABAB-interleaved) in ONE session against
the full-benchmark-scale dataset (57.6M invoices), verifies the Spark
outputs are byte-identical and the DuckDB cube matches the Spark cube
value-for-value (integer measures exact, amount within 1 cent), and
prints per-run wall times. Back-to-back in-session is the only
trustworthy comparison on this host — effective throughput swings ~3x
on a minutes timescale (BASELINE_NOTES.md).

The DuckDB leg is genuinely end-to-end: its timed window includes the
numpy fixed-width binary decode (the same '>i4,i4,i1,>f4,>i2,pad'
layout our Spark source decodes executor-side), the two joins, the
5-dim aggregate with two exact COUNT DISTINCTs, and the CSV write.

Usage: python tools/fullscale_ab.py [data_dir] [rounds] [--no-duckdb]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
DATA = _ARGS[0] if _ARGS else "/tmp/fullscale"
ROUNDS = int(_ARGS[1]) if len(_ARGS) > 1 else 2
WITH_DUCKDB = "--no-duckdb" not in sys.argv


def md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as fh:
        while chunk := fh.read(1 << 20):
            h.update(chunk)
    return h.hexdigest()


DUCKDB_CUBE_SQL = """
SELECT c.geo, c.type, c.misc, k.nature, i.time,
       SUM(i.consumption) AS consumption,
       ROUND(SUM(i.amount), 2) AS amount,
       COUNT(DISTINCT k.id_client) AS nclients,
       COUNT(DISTINCT i.id_contract) AS ncontracts,
       COUNT(*) AS ninvoices
FROM invoices i
JOIN contracts k ON i.id_contract = k.id
JOIN clients c ON k.id_client = c.id
GROUP BY ALL
ORDER BY c.geo, c.type, c.misc, k.nature, i.time
"""


def run_duckdb(out: str) -> tuple[float, float]:
    """One end-to-end DuckDB pass: timed window covers binary decode,
    CSV dim ingest, the hypercube aggregate, and the CSV write.
    Returns (total_seconds, decode_seconds)."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    t0 = time.monotonic()
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
    rec = np.fromfile(os.path.join(DATA, "invoices.bin"), dtype=dtype)
    inv = pa.table(
        {
            "id_contract": rec["id_contract"].astype("int32"),
            "time": rec["time"].astype("int32"),
            "amount": rec["amount"].astype("float64"),
            "consumption": rec["consumption"].astype("int64"),
        }
    )
    t_decode = time.monotonic() - t0
    con = duckdb.connect()
    con.register("invoices", inv)
    con.execute(
        f"CREATE VIEW clients AS SELECT * FROM "
        f"read_csv('{os.path.join(DATA, 'clients.csv')}')"
    )
    con.execute(
        f"CREATE VIEW contracts AS SELECT * FROM "
        f"read_csv('{os.path.join(DATA, 'contracts.csv')}')"
    )
    con.execute(f"COPY ({DUCKDB_CUBE_SQL}) TO '{out}' (HEADER)")
    con.close()
    return time.monotonic() - t0, t_decode


def crosscheck_duckdb_vs_spark(spark_csv: str, duck_csv: str) -> None:
    """Full-scale external validation: the DuckDB cube must match the
    Spark cube row-for-row — integer measures exact, amount within one
    cent (the Spark sink prints the reference's '#.00' format; values
    under 1 print as '.47', so amount is parsed as DOUBLE)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW s AS SELECT * FROM read_csv('{spark_csv}', header=true, "
        "columns={'geo':'INT','type':'INT','misc':'INT','nature':'INT',"
        "'time':'INT','consumption':'BIGINT','amount':'DOUBLE',"
        "'nclients':'BIGINT','ncontrats':'BIGINT','ninvoices':'BIGINT'})"
    )
    con.execute(f"CREATE VIEW d AS SELECT * FROM read_csv('{duck_csv}')")
    n_s, n_d = (
        con.execute("SELECT (SELECT COUNT(*) FROM s), "
                    "(SELECT COUNT(*) FROM d)").fetchone()
    )
    bad = con.execute(
        """
        SELECT COUNT(*) FROM s JOIN d USING (geo, type, misc, nature, time)
        WHERE s.consumption <> d.consumption
           OR s.nclients <> d.nclients
           OR s.ncontrats <> d.ncontracts
           OR s.ninvoices <> d.ninvoices
           OR ABS(s.amount - d.amount) > 0.01
        """
    ).fetchone()[0]
    joined = con.execute(
        "SELECT COUNT(*) FROM s JOIN d USING (geo, type, misc, nature, time)"
    ).fetchone()[0]
    con.close()
    ok = n_s == n_d == joined and bad == 0
    print(
        f"crosscheck spark-vs-duckdb: rows {n_s}/{n_d}, joined {joined}, "
        f"mismatched {bad} -> {'OK' if ok else 'FAIL'}"
    )


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
    decode_times: list[float] = []
    if WITH_DUCKDB:
        times["duckdb"] = []
    legs = (
        (("packed", True), ("generic", False))
        if "--packed-first" in sys.argv
        else (("generic", False), ("packed", True))
    )
    for r in range(ROUNDS):
        for name, packed in legs:
            out = f"/tmp/ab_{name}.csv"
            dt = run(packed, out)
            times[name].append(dt)
            print(f"round {r} {name}: {dt:.1f}s", flush=True)
        if WITH_DUCKDB:
            dt, t_dec = run_duckdb("/tmp/ab_duckdb.csv")
            times["duckdb"].append(dt)
            decode_times.append(t_dec)
            print(
                f"round {r} duckdb: {dt:.1f}s (decode {t_dec:.1f}s)",
                flush=True,
            )
    h_g, h_p = md5("/tmp/ab_generic.csv"), md5("/tmp/ab_packed.csv")
    print(f"md5 generic={h_g} packed={h_p} identical={h_g == h_p}")
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.1f}s all={[round(t, 1) for t in ts]}")
    if WITH_DUCKDB:
        crosscheck_duckdb_vs_spark("/tmp/ab_packed.csv", "/tmp/ab_duckdb.csv")
    spark.stop()


if __name__ == "__main__":
    main()
