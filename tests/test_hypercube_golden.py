"""Golden end-to-end test: the reference query on the reference's own
sample data, verified against a DuckDB oracle (SURVEY.md §5 item 1).

The oracle ingests ``invoices.bin`` through an independent numpy decode
(bin != csv — SURVEY.md §1.4), runs ``hypercube.sql`` semantics in
DuckDB, and the Spark result must match row-for-row with amount within
±0.01 (float-summation order tolerance, FIXTURES.md).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.conftest import REF_SAMPLE

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SAMPLE), reason="reference sample not present"
)

ORACLE_SQL = """
SELECT geo, type, misc, nature, time,
       SUM(consumption) AS consumption,
       ROUND(SUM(amount), 2) AS amount,
       COUNT(DISTINCT c.id) AS nclients,
       COUNT(DISTINCT k.id) AS ncontracts,
       COUNT(*) AS ninvoices
FROM clients c
JOIN contracts k ON c.id = k.id_client
JOIN invoices i ON i.id_contract = k.id
GROUP BY geo, type, misc, nature, time
ORDER BY geo, type, misc, nature, time
"""


def decode_bin_numpy(path: str) -> pd.DataFrame:
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
    arr = np.fromfile(path, dtype=dtype)
    return pd.DataFrame(
        {
            "id": arr["id"].astype("int32"),
            "id_contract": arr["id_contract"].astype("int32"),
            "time": arr["time"].astype("int32"),
            "amount": arr["amount"].astype("float64"),
            "consumption": arr["consumption"].astype("int32"),
        }
    )


def oracle_cube() -> pd.DataFrame:
    con = duckdb.connect()
    invoices = decode_bin_numpy(os.path.join(REF_SAMPLE, "invoices.bin"))
    con.register("invoices", invoices)
    con.execute(
        f"CREATE VIEW clients AS SELECT * FROM read_csv_auto('{REF_SAMPLE}/clients.csv')"
    )
    con.execute(
        f"CREATE VIEW contracts AS SELECT * FROM read_csv_auto('{REF_SAMPLE}/contracts.csv')"
    )
    return con.execute(ORACLE_SQL).df()


def test_binary_reader_matches_numpy(spark):
    from implementation_of_an_etl_process_spark.sources import read_invoices_bin

    df = read_invoices_bin(spark, os.path.join(REF_SAMPLE, "invoices.bin"))
    expected = decode_bin_numpy(os.path.join(REF_SAMPLE, "invoices.bin"))
    assert df.count() == len(expected) == 58176
    got = df.orderBy("id", "id_contract", "time", "consumption").toPandas()
    exp = expected.sort_values(
        ["id", "id_contract", "time", "consumption"]
    ).reset_index(drop=True)
    assert (got["id"].to_numpy() == exp["id"].to_numpy()).all()
    assert (got["id_contract"].to_numpy() == exp["id_contract"].to_numpy()).all()
    assert (got["time"].to_numpy() == exp["time"].to_numpy()).all()
    assert (got["consumption"].to_numpy() == exp["consumption"].to_numpy()).all()
    assert np.allclose(got["amount"].to_numpy(), exp["amount"].to_numpy())


def test_hypercube_golden(spark):
    from implementation_of_an_etl_process_spark.operators import reference_hypercube
    from implementation_of_an_etl_process_spark.sources import (
        read_clients,
        read_contracts,
        read_invoices_bin,
    )

    clients = read_clients(spark, os.path.join(REF_SAMPLE, "clients.csv"))
    contracts = read_contracts(spark, os.path.join(REF_SAMPLE, "contracts.csv"))
    invoices = read_invoices_bin(spark, os.path.join(REF_SAMPLE, "invoices.bin"))

    got = reference_hypercube(clients, contracts, invoices).toPandas()
    exp = oracle_cube()

    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    for c in ["geo", "type", "misc", "nature", "time"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), f"dim {c} mismatch"
    for c in ["consumption", "nclients", "ncontracts", "ninvoices"]:
        assert (
            got[c].to_numpy().astype("int64") == exp[c].to_numpy().astype("int64")
        ).all(), f"measure {c} mismatch"
    # amount: ±0.01 tolerance for float-sum order dependence (FIXTURES.md)
    assert np.allclose(got["amount"], exp["amount"], atol=0.011), (
        "amount out of tolerance"
    )


def test_hypercube_packed_matches_generic(spark):
    """The packed single-long-key plan (operators/hypercube.py
    ``_packed_reference_cube``) must be result-identical to the generic
    multi-column plan on the reference's own sample."""
    from implementation_of_an_etl_process_spark.operators import reference_hypercube
    from implementation_of_an_etl_process_spark.sources import (
        read_clients,
        read_contracts,
        read_invoices_bin,
    )

    clients = read_clients(spark, os.path.join(REF_SAMPLE, "clients.csv"))
    contracts = read_contracts(spark, os.path.join(REF_SAMPLE, "contracts.csv"))
    invoices = read_invoices_bin(spark, os.path.join(REF_SAMPLE, "invoices.bin"))

    packed = reference_hypercube(clients, contracts, invoices, packed=True)
    generic = reference_hypercube(clients, contracts, invoices, packed=False)
    assert packed.columns == generic.columns
    p, g = packed.toPandas(), generic.toPandas()
    assert len(p) == len(g)
    for c in [
        "geo", "type", "misc", "nature", "time",
        "consumption", "nclients", "ncontracts", "ninvoices",
    ]:
        assert (p[c].to_numpy() == g[c].to_numpy()).all(), f"{c} mismatch"
    assert np.allclose(p["amount"], g["amount"], atol=0.011)


def test_hypercube_packed_guards(spark):
    """Out-of-budget dims fall back (auto) or raise (forced); a time
    outside signed-byte range fails loudly instead of mis-packing."""
    from pyspark.sql import functions as F

    from implementation_of_an_etl_process_spark.operators import reference_hypercube

    clients = spark.createDataFrame(
        [(1, 1, 2**30, 1)], "id int, type int, geo int, misc int"
    )
    contracts = spark.createDataFrame(
        [(1, 1, 2)], "id int, id_client int, nature int"
    )
    invoices = spark.createDataFrame(
        [(1, 3, 1.0, 2)], "id_contract int, time int, amount float, consumption int"
    )
    # geo = 2^30 exceeds the packed budget: auto falls back and still answers
    out = reference_hypercube(clients, contracts, invoices).collect()
    assert len(out) == 1 and out[0]["geo"] == 2**30
    with pytest.raises(ValueError, match="bit budgets"):
        reference_hypercube(clients, contracts, invoices, packed=True)

    ok_clients = clients.withColumn("geo", F.lit(5))
    bad_time = invoices.withColumn("time", F.lit(300))
    cube = reference_hypercube(ok_clients, contracts, bad_time, packed=True)
    with pytest.raises(Exception, match="signed-byte range"):
        cube.collect()


def test_hypercube_duplicate_facts_do_not_inflate_distincts(spark):
    """Property from SURVEY.md §5.3: duplicated fact rows must not change
    nclients/ncontracts (the reference dedupes by id in its per-group
    sets, ETL.java:170,242)."""
    from implementation_of_an_etl_process_spark.operators import reference_hypercube
    from implementation_of_an_etl_process_spark.sources import (
        read_clients,
        read_contracts,
        read_invoices_bin,
    )

    clients = read_clients(spark, os.path.join(REF_SAMPLE, "clients.csv"))
    contracts = read_contracts(spark, os.path.join(REF_SAMPLE, "contracts.csv"))
    invoices = read_invoices_bin(spark, os.path.join(REF_SAMPLE, "invoices.bin"))
    doubled = invoices.union(invoices)

    base = reference_hypercube(clients, contracts, invoices).toPandas()
    dup = reference_hypercube(clients, contracts, doubled).toPandas()
    assert (dup["nclients"].to_numpy() == base["nclients"].to_numpy()).all()
    assert (dup["ncontracts"].to_numpy() == base["ncontracts"].to_numpy()).all()
    assert (dup["ninvoices"].to_numpy() == 2 * base["ninvoices"].to_numpy()).all()
