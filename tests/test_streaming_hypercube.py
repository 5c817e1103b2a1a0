"""The flagship streaming test: the incrementally-maintained hypercube
must equal the batch reference_hypercube after the stream drains."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators import reference_hypercube
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
from tests.conftest import REF_SAMPLE

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SAMPLE), reason="reference sample not present"
)


def test_incremental_hypercube_equals_batch(spark, tmp_path):
    clients = read_clients(spark, os.path.join(REF_SAMPLE, "clients.csv"))
    contracts = read_contracts(spark, os.path.join(REF_SAMPLE, "contracts.csv"))
    invoices = read_invoices_bin(spark, os.path.join(REF_SAMPLE, "invoices.bin"))

    # stage the fact stream as 3 parquet files (3 micro-batch arrivals)
    src = tmp_path / "invoice_stream"
    for i in range(3):
        invoices.filter(F.col("id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = (
        spark.readStream.schema(invoices.schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(str(src))
    )
    lvl1 = streaming_hypercube_lvl1(stream, contracts, clients)
    q = incremental_hypercube_sink(
        lvl1, str(tmp_path / "state"), str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(300)

    got = hypercube_from_lvl1(
        spark.read.parquet(str(tmp_path / "state"))
    ).toPandas()
    expected = reference_hypercube(clients, contracts, invoices).toPandas()

    assert len(got) == len(expected)
    for c in ["geo", "type", "misc", "nature", "time", "consumption",
              "nclients", "ncontracts", "ninvoices"]:
        assert (got[c].to_numpy() == expected[c].to_numpy()).all(), c
    import numpy as np

    assert np.allclose(got["amount"], expected["amount"], atol=0.011)
