"""Spark 4 Python DataSource for the fixed-width binary invoice format.

The polished alternative to ``binary.read_invoices_bin``'s
mapInPandas-over-splits: a first-class source usable as

    spark.dataSource.register(InvoiceBinaryDataSource)
    spark.read.format("invoicebin").option("path", p).load()

``partitions()`` is the same metadata-only split planning; ``read()``
yields Arrow RecordBatches decoded by the same vectorized numpy view —
so each task streams batches without per-row Python. On a cluster the
source parallelizes identically to a parquet scan (one task per split).

Record layout (reference README.md:66, decode ETL.java:147-152):
16-byte big-endian — int id, int id_contract, byte time, float amount,
short consumption, 1 pad byte.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from implementation_of_an_etl_process_spark import schemas

DEFAULT_SPLIT_BYTES = 32 * 1024 * 1024


class InvoiceSplit(InputPartition):
    def __init__(self, path: str, offset: int, nbytes: int):
        self.path = path
        self.offset = offset
        self.nbytes = nbytes


class InvoiceBinaryReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("invoicebin source requires option 'path'")
        self.split_bytes = int(options.get("split_bytes", DEFAULT_SPLIT_BYTES))
        if self.split_bytes % schemas.INVOICE_RECORD_LEN:
            raise ValueError("split_bytes must be a multiple of 16")

    def partitions(self) -> Sequence[InputPartition]:
        files = (
            sorted(glob.glob(self.path))
            if any(c in self.path for c in "*?[")
            else [self.path]
        )
        if not files:
            raise FileNotFoundError(f"no files match {self.path!r}")
        out: list[InputPartition] = []
        for f in files:
            size = os.path.getsize(f)
            if size % schemas.INVOICE_RECORD_LEN:
                raise ValueError(f"{f}: size {size} not a multiple of 16")
            for off in range(0, size, self.split_bytes):
                out.append(
                    InvoiceSplit(f, off, min(self.split_bytes, size - off))
                )
        return out

    def read(self, partition: InvoiceSplit) -> Iterator:
        import numpy as np
        import pyarrow as pa

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
        with open(partition.path, "rb") as fh:
            fh.seek(partition.offset)
            buf = fh.read(partition.nbytes)
        arr = np.frombuffer(buf, dtype=dtype)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(arr["id"].astype("int32")),
                pa.array(arr["id_contract"].astype("int32")),
                pa.array(arr["time"].astype("int32")),
                pa.array(arr["amount"].astype("float32")),
                pa.array(arr["consumption"].astype("int32")),
            ],
            names=["id", "id_contract", "time", "amount", "consumption"],
        )


class InvoiceBinaryDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "invoicebin"

    def schema(self):
        return schemas.INVOICES

    def reader(self, schema) -> DataSourceReader:
        return InvoiceBinaryReader(self.options)
