"""CSV scans for the star-schema dimension tables.

Replaces the reference's two-pass size-then-parse readers (reference
``ETL.java:44-74`` for clients, ``ETL.java:76-105`` for contracts) with
single-pass schema-declared scans. Column pruning the reference does by
hand (contracts ``start``/``end`` never parsed, ``ETL.java:100-110``)
falls out of Catalyst's ColumnPruning rule: callers just select the
columns they need and the scan's ReadSchema shrinks to match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from implementation_of_an_etl_process_spark import schemas


def read_clients(spark: SparkSession, path: str) -> DataFrame:
    """clients(id, type, geo, misc) — header CSV (reference README.md:12-17)."""
    return spark.read.csv(path, header=True, schema=schemas.CLIENTS)


def read_contracts(spark: SparkSession, path: str, *, pruned: bool = True) -> DataFrame:
    """contracts(id, id_client, nature[, start, end]).

    ``pruned=True`` (default) selects only the three columns any engine
    query reads, mirroring the reference's hand pruning while letting
    Catalyst do the actual work.
    """
    df = spark.read.csv(path, header=True, schema=schemas.CONTRACTS)
    return df.select("id", "id_client", "nature") if pruned else df


def read_invoices_csv(spark: SparkSession, path: str) -> DataFrame:
    """invoices(id, id_contract, time, amount, consumption) — CSV form.

    The reference never reads this form (it ingests binary only,
    reference README.md:66); provided for oracle construction and as a
    general source.
    """
    return spark.read.csv(path, header=True, schema=schemas.INVOICES)
