"""Data sources: CSV dimensions, fixed-width binary facts, parquet catalog."""

from implementation_of_an_etl_process_spark.sources.csv import (
    read_clients,
    read_contracts,
    read_invoices_csv,
)
from implementation_of_an_etl_process_spark.sources.binary import read_invoices_bin
from implementation_of_an_etl_process_spark.sources.parquet import load_tables
from implementation_of_an_etl_process_spark.sources.sinks import write_csv

__all__ = [
    "read_clients",
    "read_contracts",
    "read_invoices_csv",
    "read_invoices_bin",
    "load_tables",
    "write_csv",
]
