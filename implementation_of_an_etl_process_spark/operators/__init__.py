"""Composable DataFrame->DataFrame operators."""

from implementation_of_an_etl_process_spark.operators.hypercube import (
    build_cube,
    denormalize,
    reference_hypercube,
)

__all__ = ["build_cube", "denormalize", "reference_hypercube"]
