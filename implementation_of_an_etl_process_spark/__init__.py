"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL engine (``CharlesMasson/Implementation-of-an-ETL-process``):
star-schema ingest (CSV dimensions + fixed-width binary fact records),
broadcast-join denormalization, multi-dimensional hypercube aggregation
with exact distinct counts, and an ordered CSV sink — generalized into a
library of composable DataFrame->DataFrame operators, plus the operator
families a large-scale training-data pipeline needs (deduplication,
similarity search, text analysis, multimodal columns, streaming).

Design stance (see SURVEY.md §7): declare logical plans with the
DataFrame/SQL API and let Catalyst/Tungsten pick physical strategies.
No RDD hot paths; Python touches per-record data only in the fixed-width
binary decoder (vectorized via numpy) and clearly-marked Pandas UDFs.
"""

from implementation_of_an_etl_process_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
