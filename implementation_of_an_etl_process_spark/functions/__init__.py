"""Expression builders shared by operators and the query battery.

All JVM-side Column expressions (whole-stage codegen) — no Python UDFs.
"""

from implementation_of_an_etl_process_spark.functions.text_exprs import (
    tokens,
    word_shingles,
    rolling_hash,
)
from implementation_of_an_etl_process_spark.functions.vectors import (
    quantize_vec,
    int_dot,
    int_cosine,
)

__all__ = [
    "tokens",
    "word_shingles",
    "rolling_hash",
    "quantize_vec",
    "int_dot",
    "int_cosine",
]
