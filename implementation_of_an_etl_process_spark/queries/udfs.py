"""Battery entry: the UDF surface (SURVEY.md §2.2 lists it as absent
from the reference).

Demonstrates the engine's UDF discipline: an Arrow-batched
``@pandas_udf`` (vectorized, the acceptable Python path) — deliberately
NOT a row-at-a-time Python UDF. The semantics (vowel counting) is
SQL-expressible, so the entry still gets an exact oracle: the point is
exercising the pandas-UDF execution surface, not the function itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _vowel_count_udf():
    # built lazily: the pandas_udf decorator resolves its return type
    # against the ACTIVE session, which doesn't exist at import time
    @pandas_udf("int")
    def vowel_count(texts: pd.Series) -> pd.Series:
        """Arrow-batched scalar UDF: vowels per document."""
        return texts.str.lower().str.count(r"[aeiou]").astype("int32")

    return vowel_count


def pandas_udf_vowels(spark: SparkSession, sf_dir: str) -> DataFrame:
    vowel_count = _vowel_count_udf()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            "doc_id",
            vowel_count(F.col("text")).alias("n_vowels"),
            F.length("text").alias("n_chars"),
        )
        .filter(F.col("n_vowels") > 0)
        .orderBy("doc_id")
    )


PANDAS_UDF_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[aeiou]')) AS INTEGER) AS n_vowels,
       CAST(length(text) AS INTEGER) AS n_chars
FROM documents
WHERE len(regexp_extract_all(lower(text), '[aeiou]')) > 0
ORDER BY doc_id
"""


QUERIES = {"pandas_udf_vowels": pandas_udf_vowels}
ORACLES = {"pandas_udf_vowels": PANDAS_UDF_SQL}
