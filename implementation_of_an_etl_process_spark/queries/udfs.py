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

from implementation_of_an_etl_process_spark.queries.relational import _t
from implementation_of_an_etl_process_spark.sources.parquet import read_table


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
    docs = read_table(spark, sf_dir, "documents")
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


def _wavg_udf():
    # Series -> scalar type hints make this a GROUPED_AGG pandas UDF.
    # Integer-cents math keeps it hash-exact: both sums are exact int64
    # (well under 2^53), so the final double division matches SQL's.
    @pandas_udf("double")
    def wavg(wx: pd.Series, w: pd.Series) -> float:
        return float(wx.sum()) / float(w.sum())

    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg(), so the row count is a pandas UDF as well.
    @pandas_udf("long")
    def pcount(w: pd.Series) -> int:
        return len(w)

    return wavg, pcount


def pandas_grouped_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via GROUPED_AGG pandas UDF: nation-weighted
    average account balance (in cents) per market segment."""
    wavg, pcount = _wavg_udf()
    cust = read_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
        (F.col("c_nationkey") + 1).cast("long").alias("w"),
    )
    return (
        cust.withColumn("wx", F.col("w") * F.col("cents"))
        .groupBy("c_mktsegment")
        .agg(
            wavg(F.col("wx"), F.col("w")).alias("weighted_avg_cents"),
            pcount(F.col("w")).alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


GROUPED_AGG_SQL = """
WITH c AS (
  SELECT c_mktsegment,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         CAST(c_nationkey + 1 AS BIGINT) AS w
  FROM customer
)
SELECT c_mktsegment,
       CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
         AS weighted_avg_cents,
       COUNT(*) AS n_customers
FROM c
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def apply_in_pandas_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group transform via applyInPandas: min-max normalize each
    customer's balance (cents) within its market segment. Exact-int
    numerator/denominator, so the double ratio is oracle-identical."""
    import pandas as pd  # noqa: F811 — needed inside the worker closure

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["cents"].min(), pdf["cents"].max()
        span = mx - mn
        pdf["norm"] = (
            (pdf["cents"] - mn) / span if span else 0.0
        )
        return pdf[["c_custkey", "c_mktsegment", "norm"]]

    out = cust.groupBy("c_mktsegment").applyInPandas(
        norm, "c_custkey long, c_mktsegment string, norm double"
    )
    return out.orderBy("c_custkey")


APPLY_IN_PANDAS_SQL = """
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
), spans AS (
  SELECT *, MIN(cents) OVER w AS mn, MAX(cents) OVER w AS mx
  FROM c WINDOW w AS (PARTITION BY c_mktsegment)
)
SELECT c_custkey, c_mktsegment,
       CASE WHEN mx = mn THEN 0.0
            ELSE (cents - mn) * 1.0 / (mx - mn) END AS norm
FROM spans
ORDER BY c_custkey
"""


def cogroup_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup().applyInPandas — arbitrary per-key pandas logic over TWO
    grouped relations at once (the API a plain join+agg can't express
    when per-key logic needs both sides' full frames). Here each key
    sees the customer row and ALL their orders; spend sums integer
    cents so per-group float summation order can't flake the hash.
    Both sides shuffle once on the key — cogroup is a co-partitioned
    merge, not a driver collect."""
    import pandas as pd

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.round(F.col("o_totalprice") * 100)).cast("long").alias("cents"),
    )

    def merge(cpdf: pd.DataFrame, opdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cpdf):  # orders whose customer is absent: skip
            return pd.DataFrame(
                columns=["c_custkey", "c_mktsegment", "n_orders", "spend"]
            )
        return pd.DataFrame(
            {
                "c_custkey": [int(cpdf["c_custkey"].iloc[0])],
                "c_mktsegment": [cpdf["c_mktsegment"].iloc[0]],
                "n_orders": [int(len(opdf))],
                "spend": [int(opdf["cents"].sum()) if len(opdf) else 0],
            }
        )

    out = (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            merge,
            "c_custkey long, c_mktsegment string, n_orders long, spend long",
        )
    )
    return out.orderBy("c_custkey")


COGROUP_SQL = """
SELECT c.c_custkey, c.c_mktsegment,
       CAST(COUNT(o.o_custkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
            AS BIGINT) AS spend
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment
ORDER BY c.c_custkey
"""


def arrow_python_udf_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (useArrow=True): row-wise Python with
    Arrow-batched transfer — the middle ground between classic pickled
    UDFs (~10x slower serialization) and pandas_udf (vectorized, but a
    different programming model). Deterministic string ops, exact
    oracle."""
    from pyspark.sql.functions import udf

    rev = udf(
        lambda s: None if s is None else s[::-1],
        "string",
        useArrow=True,
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return part.select(
        "p_partkey",
        rev(F.col("p_name")).alias("rev_name"),
        F.length("p_name").alias("name_len"),
    ).orderBy("p_partkey")


ARROW_UDF_SQL = """
SELECT p_partkey, reverse(p_name) AS rev_name,
       CAST(length(p_name) AS INTEGER) AS name_len
FROM part WHERE p_partkey < 500 ORDER BY p_partkey
"""


QUERIES = {
    "arrow_python_udf_reverse": arrow_python_udf_reverse,
    "cogroup_customer_orders": cogroup_customer_orders,
    "pandas_udf_vowels": pandas_udf_vowels,
    "pandas_grouped_weighted_avg": pandas_grouped_weighted_avg,
    "apply_in_pandas_minmax": apply_in_pandas_minmax,
}
ORACLES = {
    "arrow_python_udf_reverse": ARROW_UDF_SQL,
    "cogroup_customer_orders": COGROUP_SQL,
    "pandas_udf_vowels": PANDAS_UDF_SQL,
    "pandas_grouped_weighted_avg": GROUPED_AGG_SQL,
    "apply_in_pandas_minmax": APPLY_IN_PANDAS_SQL,
}
