"""Battery entries for the modern Spark SQL surface (Spark 4.x):
recursive CTEs, lateral correlated subqueries, the VARIANT semi-
structured type, Python UDTFs (table functions), and SQL-language
scalar UDFs.

These are capabilities the reference engine (a single fixed query,
ETL.java) never needed, but a general engine replacing it must offer —
each is exercised end-to-end under the DuckDB oracle gate.

Scale notes:
- The recursive CTE drives a bounded calendar series (one row per
  month of orderdate span — dozens of rows regardless of fact-table
  size); the heavy side stays a single hash aggregate over orders.
- The lateral top-k is the "top N per group" shape; Catalyst plans the
  correlated limit as a ranked window — one shuffle on the group key.
- VARIANT extraction is JVM-columnar (no Python); shredded access
  costs about one struct field read per path.
- The Python UDTF is deliberately bounded (docs slice): UDTFs are the
  row-at-a-time Python path, kept for API parity — the vectorized
  equivalents live in udfs.py / textops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# Recursive CTE — calendar month series spanning orderdate, left-joined
# back to orders so empty months would surface as zero rows.
# ---------------------------------------------------------------------------


def recursive_cte_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month spine + per-month order counts. The
    recursion depth is the orderdate span in months (bounded data-
    independent small number; default cteRecursionLevelLimit=100
    comfortably covers the ~6-year TPC-H span at any SF).

    The spine bounds are pre-aggregated ONCE into literals: a scalar
    subquery inside the recursive step re-executes per iteration
    (measured 20s -> 0.7s at sf0.01 for 80 iterations), and min/max
    is a 2-value bounded aggregate — the same contract as a broadcast.
    """
    orders = f"parquet.`{sf_dir}/orders.parquet`"
    lo, hi = (
        spark.sql(
            f"""SELECT date_format(date_trunc('month', MIN(o_orderdate)),
                                   'yyyy-MM-dd HH:mm:ss') AS lo,
                       date_format(date_trunc('month', MAX(o_orderdate)),
                                   'yyyy-MM-dd HH:mm:ss') AS hi
                FROM {orders}"""
        ).first()
    )
    return spark.sql(f"""
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '{lo}'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '{hi}'
        )
        SELECT date_format(m, 'yyyy-MM') AS month,
               COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN {orders}
          ON date_trunc('month', o_orderdate) = m
        GROUP BY m ORDER BY m
    """)


RECURSIVE_CTE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT date_trunc('month', MIN(o_orderdate)) FROM orders
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < (SELECT date_trunc('month', MAX(o_orderdate)) FROM orders)
)
SELECT strftime(m, '%Y-%m') AS month, COUNT(o_orderkey) AS n_orders
FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY m ORDER BY m
"""


# ---------------------------------------------------------------------------
# Lateral correlated subquery — top-3 customers per nation by balance.
# ---------------------------------------------------------------------------


def lateral_topk_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL (correlated ORDER BY .. LIMIT) — the declarative
    "top N per group". Unique c_custkey tiebreak keeps the cut
    deterministic across engines."""
    return spark.sql(f"""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM parquet.`{sf_dir}/nation.parquet` n,
        LATERAL (
          SELECT c_custkey, c_acctbal
          FROM parquet.`{sf_dir}/customer.parquet` c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 3
        ) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
    """)


LATERAL_TOPK_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 3
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
"""


# ---------------------------------------------------------------------------
# VARIANT — semi-structured ingestion: JSON-encode each order row,
# parse_json into a VARIANT, extract typed paths back out. The oracle
# is the roundtrip identity (extracted values == source columns), which
# pins both the JSON encoding and the variant path semantics.
# ---------------------------------------------------------------------------


def variant_order_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json -> VARIANT -> variant_get typed extraction, with a
    try_variant_get miss surfacing as NULL. Doubles roundtrip exactly
    (JSON shortest-repr preserves IEEE 754)."""
    return spark.sql(f"""
        WITH j AS (
          SELECT o_orderkey,
                 parse_json(to_json(struct(
                   o_orderkey, o_orderstatus,
                   struct(o_totalprice AS total) AS amounts
                 ))) AS v
          FROM parquet.`{sf_dir}/orders.parquet`
          WHERE o_orderkey <= 500
        )
        SELECT o_orderkey,
               variant_get(v, '$.o_orderstatus', 'string') AS status,
               variant_get(v, '$.amounts.total', 'double') AS total,
               try_variant_get(v, '$.missing', 'int') AS missing
        FROM j ORDER BY o_orderkey
    """)


VARIANT_SQL = """
SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS total,
       CAST(NULL AS INTEGER) AS missing
FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Python UDTF — a table function splitting documents into positioned
# words, applied via LATERAL join. Bounded slice: UDTFs are the
# row-at-a-time Python path (API-surface coverage, not the hot path —
# the vectorized token pipeline is operators/text.py).
# ---------------------------------------------------------------------------


def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):  # noqa: ANN001
            if text is None:
                return
            for i, w in enumerate(text.split()):
                yield (w, i)

    # registration is per-session idempotent; entries are called with
    # the driver's session, so register at call time
    spark.udtf.register("split_words", SplitWords)
    return spark.sql(f"""
        SELECT doc_id, s.word, s.pos
        FROM parquet.`{sf_dir}/documents.parquet` d,
        LATERAL split_words(trim(d.text)) s
        WHERE doc_id < 50 AND length(trim(text)) > 0
        ORDER BY doc_id, pos
    """)
    # length(trim(..)) > 0 on BOTH sides: on empty docs the UDTF yields
    # no row (doc dropped) while DuckDB's regexp_split_to_array('')
    # yields [''] (a ('', 0) row) — filtered out so a regenerated
    # testdata with empty docs can't flake the hash.


UDTF_WORDS_SQL = r"""
WITH parts AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS p
  FROM documents WHERE doc_id < 50 AND length(trim(text)) > 0
)
SELECT doc_id, u.s.word AS word, u.s.pos AS pos
FROM parts,
     UNNEST(list_transform(p, (w, i) -> {'word': w, 'pos': i - 1})) AS u(s)
ORDER BY doc_id, pos
"""


# ---------------------------------------------------------------------------
# SQL-language scalar UDF (CREATE FUNCTION ... RETURN expr) — the
# engine-portable way to package reusable business logic without
# leaving codegen (unlike Python UDFs, SQL UDFs inline into the plan).
# ---------------------------------------------------------------------------


def sql_udf_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 50000 THEN 'low'
                    WHEN p < 150000 THEN 'mid'
                    ELSE 'high' END
    """)
    return spark.sql(f"""
        SELECT price_band(o_totalprice) AS band, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
                 AS total
        FROM parquet.`{sf_dir}/orders.parquet`
        GROUP BY 1 ORDER BY band
    """)


SQL_UDF_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS band,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total
FROM orders GROUP BY 1 ORDER BY band
"""


def udtf_polymorphic_first_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF: the ``analyze()`` static method computes
    the OUTPUT SCHEMA from a constant argument at plan time (here n=3
    -> columns w0..w2), Spark 4's table-function answer to
    variable-shape results. Bounded docs slice, fixed n, so the oracle
    schema is fixed too."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import IntegerType, StringType, StructType

    @udtf
    class FirstWords:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n.value, int) or n.value < 1:
                raise ValueError("n must be a constant positive int")
            st = StructType().add("doc_len", IntegerType())
            for i in range(n.value):
                st = st.add(f"w{i}", StringType())
            return AnalyzeResult(st)

        def eval(self, text: str, n: int):  # noqa: ANN001
            if text is None:
                return
            ws = text.split()
            yield (
                len(ws),
                *[(ws[i] if i < len(ws) else None) for i in range(n)],
            )

    spark.udtf.register("first_words", FirstWords)
    return spark.sql(f"""
        SELECT doc_id, s.doc_len, s.w0, s.w1, s.w2
        FROM parquet.`{sf_dir}/documents.parquet` d,
        LATERAL first_words(trim(d.text), 3) s
        WHERE doc_id < 50 AND length(trim(text)) > 0
        ORDER BY doc_id
    """)
    # empty-doc filter on both sides for the same reason as
    # udtf_word_positions: '' splits to [] here but [''] in DuckDB


UDTF_POLY_SQL = r"""
WITH parts AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS p
  FROM documents WHERE doc_id < 50 AND length(trim(text)) > 0
)
SELECT doc_id, CAST(len(p) AS INTEGER) AS doc_len,
       p[1] AS w0, p[2] AS w1, p[3] AS w2
FROM parts ORDER BY doc_id
"""


QUERIES = {
    "recursive_cte_months": recursive_cte_months,
    "lateral_topk_nation": lateral_topk_nation,
    "variant_order_json": variant_order_json,
    "udtf_word_positions": udtf_word_positions,
    "udtf_polymorphic_first_words": udtf_polymorphic_first_words,
    "sql_udf_price_band": sql_udf_price_band,
}

ORACLES = {
    "recursive_cte_months": RECURSIVE_CTE_SQL,
    "lateral_topk_nation": LATERAL_TOPK_SQL,
    "variant_order_json": VARIANT_SQL,
    "udtf_word_positions": UDTF_WORDS_SQL,
    "udtf_polymorphic_first_words": UDTF_POLY_SQL,
    "sql_udf_price_band": SQL_UDF_SQL,
}
