"""Battery entries for the data-quality operators
(``operators/quality.py``): one-scan column profiling, declarative
rule checks, referential integrity, and a rolling distinct-users
analytic built the honest distributed way (day-grid range join, since
neither engine does COUNT DISTINCT over a moving window cheaply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators.quality import (
    check_rules,
    profile,
    referential_violations,
)
from implementation_of_an_etl_process_spark.queries.relational import _t

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_totalprice",
    "o_orderstatus",
    "o_orderpriority",
]


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(
        _t(spark, sf_dir, "orders").select(*_PROFILE_COLS)
    ).orderBy("column")


def _profile_leg(col: str, kind: str) -> str:
    min_num = f"CAST(MIN({col}) AS DOUBLE)" if kind == "num" else "NULL"
    max_num = f"CAST(MAX({col}) AS DOUBLE)" if kind == "num" else "NULL"
    min_str = f"MIN({col})" if kind == "str" else "NULL"
    max_str = f"MAX({col})" if kind == "str" else "NULL"
    return f"""
SELECT '{col}' AS "column", COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       COUNT(DISTINCT {col}) AS n_distinct,
       CAST({min_num} AS DOUBLE) AS min_num,
       CAST({max_num} AS DOUBLE) AS max_num,
       CAST({min_str} AS VARCHAR) AS min_str,
       CAST({max_str} AS VARCHAR) AS max_str
FROM orders"""


PROFILE_SQL = (
    "\nUNION ALL\n".join(
        _profile_leg(c, k)
        for c, k in [
            ("o_orderkey", "num"),
            ("o_custkey", "num"),
            ("o_totalprice", "num"),
            ("o_orderstatus", "str"),
            ("o_orderpriority", "str"),
        ]
    )
    + '\nORDER BY "column"'
)


def quality_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    rules = {
        # deliberately tight so the violation path is exercised on
        # clean data (max totalprice ~500k; ~half the rows exceed 250k)
        "totalprice_under_250k": F.col("o_totalprice") < 250000.0,
        "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
        "custkey_not_null": F.col("o_custkey").isNotNull(),
        "date_in_range": (F.col("o_orderdate") >= F.lit("1990-01-01"))
        & (F.col("o_orderdate") < F.lit("2010-01-01")),
    }
    checks = check_rules(orders, rules)
    fk = referential_violations(
        orders, _t(spark, sf_dir, "customer"), "o_custkey", "c_custkey"
    ).select(
        F.lit("custkey_fk_customer").alias("check"),
        F.lit(None).cast("long").alias("n_rows"),
        F.col("n_orphans").alias("n_violations"),
        (F.col("n_orphans") == 0).alias("passed"),
    )
    return checks.unionByName(fk).orderBy("check")


CHECKS_SQL = """
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
    CAST(SUM(CASE WHEN COALESCE(o_totalprice < 250000.0, FALSE)
             THEN 0 ELSE 1 END) AS BIGINT) AS v_price,
    CAST(SUM(CASE WHEN COALESCE(o_orderstatus IN ('O','F','P'), FALSE)
             THEN 0 ELSE 1 END) AS BIGINT) AS v_status,
    CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
      AS v_cust,
    CAST(SUM(CASE WHEN COALESCE(
             o_orderdate >= TIMESTAMP '1990-01-01 00:00:00'
             AND o_orderdate < TIMESTAMP '2010-01-01 00:00:00', FALSE)
             THEN 0 ELSE 1 END) AS BIGINT) AS v_date
  FROM orders
), fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders o
  WHERE o.o_custkey IS NULL OR NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT 'custkey_fk_customer' AS "check", CAST(NULL AS BIGINT) AS n_rows,
       v AS n_violations, v = 0 AS passed FROM fk
UNION ALL
SELECT 'custkey_not_null', n_rows, v_cust, v_cust = 0 FROM agg
UNION ALL
SELECT 'date_in_range', n_rows, v_date, v_date = 0 FROM agg
UNION ALL
SELECT 'status_in_domain', n_rows, v_status, v_status = 0 FROM agg
UNION ALL
SELECT 'totalprice_under_250k', n_rows, v_price, v_price = 0 FROM agg
ORDER BY "check"
"""


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users active in the trailing 7 days, per day. Neither
    engine supports COUNT DISTINCT over a RANGE window without
    re-expansion, so both sides use the explicit day-grid range join —
    on Spark the (day x active-day) pre-aggregate keeps the join input
    at |users x days| rather than |events|."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = ev.select("day").distinct().alias("d")
    joined = days.join(
        ev.alias("e"),
        (F.col("e.day") <= F.col("d.day"))
        & (F.col("e.day") >= F.date_sub(F.col("d.day"), 6)),
    )
    return (
        joined.groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("e.user_id").alias("active_users"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "active_users"
        )
        .orderBy("day")
    )


ROLLING_SQL = """
WITH ev AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), days AS (SELECT DISTINCT day FROM ev)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       COUNT(DISTINCT e.user_id) AS active_users
FROM days d JOIN ev e
  ON e.day <= d.day AND e.day >= d.day - INTERVAL 6 DAY
GROUP BY d.day
ORDER BY day
"""


def observed_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass write + audit: parquet-write orders to a scratch dir
    while an Observation collects row count, null rate, decimal-exact
    revenue, and status-domain violations in the SAME job — no second
    scan. The returned frame is the audit record an ETL pipeline would
    log/alert on; the oracle recomputes it declaratively."""
    import shutil
    import tempfile

    from implementation_of_an_etl_process_spark.operators.quality import (
        write_with_audit,
    )

    orders = _t(spark, sf_dir, "orders")
    out = tempfile.mkdtemp(prefix="audit_write_")
    try:
        got = write_with_audit(
            orders,
            f"{out}/orders",
            {
                "n_rows": F.count(F.lit(1)),
                "n_null_cust": F.sum(
                    F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
                ).cast("long"),
                "total_price": F.sum(
                    F.col("o_totalprice").cast("decimal(20,6)")
                ).cast("double"),
                "n_bad_status": F.sum(
                    F.when(
                        F.col("o_orderstatus").isin("O", "F", "P"), 0
                    ).otherwise(1)
                ).cast("long"),
            },
        )
        return spark.createDataFrame(
            [
                (
                    int(got["n_rows"]),
                    int(got["n_null_cust"]),
                    float(got["total_price"]),
                    int(got["n_bad_status"]),
                )
            ],
            "n_rows long, n_null_cust long, total_price double, n_bad_status long",
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


OBSERVED_AUDIT_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_cust,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
         AS total_price,
       CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)
            AS BIGINT) AS n_bad_status
FROM orders
"""


QUERIES = {
    "observed_write_audit": observed_write_audit,
    "profile_orders": profile_orders,
    "quality_checks_orders": quality_checks_orders,
    "rolling_active_users": rolling_active_users,
}

ORACLES = {
    "observed_write_audit": OBSERVED_AUDIT_SQL,
    "profile_orders": PROFILE_SQL,
    "quality_checks_orders": CHECKS_SQL,
    "rolling_active_users": ROLLING_SQL,
}
