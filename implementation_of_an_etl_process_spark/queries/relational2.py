"""Second relational battery: outer joins, aggregate subqueries,
GROUPING SETS (SQL API), array aggregation, exact percentiles, lag/lead
windows, RANGE (value-based) window frames, unpivot/melt, OFFSET
pagination, HAVING, null handling, date arithmetic, explode.

Same determinism discipline as ``relational`` (decimal-exact sums,
BIGINT casts, string temporals, total orders under LIMIT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.queries.relational import (
    _DEC,
    _dsum,
    _dsum_sql,
    _t,
)


# --- outer joins -----------------------------------------------------------


def left_join_part_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts LEFT JOIN their lineitems — parts never ordered stay with
    zero counts (the outer-join semantics the reference lacks)."""
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        part.join(lineitem, part.p_partkey == lineitem.l_partkey, "left_outer")
        .groupBy("p_partkey", "p_brand")
        .agg(
            F.count("l_orderkey").alias("n_items"),  # counts non-null only
            _dsum(F.coalesce(F.col("l_quantity"), F.lit(0.0)), "total_qty"),
        )
        .orderBy("p_partkey")
    )


LEFT_JOIN_SQL = f"""
SELECT p_partkey, p_brand, COUNT(l_orderkey) AS n_items,
       {_dsum_sql("COALESCE(l_quantity, 0.0)", "total_qty")}
FROM part LEFT OUTER JOIN lineitem ON p_partkey = l_partkey
GROUP BY p_partkey, p_brand ORDER BY p_partkey
"""


def full_outer_buyer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN of early vs late buyer cohorts per customer."""
    orders = _t(spark, sf_dir, "orders")
    early = (
        orders.filter(F.col("o_orderdate") < F.lit("1997-01-01"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_early"))
        .select(F.col("o_custkey").alias("ek"), "n_early")
    )
    late = (
        orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_late"))
        .select(F.col("o_custkey").alias("lk"), "n_late")
    )
    return (
        early.join(late, early.ek == late.lk, "full_outer")
        .select(
            F.coalesce("ek", "lk").alias("custkey"),
            F.coalesce("n_early", F.lit(0)).alias("n_early"),
            F.coalesce("n_late", F.lit(0)).alias("n_late"),
        )
        .orderBy("custkey")
    )


FULL_OUTER_SQL = """
WITH early AS (
  SELECT o_custkey AS ek, COUNT(*) AS n_early FROM orders
  WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY o_custkey
), late AS (
  SELECT o_custkey AS lk, COUNT(*) AS n_late FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00' GROUP BY o_custkey
)
SELECT COALESCE(ek, lk) AS custkey,
       CAST(COALESCE(n_early, 0) AS BIGINT) AS n_early,
       CAST(COALESCE(n_late, 0) AS BIGINT) AS n_late
FROM early FULL OUTER JOIN late ON ek = lk
ORDER BY custkey
"""


# --- aggregate subquery (Q17-shaped) ---------------------------------------


def subquery_above_avg_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems priced above their part's average — the scalar-subquery
    pattern, expressed as an aggregate join (what any engine rewrites a
    correlated subquery into)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    avg_per_part = lineitem.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price")
    )
    return (
        lineitem.join(F.broadcast(avg_per_part), "l_partkey")
        .filter(F.col("l_extendedprice") > F.col("avg_price"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            _dsum("l_extendedprice", "sum_above"),
        )
        .orderBy("l_partkey")
    )


SUBQUERY_SQL = f"""
WITH avg_per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*)
           AS avg_price
  FROM lineitem GROUP BY l_partkey
)
SELECT l.l_partkey, COUNT(*) AS n_above,
       {_dsum_sql("l.l_extendedprice", "sum_above")}
FROM lineitem l JOIN avg_per_part a ON l.l_partkey = a.l_partkey
WHERE l.l_extendedprice > a.avg_price
GROUP BY l.l_partkey ORDER BY l.l_partkey
"""


# --- GROUPING SETS via the SQL API -----------------------------------------


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
                 AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       {_dsum_sql("o_totalprice", "total_price")}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# --- array aggregation -----------------------------------------------------


def array_agg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            # String, not array<string>: the correctness driver canonicalizes
            # by sorting pandas columns, and raw list cells are unhashable.
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias(
                "segments"
            ),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("n_name")
    )


ARRAY_AGG_SQL = """
SELECT n_name,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments,
       COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# --- exact median (manual midpoint: engine-identical arithmetic) -----------


def median_retail_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-brand median via row_number midpoints — written out
    manually so both engines compute (lo+hi)/2 with identical doubles
    (percentile implementations differ in interpolation arithmetic)."""
    part = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").asc(), F.col("p_partkey").asc()
    )
    ranked = part.select(
        "p_brand",
        "p_retailprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("p_brand")).alias("n"),
    )
    mid = ranked.filter(
        ((F.col("n") % 2 == 1) & (F.col("rn") == (F.col("n") + 1) / 2))
        | (
            (F.col("n") % 2 == 0)
            & ((F.col("rn") == F.col("n") / 2) | (F.col("rn") == F.col("n") / 2 + 1))
        )
    )
    return (
        mid.groupBy("p_brand")
        .agg(
            (F.sum("p_retailprice") / F.count(F.lit(1))).alias("median_price"),
            F.max("n").alias("n_parts"),
        )
        .orderBy("p_brand")
    )


MEDIAN_SQL = """
WITH ranked AS (
  SELECT p_brand, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice ASC, p_partkey ASC) AS rn,
         COUNT(*) OVER (PARTITION BY p_brand) AS n
  FROM part
), mid AS (
  SELECT * FROM ranked
  WHERE (n % 2 = 1 AND rn = (n + 1) / 2)
     OR (n % 2 = 0 AND rn IN (n / 2, n / 2 + 1))
)
SELECT p_brand,
       SUM(p_retailprice) / COUNT(*) AS median_price,
       CAST(MAX(n) AS BIGINT) AS n_parts
FROM mid GROUP BY p_brand ORDER BY p_brand
"""


# --- lag/lead windows ------------------------------------------------------


def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("days_since_prev"),
            F.datediff(
                F.lead("o_orderdate").over(w), F.col("o_orderdate")
            ).alias("days_to_next"),
        )
        .filter(F.col("days_since_prev").isNotNull())
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_GAPS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate) AS INTEGER)
         AS days_since_prev,
       CAST(date_diff('day', o_orderdate, LEAD(o_orderdate) OVER w) AS INTEGER)
         AS days_to_next
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
QUALIFY days_since_prev IS NOT NULL
ORDER BY o_custkey, o_orderkey
"""


# --- HAVING (Q18-shaped) ---------------------------------------------------


def having_bulk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_orderkey")
        .agg(_dsum("l_quantity", "total_qty"), F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("total_qty") > 150)
        .orderBy("l_orderkey")
    )


HAVING_SQL = f"""
SELECT l_orderkey, {_dsum_sql("l_quantity", "total_qty")},
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_orderkey
HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) > 150
ORDER BY l_orderkey
"""


# --- null handling ---------------------------------------------------------


def null_handling_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif creates them, coalesce/count navigate them
    (the reference has no null path at all, SURVEY.md §2.2)."""
    orders = _t(spark, sf_dir, "orders")
    masked = orders.withColumn(
        "status_or_null", F.nullif(F.col("o_orderstatus"), F.lit("P"))
    )
    return (
        masked.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("status_or_null").alias("n_nonpending"),
            F.sum(
                F.when(F.col("status_or_null").isNull(), 1).otherwise(0)
            ).alias("n_pending"),
            F.countDistinct(
                F.coalesce("status_or_null", F.lit("PENDING"))
            ).alias("n_status_kinds"),
        )
        .orderBy("o_orderpriority")
    )


NULL_HANDLING_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_total,
       COUNT(NULLIF(o_orderstatus, 'P')) AS n_nonpending,
       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pending,
       COUNT(DISTINCT COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING'))
         AS n_status_kinds
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- date arithmetic -------------------------------------------------------


def date_arith_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias(
                "due_day"
            ),
            F.datediff(F.lit("2002-01-01"), F.col("o_orderdate")).alias(
                "days_to_epoch_end"
            ),
            F.dayofweek("o_orderdate").alias("dow"),
        )
        .filter(F.col("dow") == 1)  # Sundays
        .orderBy("o_orderkey")
    )


DATE_ARITH_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_day,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00')
            AS INTEGER) AS days_to_epoch_end,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
FROM orders
WHERE dayofweek(o_orderdate) + 1 = 1
ORDER BY o_orderkey
"""


# --- explode / unnest ------------------------------------------------------


def explode_part_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.select(
            F.explode(F.split(F.col("p_name"), " ")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
    )


EXPLODE_SQL = """
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
GROUP BY word ORDER BY n DESC, word
"""


# --- approximate distinct (scale path) -------------------------------------


def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approx distinct — the 100 TB alternative to exact
    countDistinct — under a FULL value oracle: sketch estimates aren't
    oracle-portable, so each per-status row emits the exact group
    cardinality context (n_orders) plus the sketch's relative error vs
    the in-plan exact distinct, CLAMPED to the pinned tolerance when it
    is inside it. Every group inside tolerance -> the row equals the
    constant-oracle row; a sketch regression surfaces the measured
    percentage in the hash diff. (HLL++ is deterministic for fixed
    input, so the gate is stable.)"""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("a"),
        F.countDistinct("o_custkey").alias("e"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    err = F.abs(F.col("a") - F.col("e")) * 100.0 / F.col("e")
    return per.select(
        "o_orderstatus",
        "n_orders",
        F.when(err <= _HLL_TOL_PCT, F.lit(_HLL_TOL_PCT))
        .otherwise(F.ceil(err))
        .cast("int")
        .alias("err_pct_floor"),
    ).orderBy("o_orderstatus")


_HLL_TOL_PCT = 5  # rsd 0.02 requested; 5% gate = 2.5 sigma of headroom


def approx_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked guard on the HLL++ sketch: per-status relative error
    vs the exact distinct count, computed in-plan. Emits one row
    (n_groups, max_err_pct_floor) where the error column is the pinned
    tolerance when every group is inside it, else the worst MEASURED
    percentage — a sketch regression mismatches the constant oracle and
    surfaces the number. (HLL++ is deterministic for fixed input, so
    this is a stable gate.)"""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("a"),
        F.countDistinct("o_custkey").alias("e"),
    )
    err = F.abs(F.col("a") - F.col("e")) * 100.0 / F.col("e")
    return per.agg(
        F.count(F.lit(1)).cast("int").alias("n_groups"),
        F.when(F.max(err) <= _HLL_TOL_PCT, F.lit(_HLL_TOL_PCT))
        .otherwise(F.ceil(F.max(err)))
        .cast("int")
        .alias("max_err_pct_floor"),
    )


APPROX_DISTINCT_GATE_SQL = f"""
SELECT 3 AS n_groups, {_HLL_TOL_PCT} AS max_err_pct_floor
"""

APPROX_DISTINCT_CUSTOMERS_SQL = f"""
SELECT o_orderstatus, COUNT(*) AS n_orders,
       {_HLL_TOL_PCT} AS err_pct_floor
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


_QUANTILE_TOL_PCT = 2


def approx_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same loud-gate pattern for the quantile sketch
    (approx_percentile, Greenwald-Khanna): median estimate must sit
    within the pinned relative tolerance of the exact manual median."""
    orders = _t(spark, sf_dir, "orders")
    got = orders.agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("a"),
        F.expr("percentile(o_totalprice, 0.5)").alias("e"),
    )
    err = F.abs(F.col("a") - F.col("e")) * 100.0 / F.col("e")
    return got.select(
        F.lit(1).cast("int").alias("n_checks"),
        F.when(err <= _QUANTILE_TOL_PCT, F.lit(_QUANTILE_TOL_PCT))
        .otherwise(F.ceil(err))
        .cast("int")
        .alias("err_pct_floor"),
    )


APPROX_QUANTILE_GATE_SQL = f"""
SELECT 1 AS n_checks, {_QUANTILE_TOL_PCT} AS err_pct_floor
"""


QUERIES = {
    "left_join_part_usage": left_join_part_usage,
    "full_outer_buyer_cohorts": full_outer_buyer_cohorts,
    "subquery_above_avg_items": subquery_above_avg_items,
    "grouping_sets_orders": grouping_sets_orders,
    "array_agg_segments": array_agg_segments,
    "median_retail_price": median_retail_price,
    "window_order_gaps": window_order_gaps,
    "having_bulk_orders": having_bulk_orders,
    "null_handling_orders": null_handling_orders,
    "date_arith_orders": date_arith_orders,
    "explode_part_words": explode_part_words,
    "approx_distinct_customers": approx_distinct_customers,
    "approx_distinct_gate": approx_distinct_gate,
    "approx_quantile_gate": approx_quantile_gate,
}

ORACLES = {
    "left_join_part_usage": LEFT_JOIN_SQL,
    "full_outer_buyer_cohorts": FULL_OUTER_SQL,
    "subquery_above_avg_items": SUBQUERY_SQL,
    "grouping_sets_orders": GROUPING_SETS_SQL,
    "array_agg_segments": ARRAY_AGG_SQL,
    "median_retail_price": MEDIAN_SQL,
    "window_order_gaps": WINDOW_GAPS_SQL,
    "having_bulk_orders": HAVING_SQL,
    "null_handling_orders": NULL_HANDLING_SQL,
    "date_arith_orders": DATE_ARITH_SQL,
    "explode_part_words": EXPLODE_SQL,
    "approx_distinct_customers": APPROX_DISTINCT_CUSTOMERS_SQL,
    "approx_distinct_gate": APPROX_DISTINCT_GATE_SQL,
    "approx_quantile_gate": APPROX_QUANTILE_GATE_SQL,
}


# --- full window-rank family ----------------------------------------------


def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile in one pass — the
    ranking family beyond row_number. percent_rank's (rank-1)/(n-1) is a
    double division of exact ints, engine-identical."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rnk") <= 50)
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    )


WINDOW_RANK_SQL = """
SELECT o_orderpriority, o_orderkey,
       CAST(rnk AS INTEGER) AS rnk,
       CAST(drnk AS INTEGER) AS drnk,
       prnk,
       CAST(quartile AS INTEGER) AS quartile
FROM (
  SELECT o_orderpriority, o_orderkey,
         RANK() OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk,
         PERCENT_RANK() OVER w AS prnk,
         NTILE(4) OVER w AS quartile
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC)
)
WHERE rnk <= 50
ORDER BY o_orderpriority, rnk, o_orderkey
"""


# --- multi-column distinct (the Expand path) -------------------------------


def multi_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distinct aggregates over different columns in one GROUP BY —
    the planner's Expand path (each row replicated per distinct set).
    The hypercube avoids this with its two-level rewrite; this entry
    keeps the general path covered."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


MULTI_DISTINCT_SQL = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# --- regex extraction ------------------------------------------------------


def regex_extract_customer_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the numeric id out of 'Customer#000000042' names and prove
    it round-trips to the key column."""
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.select(
            "c_custkey",
            F.regexp_extract("c_name", r"Customer#(\d+)", 1)
            .cast("long")
            .alias("parsed_id"),
        )
        .filter(F.col("parsed_id") == F.col("c_custkey"))
        .orderBy("c_custkey")
    )


REGEX_EXTRACT_SQL = r"""
SELECT c_custkey,
       CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS parsed_id
FROM customer
WHERE CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) = c_custkey
ORDER BY c_custkey
"""


# --- value-based (RANGE) window frames -------------------------------------


def window_range_trailing_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer at each order, via a RANGE
    frame over epoch days — VALUE-based framing (all orders within 30
    days, however many rows that is, ties included as peers), which a
    ROWS frame cannot express. The rest of the battery's running
    windows are ROWS frames; this pins the other half of the frame
    surface. Decimal-cast sums keep the frame aggregate exact on both
    engines."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("_day"))
        .rangeBetween(-30, W.currentRow)
    )
    return (
        orders.withColumn("_day", day)
        .select(
            "o_orderkey",
            "o_custkey",
            F.sum(F.col("o_totalprice").cast(_DEC))
            .over(w)
            .cast("double")
            .alias("trailing_30d_spend"),
            F.count(F.lit(1)).over(w).alias("trailing_30d_orders"),
        )
        .orderBy("o_orderkey")
    )


WINDOW_RANGE_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) OVER w AS DOUBLE)
         AS trailing_30d_spend,
       COUNT(*) OVER w AS trailing_30d_orders
FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS _day
  FROM orders WHERE o_custkey < 500
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY _day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
"""


# --- bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) --------------


def set_ops_all_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — multiplicity-preserving set ops
    (``relational.set_ops_customers`` covers the DISTINCT variants;
    these are different physical operators: per-key counts with
    min/difference semantics, not dedup). A customer with 3 open and
    2 filled orders contributes 2 rows to the intersection and 1 to
    the difference."""
    orders = _t(spark, sf_dir, "orders")
    o_buyers = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f_buyers = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    inter = o_buyers.intersectAll(f_buyers).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_intersect")
    )
    diff = o_buyers.exceptAll(f_buyers).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_except")
    )
    return (
        inter.join(diff, "o_custkey", "full_outer")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.coalesce("n_intersect", F.lit(0)).alias("n_intersect"),
            F.coalesce("n_except", F.lit(0)).alias("n_except"),
        )
        .orderBy("custkey")
    )


SET_OPS_ALL_SQL = """
WITH o_buyers AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
f_buyers AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
inter AS (
  SELECT o_custkey, COUNT(*) AS n_intersect
  FROM (SELECT * FROM o_buyers INTERSECT ALL SELECT * FROM f_buyers)
  GROUP BY o_custkey
),
diff AS (
  SELECT o_custkey, COUNT(*) AS n_except
  FROM (SELECT * FROM o_buyers EXCEPT ALL SELECT * FROM f_buyers)
  GROUP BY o_custkey
)
SELECT COALESCE(inter.o_custkey, diff.o_custkey) AS custkey,
       COALESCE(n_intersect, 0) AS n_intersect,
       COALESCE(n_except, 0) AS n_except
FROM inter FULL OUTER JOIN diff ON inter.o_custkey = diff.o_custkey
ORDER BY custkey
"""


# --- unpivot (wide -> long, the inverse of pivot_lineitem) ------------------


def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape via the DataFrame ``unpivot`` (melt)
    operator — the inverse of the battery's ``pivot_lineitem``. Values
    share one double column, names land in a discriminator column;
    pure narrow transformation, no shuffle."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return (
        part.select(
            "p_partkey",
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
            F.col("p_size").cast("double").alias("p_size"),
        )
        .unpivot(
            ids=["p_partkey"],
            values=["p_retailprice", "p_size"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .orderBy("p_partkey", "metric")
    )


UNPIVOT_SQL = """
SELECT p_partkey, metric, val
FROM (
  UNPIVOT (SELECT p_partkey, p_retailprice,
                  CAST(p_size AS DOUBLE) AS p_size
           FROM part WHERE p_partkey < 300)
  ON p_retailprice, p_size INTO NAME metric VALUE val
)
ORDER BY p_partkey, metric
"""


# --- LIMIT ... OFFSET pagination -------------------------------------------


def sort_offset_page_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: page 3 (rows 40..59) of orders under a
    total order (totalprice desc, orderkey tiebreak) via OFFSET+LIMIT —
    the offset operator the rest of the battery's top-k entries don't
    touch. Only correct under a TOTAL order, same discipline as every
    LIMIT in this battery."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(40)
        .limit(20)
    )


OFFSET_PAGE_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
"""


QUERIES.update(
    {
        "window_rank_family": window_rank_family,
        "multi_distinct_orders": multi_distinct_orders,
        "regex_extract_customer_ids": regex_extract_customer_ids,
        "window_range_trailing_30d": window_range_trailing_30d,
        "unpivot_part_metrics": unpivot_part_metrics,
        "sort_offset_page_orders": sort_offset_page_orders,
        "set_ops_all_customers": set_ops_all_customers,
    }
)
ORACLES.update(
    {
        "window_rank_family": WINDOW_RANK_SQL,
        "multi_distinct_orders": MULTI_DISTINCT_SQL,
        "regex_extract_customer_ids": REGEX_EXTRACT_SQL,
        "window_range_trailing_30d": WINDOW_RANGE_SQL,
        "unpivot_part_metrics": UNPIVOT_SQL,
        "sort_offset_page_orders": OFFSET_PAGE_SQL,
        "set_ops_all_customers": SET_OPS_ALL_SQL,
    }
)
