"""TPC-H-derived battery queries beyond q1/q3/q5 (which live in
``relational.py``), adapted to the driver's trimmed star schema
(TESTDATA.md): there is no partsupp table and lineitem lacks
commitdate/receiptdate/shipmode. q4/q12/q13/q17/q19/q21/q22 swap the
missing predicate columns for available ones (noted per query);
q2/q9/q11/q16/q20 run over a deterministic partsupp DERIVED from
part × supplier with the identical derivation embedded in the oracle
(see ``_partsupp``), completing all 22 classic join shapes. Everything else follows the classic
query shapes: existence tests, multi-nation join chains, market-share
ratios, correlated-average filters, HAVING thresholds, anti-join +
scalar-subquery screens.

Determinism discipline is the module-wide standard from
``relational.py``: decimal accumulation for double sums, BIGINT casts
on counts, dates emitted as strings, every LIMIT under a total order
with a unique tiebreak, identical output aliases on both sides.

The reference engine itself only ships the hypercube query
(``hypercube.sql:1-14``); this module is part of the SURVEY.md §7 M2
generalization surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.plans import maybe_broadcast
from implementation_of_an_etl_process_spark.queries.relational import (
    _DEC,
    _dsum,
    _dsum_sql,
    _t,
)


# ---------------------------------------------------------------------------
# q4 — order priority checking. Adapted: no l_commitdate/l_receiptdate,
# so "late line item" becomes "shipped >60 days after the order date".
# Shape preserved: EXISTS semi-join from a one-quarter order slice.
# ---------------------------------------------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    lineitem = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        lineitem,
        (orders.o_orderkey == lineitem.l_orderkey)
        & (lineitem.l_shipdate > F.date_add(F.to_date("o_orderdate"), 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q6 — forecasting revenue change. Pure scan-filter-aggregate; the
# predicate and projection must reach the parquet scan.
# ---------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        _dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("nrows"),
    )


Q6_SQL = f"""
SELECT {_dsum_sql('l_extendedprice * l_discount', 'revenue')},
       COUNT(*) AS nrows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations, both directions, by year.
# Two independent nation lookups (supplier side and customer side) —
# broadcast both dimension chains, one fact-side shuffle for the agg.
# ---------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = _t(spark, sf_dir, "nation")
    supp_nat = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation.n_nationkey,
            "inner",
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_nat = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == nation.n_nationkey,
            "inner",
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_5") & (F.col("cust_nation") == "NATION_8")
    ) | (
        (F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_5")
    )
    return (
        lineitem.join(
            maybe_broadcast(orders),
            lineitem.l_orderkey == orders.o_orderkey,
            "inner",
        )
        .join(maybe_broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(cust_nat), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            _dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).alias("nitems"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
       {_dsum_sql('l_extendedprice * (1.0 - l_discount)', 'revenue')},
       COUNT(*) AS nitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND ((n2.n_name = 'NATION_5' AND n1.n_name = 'NATION_8')
    OR (n2.n_name = 'NATION_8' AND n1.n_name = 'NATION_5'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q8 — national market share: NATION_3's slice of EUROPE-customer
# ECONOMY-part volume by order year. The numerator/denominator are
# independent decimal sums; the ratio divides two identical doubles.
# ---------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cust_eur = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nat = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    joined = (
        lineitem.join(
            maybe_broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            maybe_broadcast(orders.select("o_orderkey", "o_custkey", "o_orderdate")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(maybe_broadcast(cust_eur), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _dsum(
                F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                    F.lit(0.0)
                ),
                "nation_volume",
            ),
            _dsum(vol, "total_volume"),
        )
        .select(
            "o_year",
            "nation_volume",
            "total_volume",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
WITH base AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         {_dsum_sql(
             "CASE WHEN n2.n_name = 'NATION_3' "
             "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END",
             'nation_volume')},
         {_dsum_sql('l_extendedprice * (1.0 - l_discount)', 'total_volume')}
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1
)
SELECT o_year, nation_volume, total_volume,
       nation_volume / total_volume AS mkt_share
FROM base
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# q10 — returned item reporting: top 20 customers by lost revenue in a
# quarter. Revenue is the sort key; c_custkey is the unique tiebreak.
# ---------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    lineitem = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    cust = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        lineitem.join(
            maybe_broadcast(orders.select("o_orderkey", "o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {_dsum_sql('l_extendedprice * (1.0 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution. Adapted: the classic
# o_comment NOT LIKE screen becomes an o_orderpriority screen (no
# comment column). Left join keeps zero-order customers in the c_count=0
# bucket.
# ---------------------------------------------------------------------------


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        customer.join(
            orders.select("o_orderkey", "o_custkey"),
            customer.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# q14 — promotion effect: PROMO-part share of one month's revenue.
# ---------------------------------------------------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.join(
            maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey")
        )
        .agg(
            _dsum(
                F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)),
                "promo_volume",
            ),
            _dsum(vol, "total_volume"),
        )
        .select(
            "promo_volume",
            "total_volume",
            (F.lit(100.0) * F.col("promo_volume") / F.col("total_volume")).alias(
                "promo_revenue_pct"
            ),
        )
    )


Q14_SQL = f"""
WITH base AS (
  SELECT {_dsum_sql(
      "CASE WHEN p_type = 'PROMO' "
      "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END",
      'promo_volume')},
         {_dsum_sql('l_extendedprice * (1.0 - l_discount)', 'total_volume')}
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
)
SELECT promo_volume, total_volume,
       100.0 * promo_volume / total_volume AS promo_revenue_pct
FROM base
"""


# ---------------------------------------------------------------------------
# q15 — top supplier(s) by one quarter's revenue. The scalar MAX is a
# 1-row broadcast cross join, not a window over a single partition.
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = lineitem.groupBy("l_suppkey").agg(
        _dsum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
            "total_revenue",
        )
    )
    top = rev.agg(F.max("total_revenue").alias("_max"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(maybe_broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         {_dsum_sql('l_extendedprice * (1.0 - l_discount)', 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue for one brand. Adapted: no
# p_container, so the screen is brand-only. The correlated per-part
# average is a decimal-exact sum/count so the 0.2*avg comparison is
# bit-identical on both sides.
# ---------------------------------------------------------------------------


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    lineitem = _t(spark, sf_dir, "lineitem")
    li_b = lineitem.join(
        maybe_broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    avg_q = li_b.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li_b.join(
            maybe_broadcast(avg_q), F.col("l_partkey") == F.col("a_partkey")
        )
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            _dsum("l_extendedprice", "_s"),
            F.count(F.lit(1)).alias("nrows"),
        )
        .select(
            (F.col("_s") / 7.0).alias("avg_yearly"),
            "nrows",
        )
    )


Q17_SQL = f"""
WITH li_b AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#11'
), avg_q AS (
  SELECT l_partkey AS a_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
           / COUNT(*) AS avg_qty
  FROM li_b GROUP BY 1
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS nrows
FROM li_b JOIN avg_q ON l_partkey = a_partkey
WHERE l_quantity < 0.2 * avg_qty
"""


# ---------------------------------------------------------------------------
# q18 — large-volume customers: orders whose line quantities sum past a
# threshold. The HAVING compares an exact decimal sum to an integer.
# ---------------------------------------------------------------------------


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("_q"))
        .filter(F.col("_q") > 220)
    )
    return (
        big.join(
            maybe_broadcast(
                orders.select(
                    "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(maybe_broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.col("_q").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(20,6))) AS _q
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(20,6))) > 220
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, CAST(_q AS DOUBLE) AS sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q19 — discounted revenue under OR-of-ANDs bracket predicates.
# Adapted: p_container -> p_size brackets. The whole disjunction should
# collapse into one joined scan, not three.
# ---------------------------------------------------------------------------


def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = lineitem.join(
        maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    q = F.col("l_quantity")
    s = F.col("p_size")
    pred = (
        (
            (F.col("p_brand") == "Brand#11")
            & s.between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & s.between(10, 30)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#6")
            & s.between(20, 50)
            & q.between(20, 30)
        )
    )
    return joined.filter(pred).agg(
        _dsum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
            "revenue",
        ),
        F.count(F.lit(1)).alias("nrows"),
    )


Q19_SQL = f"""
SELECT {_dsum_sql('l_extendedprice * (1.0 - l_discount)', 'revenue')},
       COUNT(*) AS nrows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#6' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# q22 — global sales opportunity. Adapted: no c_phone, so the country
# code screen becomes a nationkey set and grouping key; and since every
# customer in this dataset has at least one order, "no orders" becomes
# "no orders since 2000-01-01" (lapsed customers). Anti-join for the
# existence test, decimal-exact scalar average for the acctbal screen.
# ---------------------------------------------------------------------------

_Q22_NATIONS = [5, 8, 11, 14, 17, 20]


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(_Q22_NATIONS)
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = f"""
WITH pool AS (
  SELECT * FROM customer WHERE c_nationkey IN (5, 8, 11, 14, 17, 20)
), avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE)
           / COUNT(*) AS _avg
  FROM pool WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       {_dsum_sql('c_acctbal', 'totacctbal')}
FROM pool, avg_bal
WHERE c_acctbal > _avg
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# q12 — shipping modes and order priority. Adapted: lineitem has no
# l_shipmode/l_commitdate/l_receiptdate, so the "mode" axis becomes
# l_returnflag ('A'/'R' standing in for MAIL/SHIP) and "received late"
# becomes "shipped >30 days after the order date". Shape preserved:
# big-big equi-join orders⨝lineitem feeding a two-way conditional
# count split by priority class — the join shuffles on l_orderkey with
# the date/flag filters pushed to the lineitem scan, and the orders
# side carries only (o_orderkey, o_orderdate, o_orderpriority).
# ---------------------------------------------------------------------------

_Q12_HIGH = ["1-URGENT", "2-HIGH"]


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin(_Q12_HIGH)
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
        .filter(F.col("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 30))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting. Adapted: "late" means
# "shipped >60 days after the order date" (no commit/receipt dates).
# This is the battery's multi-correlated semi+anti stack on the SAME
# table: a late lineitem from a finished multi-supplier order counts
# against its supplier only when NO OTHER supplier on that order was
# also late — EXISTS(l2: other supplier) via left_semi with an
# orderkey-equi + suppkey-inequality condition, NOT EXISTS(l3: other
# LATE supplier) via left_anti against the same late set. Both
# correlated joins are hash joins on l_orderkey (the equi part) with
# the <> as a residual filter; supplier/nation are broadcast dims.
# ---------------------------------------------------------------------------

_Q21_NATIONS = ["NATION_3", "NATION_7"]


def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lineitem = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # late line items of finished orders; reused as both the driving
    # relation (l1) and the single-late-supplier aggregate below
    late_f = lineitem.join(
        orders_f, lineitem.l_orderkey == orders_f.o_orderkey, "inner"
    ).filter(
        F.col("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60)
    ).select("l_orderkey", "l_suppkey")

    # EXISTS/NOT-EXISTS as per-order aggregates (r15, guide §2.3
    # aggregate-before-shuffle): since every l1 row's supplier is one
    # of its order's suppliers, "some OTHER supplier exists" ⟺ the
    # order has >= 2 distinct suppliers (min < max), and "no OTHER
    # LATE supplier" ⟺ the order's late rows share one supplier
    # (min == max). The former row-level semi/anti joins shipped full
    # lineitem/late rows through two exchanges with residual
    # inequality filters; these aggregates partial-combine map-side
    # and shuffle one narrow row per order. Value-equality A/B'd
    # row-for-row at sf0.1 (and oracle-gated); mins 0.560 -> 0.537.
    has_other = (
        lineitem.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("_mn"), F.max("l_suppkey").alias("_mx"))
        .filter(F.col("_mn") < F.col("_mx"))
        .select("l_orderkey")
    )
    single_late = (
        late_f.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("_mn"), F.max("l_suppkey").alias("_mx"))
        .filter(F.col("_mn") == F.col("_mx"))
        .select("l_orderkey")
    )
    l1 = late_f.join(has_other, "l_orderkey", "left_semi").join(
        single_late, "l_orderkey", "left_semi"
    )
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(_Q21_NATIONS))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        l1.join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders o, nation
WHERE s_suppkey = l1.l_suppkey
  AND o.o_orderkey = l1.l_orderkey
  AND o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
  AND s_nationkey = n_nationkey
  AND n_name IN ('NATION_3', 'NATION_7')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Derived partsupp: /root/testdata has no partsupp table, so the five
# queries that need one (q2/q9/q11/q16/q20) run over a DETERMINISTIC
# derivation from part × {0..3}: four suppliers per part via modular
# hashing over the contiguous 0-based supplier keyspace, avail/cost from
# the same integer arithmetic. The oracle embeds the identical
# derivation (same trick as the refnative synthesized fact), so both
# engines see the same table and the join SHAPES — correlated scalar
# min, profit chains, fraction-of-total HAVING, NOT-IN screens, nested
# correlated aggregates — are exercised for real.
# ---------------------------------------------------------------------------

_PS_FANOUT = 4


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # supplier count is a bounded driver-side scalar (same contract as a
    # broadcast threshold); keys are contiguous 0-based in the testdata
    n_supp = _t(spark, sf_dir, "supplier").count()
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.explode(
                F.array(*[F.lit(i) for i in range(_PS_FANOUT)])
            ).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 31 + F.col("i") * 37) % n_supp)
            .cast("long")
            .alias("ps_suppkey"),
            ((F.col("p_partkey") * 17 + F.col("i") * 11) % 9999 + 1)
            .cast("int")
            .alias("ps_availqty"),
            (
                ((F.col("p_partkey") * 13 + F.col("i") * 7) % 100000)
                .cast("double")
                / 100.0
            ).alias("ps_supplycost"),
        )
    )


_PARTSUPP_CTE = """
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         CAST((p_partkey * 31 + i.i * 37)
              % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS ps_suppkey,
         CAST((p_partkey * 17 + i.i * 11) % 9999 + 1 AS INTEGER)
           AS ps_availqty,
         CAST((p_partkey * 13 + i.i * 7) % 100000 AS DOUBLE) / 100.0
           AS ps_supplycost
  FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) i(i)
)"""


# ---------------------------------------------------------------------------
# q2 — minimum-cost supplier. Shape preserved: region-scoped
# part⨝partsupp⨝supplier⨝nation⨝region with a correlated scalar-MIN
# screen per part (Spark: a window MIN over the same eligible set —
# no second scan; DuckDB: the textbook correlated subquery).
# p_mfgr/address/phone/comment don't exist in the trimmed part/supplier,
# so the output keeps the keyed columns.
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp_nat = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # p_size <= 15 (not ==): the trimmed part table is small enough that
    # an exact (size, type) pair can be empty at low sf, which would
    # make the entry a vacuous 0-row check
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    eligible = (
        _partsupp(spark, sf_dir)
        .join(maybe_broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(supp_nat), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("_min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "ps_supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_SQL = f"""
WITH {_PARTSUPP_CTE},
eligible AS (
  SELECT p_partkey, p_brand, ps_supplycost, s_suppkey, s_name, s_acctbal,
         n_name
  FROM part
  JOIN partsupp ON p_partkey = ps_partkey
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size <= 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
FROM eligible e
WHERE ps_supplycost = (
  SELECT MIN(ps_supplycost) FROM eligible e2
  WHERE e2.p_partkey = e.p_partkey
)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q9 — product-type profit by nation and year: the classic 6-table
# chain lineitem⨝part⨝supplier⨝partsupp⨝orders⨝nation with profit =
# revenue − supply cost. partsupp joins on BOTH (partkey, suppkey).
# ---------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = _t(spark, sf_dir, "nation")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    ps = _partsupp(spark, sf_dir)
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            maybe_broadcast(ps),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(maybe_broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            _dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity"),
                "sum_profit",
            )
        )
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       {_dsum_sql(
           'l_extendedprice * (1.0 - l_discount) - ps_supplycost * l_quantity',
           'sum_profit')}
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# q11 — important stock: one nation's partsupp value per part, kept
# when above a fixed fraction of that nation's total (scalar-subquery
# HAVING; Spark broadcasts the 1-row total and filters).
# ---------------------------------------------------------------------------

_Q11_FRACTION = 0.001


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey")
    )
    ps = _partsupp(spark, sf_dir).join(
        maybe_broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    value = F.col("ps_supplycost") * F.col("ps_availqty")
    per_part = ps.groupBy("ps_partkey").agg(_dsum(value, "value"))
    total = ps.agg(_dsum(value, "_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("_total") * _Q11_FRACTION)
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


Q11_SQL = f"""
WITH {_PARTSUPP_CTE},
scoped AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT ps_partkey, {_dsum_sql('v', 'value')}
FROM scoped
GROUP BY ps_partkey
HAVING CAST(SUM(CAST(v AS DECIMAL(20,6))) AS DOUBLE) >
       (SELECT CAST(SUM(CAST(v AS DECIMAL(20,6))) AS DOUBLE)
               * {_Q11_FRACTION}
        FROM scoped)
ORDER BY value DESC, ps_partkey
"""


# ---------------------------------------------------------------------------
# q16 — supplier relation count by part attributes, excluding a
# supplier blocklist. supplier has no comment column, so "customer
# complaints" becomes s_acctbal < 0; the NOT IN → anti-join shape and
# the COUNT DISTINCT over a 3-column group survive intact.
# ---------------------------------------------------------------------------

_Q16_SIZES = [1, 4, 7, 10, 13, 16, 19, 22]


def q16_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(_Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("bad_key"))
    return (
        _partsupp(spark, sf_dir)
        .join(maybe_broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("ps_suppkey") == F.col("bad_key"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


Q16_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#3'
  AND p_type <> 'PROMO'
  AND p_size IN ({', '.join(str(s) for s in _Q16_SIZES)})
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# q20 — suppliers with excess stock of a part family: the nested
# correlated-aggregate stack. "availqty exceeds half the quantity this
# (part, supplier) shipped in 1996" — the correlated SUM becomes a
# grouped aggregate left-joined on (partkey, suppkey); quantity sums of
# integral doubles are exact, 0.5× is a power-of-two scale, so the
# comparison is deterministic on both engines.
# ---------------------------------------------------------------------------


def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        # prune BEFORE the aggregate (r15, guide §2.3): only red-part
        # rows can match the partsupp probe below (left join), so
        # aggregating the rest is wasted shuffle — semi-join first.
        # Value-equal by left-join semantics; A/B min 0.420 -> 0.364.
        .join(
            maybe_broadcast(red_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
    )
    excess = (
        _partsupp(spark, sf_dir)
        .join(
            maybe_broadcast(red_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
            "left",
        )
        .filter(
            F.col("ps_availqty")
            > F.lit(0.5) * F.coalesce(F.col("_qty"), F.lit(0.0))
        )
        .select("ps_suppkey")
        .distinct()
    )
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH {_PARTSUPP_CTE}
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    )
    AND ps_availqty > 0.5 * (
      SELECT COALESCE(SUM(l_quantity), 0.0) FROM lineitem
      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    )
  )
ORDER BY s_name
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q10_returned_items": q10_returned_items,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q16_supplier_relation": q16_supplier_relation,
    "q20_excess_stock": q20_excess_stock,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q13_order_distribution": q13_order_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q18_large_volume": q18_large_volume,
    "q19_bracket_revenue": q19_bracket_revenue,
    "q21_waiting_orders": q21_waiting_orders,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q4_order_priority": Q4_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q10_returned_items": Q10_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_stock": Q11_SQL,
    "q16_supplier_relation": Q16_SQL,
    "q20_excess_stock": Q20_SQL,
    "q12_shipmode_priority": Q12_SQL,
    "q13_order_distribution": Q13_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity": Q17_SQL,
    "q18_large_volume": Q18_SQL,
    "q19_bracket_revenue": Q19_SQL,
    "q21_waiting_orders": Q21_SQL,
    "q22_idle_customers": Q22_SQL,
}
