"""Relational operator battery: scans, joins (broadcast/semi/anti),
hash aggregates, exact distinct counts, rollup/cube lattices, windows,
set ops, sort/limit, scalar function families, JSON extraction.

Each query exists twice: a Spark-first DataFrame build (QUERIES) and an
ANSI-SQL oracle DuckDB runs over the same parquet (ORACLES). Determinism
discipline so value hashes match bit-for-bit:

- Never hash-compare raw float sums: accumulate in DECIMAL (exact,
  order-independent), cast the final value to DOUBLE.
- Integer SUMs: DuckDB widens to HUGEINT -> always CAST ... AS BIGINT.
- Temporal outputs as strings (yyyy-MM-dd) or ints, never raw
  timestamps, so collection paths can't disagree on timezone/precision.
- LIMIT always under a total order (unique tiebreak column).

The reference engine's capability surface (SURVEY.md §2.1 S1-K1) is
covered by ``hypercube``; everything else here is the generalization
mandated by SURVEY.md §7 M2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.plans import (
    maybe_broadcast,
    ordered_emit,
    spread,
)
from implementation_of_an_etl_process_spark.sources.parquet import read_table

# Exact, order-independent accumulation type for double measures.
_DEC = "decimal(20,6)"


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """events.ts has shipped in two encodings across testdata versions:
    INT64 TIMESTAMP(NANOS) (scans as long under nanosAsLong) and plain
    timestamp[us] (scans as TIMESTAMP_NTZ). Normalize both to
    TimestampType — integer ``div`` for the nanos case so the
    conversion is exact, plain cast (wall clock preserved under the
    UTC session) for the NTZ case."""
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = read_table(spark, sf_dir, name)
    if name == "events":
        df = normalize_event_ts(df)
    return df


def _dsum(col, alias: str):
    """Deterministic SUM over a double column: decimal-exact, double out."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def _dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(20,6))) AS DOUBLE) AS {alias}"


# ---------------------------------------------------------------------------
# hypercube — the flagship: the reference query re-targeted at the TPC-H-ish
# star schema. 2 broadcast joins + 5-dim GROUP BY with SUM / COUNT /
# COUNT-DISTINCT measures (reference hypercube.sql:1-14, ETL.java:94-252).
# ---------------------------------------------------------------------------


def hypercube(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")

    dims = ["n_name", "c_mktsegment", "o_orderstatus", "ship_month"]
    # Three-level functional-dependency rewrite (see
    # operators.hypercube for the full derivation) — NO distinct
    # aggregate anywhere:
    # 1. lvl1 on (orderkey, ship_month), the narrowest determining key,
    #    BEFORE any join widens rows; decimal accumulators are
    #    associative, so every level partial-aggregates exactly.
    # 2. lvl2 on (custkey, orderstatus, ship_month) after broadcasting
    #    only orders' (orderkey -> custkey, status) map: orderkey is
    #    unique per lvl1 row, so norders partials are plain COUNT(*).
    # 3. Final on dims after broadcasting customer->(segment, nation):
    #    (n_name, c_mktsegment) are functions of custkey, so each
    #    customer contributes exactly one lvl2 row per final group ->
    #    ncustomers = COUNT(*), norders = SUM of lvl2 partials.
    # spread() the narrow lvl1 projection: the driver's lineitem ships
    # as ONE single-row-group parquet file, which cannot split — the
    # decimal-heavy lvl1 partial aggregate otherwise runs on ONE core
    # (guide §2.5 unsplittable input: repartition right after the
    # read). Only the 4 needed columns cross the exchange. A/B at
    # sf0.1 (interleaved min-of-4): win for this agg-bound shape; the
    # broadcast-join-bound TPC-H queries measured SLOWER with a
    # blanket spread, so it stays per-site. Hash-spread BY the lvl1
    # grouping key's determining column (guide §2.4): the lvl1
    # aggregate then reuses this exchange instead of adding its own —
    # one Exchange total where round-robin paid two plus a local sort.
    # At cluster scale inputs arrive pre-split and spread() is a no-op
    # (the aggregate exchange reappears, exactly as before).
    lvl1 = (
        spread(
            lineitem.select(
                "l_orderkey",
                F.month("l_shipdate").alias("ship_month"),
                "l_quantity",
                "l_extendedprice",
            ),
            by=["l_orderkey"],
        )
        .groupBy("l_orderkey", "ship_month")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).alias("_qty"),
            F.sum(F.col("l_extendedprice").cast(_DEC)).alias("_price"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    order_map = orders.select("o_orderkey", "o_custkey", "o_orderstatus")
    lvl2 = (
        lvl1.join(
            maybe_broadcast(order_map),
            lvl1.l_orderkey == order_map.o_orderkey,
            "inner",
        )
        .groupBy("o_custkey", "o_orderstatus", "ship_month")
        .agg(
            F.sum("_qty").alias("_qty"),
            F.sum("_price").alias("_price"),
            F.sum("_n").alias("_n"),
            F.count(F.lit(1)).alias("_no"),
        )
    )
    cust_dim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner"
    ).select("c_custkey", "c_mktsegment", "n_name")
    post = lvl2.join(
        maybe_broadcast(cust_dim),
        lvl2.o_custkey == cust_dim.c_custkey,
        "inner",
    )
    # ordered_emit: post-aggregate sort of a dim-bounded relation —
    # same rows/order, no range-sampling pass on small inputs (plain
    # orderBy past the scale gate); see plans.shape.ordered_emit
    return ordered_emit(
        post.groupBy(*dims)
        .agg(
            F.sum("_qty").cast("double").alias("sum_qty"),
            F.round(F.sum("_price"), 2).cast("double").alias("amount"),
            F.count(F.lit(1)).alias("ncustomers"),
            F.sum("_no").alias("norders"),
            F.sum("_n").alias("nitems"),
        ),
        *dims,
    )


HYPERCUBE_SQL = f"""
SELECT n_name, c_mktsegment, o_orderstatus,
       CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS ship_month,
       {_dsum_sql("l_quantity", "sum_qty")},
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(20,6))), 2) AS DOUBLE) AS amount,
       COUNT(DISTINCT o_custkey) AS ncustomers,
       COUNT(DISTINCT o_orderkey) AS norders,
       COUNT(*) AS nitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2, 3, 4
ORDER BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# TPC-H-shaped core queries
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread(): single-row-group input file = one scan task; Q1 runs 4
    # decimal partial sums over ~98% of lineitem, the heaviest per-row
    # aggregate in the battery — fan the agg out (A/B: 0.97s -> 0.69s
    # min at sf0.1; the shipdate filter still reaches the scan, plan-
    # asserted). Hash-spread by the unique-ish l_orderkey: same fan-out
    # without round-robin's per-task local sort (guide §2.5); the
    # grouping keys here are 6-valued, so partial aggregation (not
    # exchange reuse) stays the lever. No-op on pre-split inputs.
    l = spread(
        _t(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.lit("1998-09-02")
        ),
        by=["l_orderkey"],
    )
    return ordered_emit(
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"
            ),
            _dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count(F.lit(1)))
            .alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        ),
        "l_returnflag",
        "l_linestatus",
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum_sql("l_quantity", "sum_qty")},
       {_dsum_sql("l_extendedprice", "sum_base_price")},
       {_dsum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       {_dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01")
    )
    return (
        lineitem.join(
            orders.join(
                maybe_broadcast(customer),
                orders.o_custkey == customer.c_custkey,
                "inner",
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "inner",
        )
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


Q3_SQL = f"""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    dims = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    cust = customer.join(F.broadcast(dims), customer.c_nationkey == dims.n_nationkey).select(
        "c_custkey", "n_nationkey", "n_name"
    )
    ords = orders.join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "n_nationkey", "n_name"
    )
    # local supplier: supplier nation == customer nation
    sup = supplier.select("s_suppkey", "s_nationkey")
    return ordered_emit(
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, lineitem.l_orderkey == ords.o_orderkey)
        .join(maybe_broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .filter(F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        ),
        F.col("revenue").desc(),
        F.col("n_name"),
    )


Q5_SQL = f"""
SELECT n_name,
       {_dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
  FROM orders
) WHERE rk <= 3
ORDER BY o_custkey, rk
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC))
        .over(w)
        .cast("double")
        .alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey
"""


# ---------------------------------------------------------------------------
# Grouping lattices (rollup / cube) — the capability the reference's name
# gestures at but doesn't implement (SURVEY.md §2.2)
# ---------------------------------------------------------------------------


def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    df = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        df.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum("c_acctbal", "total_acctbal"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


ROLLUP_SQL = f"""
SELECT r_name, n_name, COUNT(*) AS n_customers,
       {_dsum_sql("c_acctbal", "total_acctbal")}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice", "total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       {_dsum_sql("o_totalprice", "total_price")}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Join variants: semi / anti; set operations
# ---------------------------------------------------------------------------


def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_semi"
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
ORDER BY c_custkey
"""


def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over buyer sets by order status."""
    orders = _t(spark, sf_dir, "orders")
    o_buyers = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f_buyers = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p_buyers = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    both = o_buyers.intersect(f_buyers)  # INTERSECT = set semantics
    # EXCEPT = set semantics -> subtract (exceptAll would keep leftover
    # duplicate occurrences, inflating the result)
    only_p = p_buyers.subtract(o_buyers.unionByName(f_buyers))
    return (
        both.withColumn("bucket", F.lit("open_and_filled"))
        .unionByName(only_p.withColumn("bucket", F.lit("pending_only")))
        .select("bucket", F.col("o_custkey").alias("custkey"))
        .orderBy("bucket", "custkey")
    )


SET_OPS_SQL = """
SELECT 'open_and_filled' AS bucket, o_custkey AS custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'pending_only' AS bucket, o_custkey AS custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus IN ('O', 'F'))
ORDER BY bucket, custkey
"""


# ---------------------------------------------------------------------------
# Distinct aggregates, sort/limit
# ---------------------------------------------------------------------------


def distinct_agg_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("n_name")
    )


DISTINCT_AGG_SQL = """
SELECT n_name, COUNT(DISTINCT c_mktsegment) AS n_segments,
       COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def sort_limit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


SORT_LIMIT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------


def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%wid%"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_type", 1, 3).alias("type_prefix"),
            F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
            F.ltrim(F.rtrim(F.col("p_name"))).alias("name_trim"),
            F.size(F.split(F.col("p_name"), " ")).alias("n_words"),
        )
        .orderBy("p_partkey")
    )


STRING_FUNCS_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       CAST(LENGTH(p_name) AS INTEGER) AS name_len,
       SUBSTRING(p_type, 1, 3) AS type_prefix,
       p_brand || '#' || p_type AS brand_type,
       LTRIM(RTRIM(p_name)) AS name_trim,
       CAST(LENGTH(string_split(p_name, ' ')) AS INTEGER) AS n_words
FROM part WHERE p_name LIKE '%wid%'
ORDER BY p_partkey
"""


def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice", "total_price"),
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_day"),
            F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("last_day"),
        )
        .orderBy("order_year", "order_quarter")
    )


DATE_FUNCS_SQL = f"""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
       COUNT(*) AS n_orders,
       {_dsum_sql("o_totalprice", "total_price")},
       MIN(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
       MAX(strftime(o_orderdate, '%Y-%m-%d')) AS last_day
FROM orders
GROUP BY 1, 2 ORDER BY 1, 2
"""


def conditional_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0)).alias(
                "n_open"
            ),
            F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias(
                "n_filled"
            ),
            _dsum(
                F.when(
                    F.col("l_discount") > 0.05, F.col("l_extendedprice")
                ).otherwise(F.lit(0.0)),
                "high_discount_price",
            ),
            F.max(
                F.when(F.col("l_quantity") >= 49, F.col("l_quantity"))
            ).alias("max_bulk_qty"),
        )
        .orderBy("l_returnflag")
    )


CONDITIONAL_AGG_SQL = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       {_dsum_sql("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END", "high_discount_price")},
       MAX(CASE WHEN l_quantity >= 49 THEN l_quantity END) AS max_bulk_qty
FROM lineitem
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def pivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .withColumnRenamed("O", "n_open")
        .withColumnRenamed("F", "n_filled")
        .orderBy("l_returnflag")
    )


PIVOT_SQL = """
SELECT l_returnflag,
       CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
       CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_filled
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Events: windowed time aggregation, sessionization, JSON extraction
# ---------------------------------------------------------------------------


def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value", "total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


EVENTS_TUMBLING_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {_dsum_sql("value", "total_value")}
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via window functions."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    sec = F.unix_timestamp("ts")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            sec - F.lag(sec).over(w) > 1800, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    # sessions per user = 1 + number of gap boundaries
    return (
        flagged.groupBy("user_id")
        .agg(
            (F.sum("new_session") + 1).cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


EVENTS_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                   - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id,
       CAST(SUM(new_session) + 1 AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM flagged GROUP BY user_id ORDER BY user_id
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        )
        .filter(F.col("k_val") >= 50)
        .orderBy("event_id")
    )


EVENTS_JSON_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
ORDER BY event_id
"""


QUERIES = {
    "hypercube": hypercube,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_local_supplier": q5_local_supplier,
    "window_topk_orders": window_topk_orders,
    "window_running_total": window_running_total,
    "rollup_region_nation": rollup_region_nation,
    "cube_status_priority": cube_status_priority,
    "semi_join_customers": semi_join_customers,
    "anti_join_customers": anti_join_customers,
    "set_ops_customers": set_ops_customers,
    "distinct_agg_nation": distinct_agg_nation,
    "sort_limit_orders": sort_limit_orders,
    "string_funcs_part": string_funcs_part,
    "date_funcs_orders": date_funcs_orders,
    "conditional_agg_lineitem": conditional_agg_lineitem,
    "pivot_lineitem": pivot_lineitem,
    "events_tumbling_1h": events_tumbling_1h,
    "events_sessionize": events_sessionize,
    "events_json_extract": events_json_extract,
}

ORACLES = {
    "hypercube": HYPERCUBE_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "window_topk_orders": WINDOW_TOPK_SQL,
    "window_running_total": WINDOW_RUNNING_SQL,
    "rollup_region_nation": ROLLUP_SQL,
    "cube_status_priority": CUBE_SQL,
    "semi_join_customers": SEMI_SQL,
    "anti_join_customers": ANTI_SQL,
    "set_ops_customers": SET_OPS_SQL,
    "distinct_agg_nation": DISTINCT_AGG_SQL,
    "sort_limit_orders": SORT_LIMIT_SQL,
    "string_funcs_part": STRING_FUNCS_SQL,
    "date_funcs_orders": DATE_FUNCS_SQL,
    "conditional_agg_lineitem": CONDITIONAL_AGG_SQL,
    "pivot_lineitem": PIVOT_SQL,
    "events_tumbling_1h": EVENTS_TUMBLING_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_json_extract": EVENTS_JSON_SQL,
}
