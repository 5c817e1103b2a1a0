"""Battery entries: the remaining scalar-function families from the
SURVEY §2.2 checklist — MAP functions, exact math functions, and
higher-order array functions.

Parity notes:
- map outputs are serialized to sorted strings (driver canonicalizer
  can't hash dict cells; same rule as arrays).
- math entry restricts itself to IEEE-exact operations (sqrt, abs,
  floor/ceil, sign, pmod, exact integer powers) — exp/ln/trig differ
  between libm implementations in the last ulp and would flake.
- array HOF entry mirrors transform/filter/aggregate with DuckDB list
  comprehensions and list_reduce (fold parity proven by the rolling
  hash oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.queries.relational import _t
from implementation_of_an_etl_process_spark.sources.parquet import read_table


def map_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a status->count map per priority with
    map_from_entries, then read it back via map_keys/element_at. The
    map is emitted as a sorted "k:v|k:v" string for hashability."""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = per.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("status_counts")
    )
    return m.select(
        "o_orderpriority",
        F.size("status_counts").alias("n_statuses"),
        F.array_join(
            F.transform(
                F.map_keys("status_counts"),
                lambda k: F.concat_ws(
                    ":", k, F.element_at(F.col("status_counts"), k)
                ),
            ),
            "|",
        ).alias("counts_str"),
        F.aggregate(
            F.map_values("status_counts"),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("n_orders"),
    ).orderBy("o_orderpriority")


MAP_FUNCS_SQL = """
WITH per AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS INTEGER) AS n_statuses,
       string_agg(o_orderstatus || ':' || n, '|' ORDER BY o_orderstatus)
         AS counts_str,
       CAST(SUM(n) AS BIGINT) AS n_orders
FROM per GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IEEE-exact math functions over lineitem (sqrt/abs/floor/ceil/
    sign/pmod and an exact integer power) — deterministic across
    engines, unlike exp/ln/trig."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt(F.col("l_quantity")).alias("sqrt_qty"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.floor(F.col("l_extendedprice")).cast("long").alias("floor_price"),
        F.ceil(F.col("l_extendedprice")).cast("long").alias("ceil_price"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("sign_qty"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("int").alias("mod7"),
        F.pow(F.col("l_linenumber").cast("double"), 3).alias("line_cubed"),
    ).orderBy("l_orderkey", "l_linenumber")


MATH_FUNCS_SQL = """
SELECT l_orderkey, l_linenumber,
       sqrt(l_quantity) AS sqrt_qty,
       abs(l_discount - 0.05) AS abs_disc,
       CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
       CAST(sign(l_quantity - 25) AS INTEGER) AS sign_qty,
       CAST(l_orderkey % 7 AS INTEGER) AS mod7,
       CAST(l_linenumber AS DOUBLE) ** 3 AS line_cubed
FROM lineitem WHERE l_orderkey <= 1000
ORDER BY l_orderkey, l_linenumber
"""


def array_hof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: per-order sorted quantity array ->
    transform (double it), filter (>= 20), aggregate (exact int fold).
    Quantities cast to int first so every step is integer-exact."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    arrs = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.col("l_quantity").cast("int"))).alias(
            "qtys"
        )
    )
    return arrs.select(
        "l_orderkey",
        F.size("qtys").alias("n_items"),
        F.array_join(
            F.transform(F.col("qtys"), lambda q: (q * 2).cast("string")), ","
        ).alias("doubled"),
        F.size(F.filter(F.col("qtys"), lambda q: q >= 20)).alias("n_big"),
        F.aggregate(
            F.col("qtys"), F.lit(0).cast("long"), lambda acc, q: acc + q
        ).alias("qty_sum"),
    ).orderBy("l_orderkey")


ARRAY_HOF_SQL = """
WITH arrs AS (
  SELECT l_orderkey,
         list_sort(list(CAST(l_quantity AS INTEGER))) AS qtys
  FROM lineitem WHERE l_orderkey <= 2000 GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(qtys) AS INTEGER) AS n_items,
       array_to_string([CAST(q * 2 AS VARCHAR) FOR q IN qtys], ',') AS doubled,
       CAST(len(list_filter(qtys, q -> q >= 20)) AS INTEGER) AS n_big,
       list_reduce(list_prepend(CAST(0 AS BIGINT), qtys),
                   (acc, q) -> acc + q) AS qty_sum
FROM arrs ORDER BY l_orderkey
"""


def topk_sketch_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k frequent-items sketch over document tokens. This
    corpus' vocabulary (~31 tokens) is far under the sketch's tracking
    capacity, so the estimator is in its EXACT regime and the result is
    hash-comparable to the true top-k — serialized "token:count" sorted
    by (count desc, token) with the same deterministic tie-break both
    sides."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    # request far more slots than the vocabulary: the sketch then tracks
    # EVERY token with exact counts, and the top-10 cut happens below
    # under an explicit (count desc, token asc) order — cutting at k
    # inside the sketch would break count TIES at the boundary by
    # arrival order, which is partitioning-dependent
    sk = tok.agg(F.expr("approx_top_k(token, 1000)").alias("tk"))
    return sk.select(
        F.array_join(
            F.slice(
                F.transform(
                    F.expr(
                        "array_sort(tk, (a, b) -> CASE WHEN a.count > b.count "
                        "THEN -1 WHEN a.count < b.count THEN 1 WHEN "
                        "a.item < b.item THEN -1 WHEN a.item > b.item THEN 1 "
                        "ELSE 0 END)"
                    ),
                    lambda s: F.concat_ws(":", s["item"], s["count"]),
                ),
                1,
                10,
            ),
            "|",
        ).alias("top_tokens")
    )


TOPK_SKETCH_SQL = r"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
), counts AS (
  SELECT token, COUNT(*) AS n FROM tok GROUP BY token
  ORDER BY n DESC, token ASC LIMIT 10
)
SELECT string_agg(token || ':' || n, '|' ORDER BY n DESC, token ASC)
  AS top_tokens
FROM counts
"""


_DS_HLL_TOL_PCT = 3


def hll_sketch_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL (hll_sketch_agg/estimate) — the
    MERGEABLE sketch for cross-job cardinality (sketches persist and
    union, unlike approx_count_distinct's internal-only state). Gated
    like the other sketches: pinned tolerance vs exact, loud failure
    past it."""
    orders = _t(spark, sf_dir, "orders")
    got = orders.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").alias("a"),
        F.countDistinct("o_custkey").alias("e"),
    )
    err = F.abs(F.col("a") - F.col("e")) * 100.0 / F.col("e")
    return got.select(
        F.lit(1).cast("int").alias("n_checks"),
        F.when(err <= _DS_HLL_TOL_PCT, F.lit(_DS_HLL_TOL_PCT))
        .otherwise(F.ceil(err))
        .cast("int")
        .alias("err_pct_floor"),
    )


HLL_SKETCH_GATE_SQL = f"""
SELECT 1 AS n_checks, {_DS_HLL_TOL_PCT} AS err_pct_floor
"""


_KLL_ACCURACY = 10_000
_KLL_PCTS = (0.5, 0.95, 0.99)
_KLL_TOL = 4  # rank-error units the gate tolerates (merge slack)


def quantile_sketch_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna mergeable quantile sketch) —
    the streaming/partial-aggregating percentile for 100 TB where an
    exact percentile needs a full sort. Gated in RANK space, where the
    sketch's guarantee lives (rank error <= n/accuracy): for each
    probed percentile p, count rows <= the approx value and check
    |count_le - p*n| <= n/accuracy — all exact integer arithmetic, so
    the gate itself is deterministic even though the sketch value can
    vary with merge order. Same loud-failure convention as the HLL
    gate above: the output floors to the tolerance when inside it and
    reports the ceil'd violation when not."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    probes = li.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.percentile_approx("x", p, _KLL_ACCURACY).alias(f"a{i}")
            for i, p in enumerate(_KLL_PCTS)
        ],
    )
    counted = li.crossJoin(F.broadcast(probes)).agg(
        F.max("n").alias("n"),
        *[
            F.sum(
                F.when(F.col("x") <= F.col(f"a{i}"), 1).otherwise(0)
            ).alias(f"le{i}")
            for i in range(len(_KLL_PCTS))
        ],
    )
    # worst rank error across probes, in n/accuracy units; a single
    # GK sketch guarantees <= 1 unit, but Spark's partial-aggregated
    # percentile_approx MERGES per-partition sketches and merge can
    # compound the bound (measured 1.x units at sf0.001) — gate at
    # _KLL_TOL units, loud beyond it
    errs = [
        F.abs(F.col(f"le{i}") - F.lit(p) * F.col("n"))
        * F.lit(_KLL_ACCURACY)
        / F.col("n")
        for i, p in enumerate(_KLL_PCTS)
    ]
    worst = F.greatest(*errs) if len(errs) > 1 else errs[0]
    return counted.select(
        F.lit(len(_KLL_PCTS)).cast("int").alias("n_checks"),
        F.when(worst <= float(_KLL_TOL), F.lit(_KLL_TOL))
        .otherwise(F.ceil(worst))
        .cast("int")
        .alias("rank_err_units_floor"),
    )


QUANTILE_SKETCH_GATE_SQL = f"""
SELECT {len(_KLL_PCTS)} AS n_checks, {_KLL_TOL} AS rank_err_units_floor
"""


_CMS_D, _CMS_W = 4, 1024


def cms_heavy_hitters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (`operators/sketch.py`): build
    the depth x width frequency sketch over every corpus token — the
    fixed-size summary an unbounded key space needs at 100 TB (the
    frequency analogue of the HLL gate above; the sketch relation
    partial-aggregates to <= 4096 rows per partition BEFORE the
    shuffle, and merges across batches by re-summing) — then point-
    estimate the 15 alphabetically-first vocabulary tokens and carry
    the exact count beside it. CMS is deterministic given the portable
    hash, so the oracle rebuilds the identical sketch and the driver
    hashes BOTH the estimates and the exact counts; the est >= exact
    one-sided guarantee is pinned in tests/test_sketch.py."""
    from implementation_of_an_etl_process_spark.functions.text_exprs import (
        tokens,
    )
    from implementation_of_an_etl_process_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )
    from implementation_of_an_etl_process_spark.plans import spread

    docs = spread(_t(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tokens("text")).alias("token")).filter(
        F.col("token") != ""
    )
    sketch = cms_build(toks, "token", depth=_CMS_D, width=_CMS_W)
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy("token")
        .limit(15)
    )
    return cms_estimate(
        exact, sketch, "token", depth=_CMS_D, width=_CMS_W
    ).orderBy("token")


def _cms_hash_sql(row: str, value: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('r' || {row} || ':' || {value}), 1, 16))"
        f"::UBIGINT % {_CMS_W} AS BIGINT)"
    )


CMS_HEAVY_HITTERS_SQL = rf"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
), tok2 AS (
  SELECT token FROM tok WHERE token <> ''
), rows_ AS (
  SELECT unnest(generate_series(0, {_CMS_D - 1})) AS row
), cms AS (
  SELECT row, {_cms_hash_sql("row", "token")} AS cell,
         COUNT(*) AS cnt
  FROM tok2, rows_ GROUP BY 1, 2
), exact AS (
  SELECT token, COUNT(*) AS exact_cnt FROM tok2 GROUP BY token
  ORDER BY token LIMIT 15
), probed AS (
  SELECT e.token, e.exact_cnt,
         COALESCE(c.cnt, 0) AS cell_cnt
  FROM exact e
  CROSS JOIN rows_ r
  LEFT JOIN cms c
    ON c.row = r.row AND c.cell = {_cms_hash_sql("r.row", "e.token")}
)
SELECT token, CAST(MIN(exact_cnt) AS BIGINT) AS exact_cnt,
       CAST(MIN(cell_cnt) AS BIGINT) AS est
FROM probed GROUP BY token ORDER BY token
"""


def fuzzy_match_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (entity-resolution shape): candidate
    pairs block on nationkey (the classic blocking-key step that keeps
    the comparison count linear-ish at scale), then edit distance <= 2
    confirms. Levenshtein is the same DP both engines, so exact."""
    from implementation_of_an_etl_process_spark.plans import spread

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    # The blocking key has only ~25 values: a shuffle join would cap
    # parallelism at 25 skewed tasks. Broadcast one side instead and
    # spread the probe side (single-file scans arrive as 1 partition),
    # so every core scores pairs. At real ER scale the fix is a finer
    # composite blocking key, not a bigger shuffle.
    a, b = spread(cust).alias("a"), F.broadcast(cust.alias("b"))
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    )
    return (
        pairs.select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("dist"),
        )
        .filter(F.col("dist") <= 2)
        .orderBy("key_a", "key_b")
    )


FUZZY_MATCH_SQL = """
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       levenshtein(a.c_name, b.c_name) AS dist
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
ORDER BY key_a, key_b
"""


def feature_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order feature statistics (mean / sample stddev / sample
    covariance / Pearson correlation) computed the determinism-
    discipline way: inputs quantized to int64 (quantity as-is, price in
    cents), all five moments accumulated EXACTLY (products summed in
    DECIMAL so a 100x scale-up cannot overflow), and the statistics
    derived from the exact moments in one fixed double expression —
    bit-identical across engines and partitionings, unlike the builtin
    float corr/covar_samp/stddev whose accumulation order varies.

    Scale shape: a single partial/final aggregate (one shuffle on the
    3-value group key); the moment formulas are post-aggregation scalar
    math on 3 rows. This is the standard one-pass parallel-moments
    trick for dataset feature profiling."""
    li = _t(spark, sf_dir, "lineitem")
    xq = F.round(F.col("l_quantity")).cast("long")
    yq = F.round(F.col("l_extendedprice") * 100).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xq).alias("sx"),
        F.sum(yq).alias("sy"),
        F.sum(dec(xq * xq)).alias("sxx"),
        F.sum(dec(yq * yq)).alias("syy"),
        F.sum(dec(xq * yq)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    return agg.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 6).alias("mean_qty"),
        F.round(F.sqrt(vx / (n * (n - 1))), 6).alias("stddev_qty"),
        F.round(sy / n, 6).alias("mean_price_cents"),
        F.round(F.sqrt(vy / (n * (n - 1))), 6).alias("stddev_price_cents"),
        F.round(cov / (n * (n - 1)), 6).alias("covar_samp"),
        F.round(cov / F.sqrt(vx * vy), 6).alias("corr"),
    ).orderBy("l_returnflag")


FEATURE_MOMENTS_SQL = """
WITH q AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS BIGINT) AS xq,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS yq
  FROM lineitem
), m AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(xq) AS sx, SUM(yq) AS sy,
         SUM(xq * xq) AS sxx, SUM(yq * yq) AS syy, SUM(xq * yq) AS sxy
  FROM q GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_qty,
       round(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6)
         AS stddev_qty,
       round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_price_cents,
       round(sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6)
         AS stddev_price_cents,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 6)
         AS covar_samp,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS corr
FROM m
ORDER BY l_returnflag
"""


_KMV_K = 64


def kmv_distinct_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct sketch (`operators/sketch.py::kmv_sketch`
    — the fourth mergeable sketch beside HLL/CMS/GK, and the only one
    whose ESTIMATE is engine-exact, since it is integer order-statistic
    arithmetic on portable md5 hashes): per corpus source, estimate the
    distinct BIGRAM count from the k=64 smallest hashes and carry the
    exact distinct count beside it. Sources with < k distinct bigrams
    report exactly (n_seen < k); larger ones exercise the
    ``(k-1) * 2^60 div h_(k)`` estimator. The union-merge closure
    (partial sketches roll up bit-identically) is property-tested in
    tests/test_sketch.py."""
    from implementation_of_an_etl_process_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_sketch,
    )
    from implementation_of_an_etl_process_spark.plans import spread

    docs = spread(_t(spark, sf_dir, "documents"))
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != "",
    )
    bigrams = (
        docs.select("source", toks.alias("_t"))
        .filter(F.size("_t") >= 2)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_t") - 2),
                    lambda i: F.concat_ws(
                        " ", F.col("_t")[i], F.col("_t")[i + F.lit(1)]
                    ),
                )
            ).alias("item"),
        )
    )
    sk = kmv_sketch(bigrams, "source", "item", k=_KMV_K)
    est = kmv_distinct_estimate(sk, "source", k=_KMV_K)
    exact = bigrams.groupBy("source").agg(
        F.count_distinct("item").alias("exact_distinct")
    )
    return (
        est.join(exact, "source")
        .select(
            "source",
            F.col("n_seen").cast("long").alias("n_seen"),
            F.col("est_distinct").cast("long").alias("est_distinct"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
        )
        .orderBy("source")
    )


KMV_DISTINCT_SQL = rf"""
WITH l AS (
  SELECT source,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     x -> x <> '') AS toks
  FROM documents
), big AS (
  SELECT DISTINCT source, toks[i] || ' ' || toks[i + 1] AS item
  FROM l, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
), h AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(item), 1, 15))::UBIGINT AS BIGINT) AS hv
  FROM big
), r AS (
  SELECT source, hv,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn
  FROM h
), agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_seen,
         MAX(CASE WHEN rn = {_KMV_K} THEN hv END) AS hk
  FROM r WHERE rn <= {_KMV_K} GROUP BY source
), ex AS (
  -- exact over the RAW items (big), not the 60-bit hashes (h): the
  -- engine side computes count_distinct on the bigrams themselves, so
  -- a hash collision between distinct bigrams must not desync the
  -- column labeled "exact" (r12 advice)
  SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM big GROUP BY source
)
SELECT a.source, a.n_seen,
       CAST(CASE WHEN a.n_seen < {_KMV_K} THEN a.n_seen
            ELSE (CAST({_KMV_K - 1} AS HUGEINT) * {1 << 60}) // a.hk
            END AS BIGINT) AS est_distinct,
       e.exact_distinct
FROM agg a JOIN ex e USING (source)
ORDER BY a.source
"""


QUERIES = {
    "feature_moments_lineitem": feature_moments_lineitem,
    "kmv_distinct_sources": kmv_distinct_sources,
    "map_funcs_orders": map_funcs_orders,
    "math_funcs_lineitem": math_funcs_lineitem,
    "array_hof_orders": array_hof_orders,
    "topk_sketch_tokens": topk_sketch_tokens,
    "hll_sketch_gate": hll_sketch_gate,
    "cms_heavy_hitters_docs": cms_heavy_hitters_docs,
    "quantile_sketch_gate": quantile_sketch_gate,
    "fuzzy_match_customers": fuzzy_match_customers,
}

ORACLES = {
    "feature_moments_lineitem": FEATURE_MOMENTS_SQL,
    "kmv_distinct_sources": KMV_DISTINCT_SQL,
    "map_funcs_orders": MAP_FUNCS_SQL,
    "math_funcs_lineitem": MATH_FUNCS_SQL,
    "array_hof_orders": ARRAY_HOF_SQL,
    "topk_sketch_tokens": TOPK_SKETCH_SQL,
    "hll_sketch_gate": HLL_SKETCH_GATE_SQL,
    "cms_heavy_hitters_docs": CMS_HEAVY_HITTERS_SQL,
    "quantile_sketch_gate": QUANTILE_SKETCH_GATE_SQL,
    "fuzzy_match_customers": FUZZY_MATCH_SQL,
}
