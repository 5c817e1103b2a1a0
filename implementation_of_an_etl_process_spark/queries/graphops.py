"""Battery entries for the graph operators (``operators/graph.py``),
on a deterministic purchase graph derived from the star schema:
nodes are ``o_custkey % 97`` / ``l_suppkey % 97``, edges are thinned by
a fixed hash so the graph is non-complete (97 nodes, out-degrees 29-50
at sf0.01).

The PageRank oracle is the interesting one: the operator's fixed-point
integer arithmetic makes 5 full iterations reproducible in SQL as
unrolled CTEs (generated below from the same formula), so an iterative
distributed algorithm still gets an exact value hash — something a
float implementation could never promise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators.graph import (
    SCALE,
    pagerank_fixed_point,
    triangle_count,
)
from implementation_of_an_etl_process_spark.plans import maybe_broadcast
from implementation_of_an_etl_process_spark.queries.relational import _t

_ITERATIONS = 5
_DAMPING = 85

_EDGE_SQL = """
  SELECT DISTINCT o_custkey % 97 AS src, l_suppkey % 97 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey % 97 <> l_suppkey % 97
    AND (o_custkey * 31 + l_suppkey * 17) % 11 = 0
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = li.join(maybe_broadcast(o), li.l_orderkey == o.o_orderkey)
    return (
        j.filter(
            ((F.col("o_custkey") % 97) != (F.col("l_suppkey") % 97))
            & (
                (F.col("o_custkey") * 31 + F.col("l_suppkey") * 17) % 11
                == 0
            )
        )
        .select(
            (F.col("o_custkey") % 97).alias("src"),
            (F.col("l_suppkey") % 97).alias("dst"),
        )
        .distinct()
    )


def pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank_fixed_point(
        _edges(spark, sf_dir),  # ends in .distinct(): skip the re-dedup
        iterations=_ITERATIONS,
        damping_pct=_DAMPING,
        redistribute_dangling=True,
        assume_distinct_edges=True,
    ).orderBy("id")


def _pagerank_oracle(
    edge_sql: str = None, final_select: str = None
) -> str:
    """Unrolled-CTE oracle including the dangling-mass term: each step
    computes the previous ranks' sum over out-degree-less nodes, floor-
    divides by N, and adds the per-node share inside the damped multiply
    — mirroring the operator's integer formula exactly. Parameterized
    by the edge relation so any graph (purchases, word co-occurrence)
    reuses the same generated algebra."""
    edge_sql = edge_sql or _EDGE_SQL
    head = f"""
WITH e AS ({edge_sql}),
nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
dangling AS (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM deg)),
const AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT id, {SCALE} // n AS rank FROM nodes, const)"""
    steps = []
    for k in range(1, _ITERATIONS + 1):
        steps.append(f""",
dm{k} AS (
  SELECT COALESCE(SUM(r.rank), 0) // c.n AS share
  FROM const c LEFT JOIN (
    SELECT rank FROM r{k - 1} JOIN dangling USING (id)
  ) r ON TRUE
  GROUP BY c.n),
r{k} AS (
  SELECT n.id,
         ({(100 - _DAMPING) * SCALE} // (100 * c.n))
         + ({_DAMPING} * (COALESCE(SUM(t.contrib), 0) + dm.share)) // 100
           AS rank
  FROM nodes n CROSS JOIN const c CROSS JOIN dm{k} dm
  LEFT JOIN (
    SELECT e.dst AS id, r.rank // d.outdeg AS contrib
    FROM e JOIN r{k - 1} r ON e.src = r.id
           JOIN deg d ON e.src = d.src
  ) t ON t.id = n.id
  GROUP BY n.id, c.n, dm.share)"""
        )
    final_select = final_select or (
        f"SELECT id, CAST(rank AS BIGINT) AS rank "
        f"FROM r{_ITERATIONS} ORDER BY id"
    )
    return head + "".join(steps) + "\n" + final_select


PAGERANK_SQL = _pagerank_oracle()


def triangle_count_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count(_edges(spark, sf_dir))


TRIANGLE_SQL = f"""
WITH e AS ({_EDGE_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e
)
SELECT COUNT(*) AS n_triangles
FROM und e1
JOIN und e2 ON e1.b = e2.a
JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
"""


_WORD_EDGE_SQL = r"""
  WITH arrs AS (
    SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                       t -> t <> '') AS arr
    FROM documents
  ), bp AS (
    SELECT unnest(list_transform(range(1, len(arr)),
             i -> struct_pack(a := arr[i], b := arr[i + 1]))) AS bg
    FROM arrs
  ), und AS (
    SELECT DISTINCT bg.a AS w1, bg.b AS w2 FROM bp WHERE bg.a <> bg.b
  )
  SELECT w1 AS src, w2 AS dst FROM und
  UNION
  SELECT w2 AS src, w1 AS dst FROM und
"""


def keyword_pagerank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, "TextRank:
    Bringing Order into Text", EMNLP 2004) at corpus scale: the word
    co-occurrence graph (symmetrized distinct adjacent-word pairs,
    self-loops dropped) ranked by the integer fixed-point PageRank —
    text + graph machinery composed, and the iterative algorithm still
    value-hashes exactly thanks to the all-integer formula. Top-10 by
    (rank DESC, word ASC)."""
    from implementation_of_an_etl_process_spark.operators.text import (
        adjacent_word_pairs,
    )
    from implementation_of_an_etl_process_spark.queries.textops import _docs

    pairs = adjacent_word_pairs(_docs(spark, sf_dir)).select("w1", "w2")
    # ONE vocab²-bounded dedup shuffle total (round-8 plan note): emit
    # each undirected edge canonically as (least, greatest), distinct
    # once, then EXPLODE both directions — the exploded set is distinct
    # by construction (a < b strictly), so the symmetrize step and
    # PageRank's own edge dedup both become free.
    canon = (
        pairs.filter(F.col("w1") != F.col("w2"))
        .select(
            F.least("w1", "w2").alias("a"),
            F.greatest("w1", "w2").alias("b"),
        )
        .distinct()
    )
    edges = canon.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    ranks = pagerank_fixed_point(
        edges,
        iterations=_ITERATIONS,
        damping_pct=_DAMPING,
        redistribute_dangling=True,
        assume_distinct_edges=True,
    )
    return (
        ranks.orderBy(F.col("rank").desc(), F.col("id").asc())
        .limit(10)
        .select(F.col("id").alias("word"), "rank")
        .orderBy(F.col("rank").desc(), F.col("word").asc())
    )


KEYWORD_PAGERANK_SQL = _pagerank_oracle(
    edge_sql=_WORD_EDGE_SQL,
    final_select=(
        f"SELECT id AS word, CAST(rank AS BIGINT) AS rank FROM r{_ITERATIONS} "
        "ORDER BY rank DESC, word ASC LIMIT 10"
    ),
)


QUERIES = {
    "pagerank_purchases": pagerank_purchases,
    "triangle_count_purchases": triangle_count_purchases,
    "keyword_pagerank_docs": keyword_pagerank_docs,
}

ORACLES = {
    "pagerank_purchases": PAGERANK_SQL,
    "triangle_count_purchases": TRIANGLE_SQL,
    "keyword_pagerank_docs": KEYWORD_PAGERANK_SQL,
}
