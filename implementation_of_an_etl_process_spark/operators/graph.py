"""Distributed graph operators: fixed-point PageRank and triangle
counting, composed from joins + aggregates so Catalyst plans them like
any other relational workload.

Iterative algorithms are the one shape a SQL oracle can't express
directly — the trick here is **fixed-point integer arithmetic**: ranks
live as int64 scaled by 1e12 and every step uses only integer multiply
/ floor-divide / sum, which are bit-exact and order-independent on both
engines, so even a 5-iteration PageRank hash-matches an unrolled-CTE
DuckDB oracle. (Float PageRank would differ in the last ulp per
iteration and drift.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_fixed_point", "triangle_count"]

SCALE = 10**12


def pagerank_fixed_point(
    edges: DataFrame,
    *,
    iterations: int = 5,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list, exact int64 fixed-point.

    ``rank_{t+1}(v) = (100-d)%*SCALE/N + d% * Σ_{u→v} rank_t(u)/outdeg(u)``
    with every division a floor-divide — deterministic, associative,
    overflow-safe (total mass ≤ SCALE, well under 2^63). Dangling-node
    mass is dropped rather than redistributed (documented variant; the
    redistribution term would just add one scalar aggregate per step).

    Scale shape: each iteration is one join of the edge list with the
    current 1-row-per-node rank table (ranks broadcast when small, AQE
    otherwise) plus one partial-aggregated shuffle on dst. The edge
    list is reused every step — persist it upstream for real sizes, and
    pass ``checkpoint=True`` to cut lineage on long runs (driver stays
    control-plane only).
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # N and the two derived constants are driver-side scalars (control
    # plane only — same role as the reference sizing its arrays up
    # front); the rank data itself never touches the driver.
    n = nodes.count()
    init = SCALE // n
    base = ((100 - damping_pct) * SCALE) // (100 * n)
    # edge ⨝ outdeg is loop-invariant: join once, reuse every iteration
    e_deg = e.join(outdeg, "src").select("src", "dst", "outdeg")
    rank = nodes.withColumn("rank", F.lit(init).cast("long"))
    for _ in range(iterations):
        contribs = (
            e_deg.join(rank.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("rank div outdeg").alias("contrib"),
            )
        )
        inflow = contribs.groupBy("id").agg(F.sum("contrib").alias("inflow"))
        rank = nodes.join(inflow, "id", "left").select(
            "id",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_pct} * coalesce(inflow, 0L)) div 100"
                )
            ).cast("long").alias("rank"),
        )
        if checkpoint:
            rank = rank.localCheckpoint()
    return rank


def triangle_count(
    edges: DataFrame, *, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Count triangles in the undirected projection of an edge list.

    Canonicalize each edge to (a < b), then the classic two-join
    enumeration e1(a,b) ⨝ e2(b,c) ⨝ e3(a,c) counts each triangle
    exactly once. Intermediate size is Σ_b indeg(b)·outdeg(b) — for
    skewed real graphs pre-split high-degree vertices; fine as-is for
    the bounded node spaces this battery derives.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))
