"""Distributed clustering: Lloyd k-means in exact int64 fixed point —
extension scope (the reference engine, ``ETL.java:1``, has no ML
surface; clustering is the embedding-side workhorse of a training-data
pipeline: semantic dedup buckets, topic balancing, IVF coarse
quantizers for the ANN stack in ``operators/similarity.py``).

Relationship to ``operators/similarity.py::train_ivf_centroids``: that
one fits float Spark-ML KMeans on a SAMPLE (fast coarse quantizer,
seeded but not engine-reproducible); this one is the exact-arithmetic
full-corpus path that can sit under the value-hash gate and be
replayed by any engine.

The same determinism trick as ``operators/graph.py``'s PageRank:
embeddings quantize to int64 once (round(x * SCALE)), every distance
is an integer sum of squares, every centroid update is an integer
FLOOR division — bit-exact and summation-order independent on any
partitioning, so even a multi-iteration run hash-matches an
unrolled-CTE DuckDB oracle. (Float k-means differs in the last ulp per
iteration and can flip argmin ties — unusable under a value gate.)

Scale shape per iteration:
- assignment is a pure Column expression (the k centroids are LITERAL
  arrays — k x dim longs, driver-held control state exactly like
  Spark ML's own KMeans);
- the centroid update is one posexplode (rows x dim) into a map-side-
  combined groupBy (cluster, dim) — at most k x dim result rows;
- the only driver traffic is k x dim longs per iteration (bounded by
  contract, same class as a broadcast threshold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_fixed_point", "quantize_vec"]

VEC_SCALE = 10**6


def quantize_vec(col: Column | str, *, scale: int = VEC_SCALE) -> Column:
    """array<float/double> -> array<long>, round(x * scale) per dim —
    float32 widens to double exactly, so both engines see identical
    doubles before the shared round."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c,
        lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast(
            "long"
        ),
    )


def kmeans_fixed_point(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 4,
    iterations: int = 2,
    scale: int = VEC_SCALE,
) -> DataFrame:
    """Lloyd k-means, exact integer arithmetic. Returns one row per
    input row: (id, cluster, dist_q) after ``iterations`` full
    assign/update rounds — cluster ids are 0..k-1 in order of the k
    smallest ``id_col`` values (the deterministic seeding), dist_q is
    the squared distance to the final assigned centroid in quantized
    units. Ties in argmin break toward the lower cluster id, exactly
    as the oracle's (distance, cid) ordering does.

    Input contract: vectors must be non-null and uniform-length. A
    null or shorter-than-dim vector is not validated in-plan (that
    would cost a full scan before any work) — it propagates as null
    distances and a null cluster id; validate upstream if the corpus
    can be ragged. Empty input fails loudly below."""
    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    q = df.select(
        F.col(id_col).alias("_id"),
        quantize_vec(vec_col, scale=scale).alias("_v"),
    )
    head = q.select(F.size("_v").alias("n")).first()
    if head is None or head["n"] is None:
        raise ValueError(
            f"need >= {k} non-null rows to seed {k} clusters "
            f"({'empty input' if head is None else 'first vector is null'})"
        )
    dim = head["n"]
    # assignment embeds k x dim literals in ONE expression — fine for
    # analysis-scale k (this operator's niche: exact, oracle-gated),
    # hostile to codegen beyond it. Large-k coarse quantizers belong to
    # similarity.train_ivf_centroids (sampled Spark-ML KMeans).
    if k * dim > 65536:
        raise ValueError(
            f"k*dim = {k * dim} literals would blow up codegen; "
            "use similarity.train_ivf_centroids for large-k quantizers"
        )
    # deterministic seed: the k smallest ids' vectors
    seed_rows = q.orderBy("_id").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need >= {k} rows to seed {k} clusters")
    centroids = [list(r["_v"]) for r in seed_rows]

    from pyspark import StorageLevel

    q = q.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        assigned = None
        for _ in range(iterations):
            assigned = _assign(q, centroids)
            sums = (
                assigned.select(
                    "_cid", F.posexplode("_v").alias("_dim", "_val")
                )
                .groupBy("_cid", "_dim")
                .agg(
                    F.sum("_val").alias("_s"),
                    F.count(F.lit(1)).alias("_n"),
                )
                .collect()
            )
            per = {}
            for r in sums:
                # TRUNCATING integer division (toward zero): DuckDB's
                # integer `//` truncates (-7 // 2 = -3), matching
                # Spark's `div`; python's // FLOORS and would drift
                # one unit on negative centroid sums
                s, n = r["_s"], r["_n"]
                per.setdefault(r["_cid"], [0] * dim)[r["_dim"]] = (
                    s // n if s >= 0 else -((-s) // n)
                )
            # empty clusters keep their previous centroid (both
            # engines: the oracle's update only rewrites clusters that
            # received points)
            centroids = [
                per.get(cid, centroids[cid]) for cid in range(k)
            ]
        final = _assign(q, centroids)
        return final.select(
            F.col("_id").alias(id_col),
            F.col("_cid").alias("cluster"),
            F.col("_d").alias("dist_q"),
        )
    finally:
        q.unpersist(blocking=False)


def _assign(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Argmin assignment against literal centroid arrays: pure Column
    integer arithmetic, no join, no shuffle."""
    dists = []
    for cid, c in enumerate(centroids):
        lit_c = F.array(*[F.lit(int(x)).cast("long") for x in c])
        d = F.aggregate(
            F.zip_with("_v", lit_c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        dists.append(d.alias(f"_d{cid}"))
    with_d = q.select("_id", "_v", *dists)
    best_d = F.least(*[F.col(f"_d{c}") for c in range(len(centroids))])
    cid_expr = F.lit(None).cast("int")
    # first cid reaching the min wins (reverse fold keeps earlier
    # clusters overriding later ones on ties)
    for cid in reversed(range(len(centroids))):
        cid_expr = F.when(
            F.col(f"_d{cid}") == best_d, F.lit(cid)
        ).otherwise(cid_expr)
    return with_d.select(
        "_id",
        "_v",
        cid_expr.alias("_cid"),
        best_d.alias("_d"),
    )
