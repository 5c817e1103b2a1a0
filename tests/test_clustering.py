"""Fixed-point k-means: python-reference exactness and the
deterministic-seeding/empty-cluster contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _py_kmeans(rows, k, iterations, scale=10**6):
    """Reference Lloyd with the operator's exact integer conventions:
    round-quantize, truncating centroid division, lowest-cid ties."""
    q = {
        r["vec_id"]: [round(float(x) * scale) for x in r["embedding"]]
        for r in rows
    }
    cents = [q[v] for v in sorted(q)[:k]]

    def assign(c):
        out = {}
        for vid, v in q.items():
            ds = [
                (sum((a - b) * (a - b) for a, b in zip(v, cj)), j)
                for j, cj in enumerate(c)
            ]
            d, j = min(ds)
            out[vid] = (j, d)
        return out

    for _ in range(iterations):
        a = assign(cents)
        sums = {}
        for vid, (j, _) in a.items():
            acc, n = sums.setdefault(j, ([0] * len(q[vid]), 0))
            for i, x in enumerate(q[vid]):
                acc[i] += x
            sums[j] = (acc, n + 1)
        new = []
        for j in range(k):
            if j in sums:
                acc, n = sums[j]
                new.append(
                    [s // n if s >= 0 else -((-s) // n) for s in acc]
                )
            else:
                new.append(cents[j])
        cents = new
    return assign(cents)


def test_kmeans_matches_python_reference(spark):
    from implementation_of_an_etl_process_spark.operators.clustering import (
        kmeans_fixed_point,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = {
        r["vec_id"]: (r["cluster"], r["dist_q"])
        for r in kmeans_fixed_point(
            emb, "vec_id", "embedding", k=3, iterations=2
        ).collect()
    }
    want = _py_kmeans(
        emb.select("vec_id", "embedding").collect(), 3, 2
    )
    assert got == want
    assert len({c for c, _ in got.values()}) == 3


def test_kmeans_validates_and_seeds(spark):
    from implementation_of_an_etl_process_spark.operators.clustering import (
        kmeans_fixed_point,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    with pytest.raises(ValueError, match="k and iterations"):
        kmeans_fixed_point(emb, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError, match="rows to seed"):
        kmeans_fixed_point(
            emb.limit(2), "vec_id", "embedding", k=5, iterations=1
        )
    # seed vectors get distance 0 to their own centroid at iteration 0;
    # after convergence every dist_q is the min over centroids (>= 0)
    out = kmeans_fixed_point(emb, "vec_id", "embedding", k=2, iterations=1)
    assert out.filter(F.col("dist_q") < 0).count() == 0


SF_SMOKE = "/root/testdata/sf0.001"


def test_kmeans_empty_and_null_first_vector(spark):
    """Empty input and a null first vector both fail with the loud
    seeding ValueError, not a NoneType crash at the dim probe (r9
    advice)."""
    from implementation_of_an_etl_process_spark.operators.clustering import (
        kmeans_fixed_point,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty input"):
        kmeans_fixed_point(empty, "vec_id", "embedding", k=2)
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="null"):
        kmeans_fixed_point(nulls, "vec_id", "embedding", k=2)
