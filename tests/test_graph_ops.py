"""Hand-checkable properties of operators/graph.py (the sf0.01 battery
pins full-graph values against the unrolled-CTE oracle)."""

from __future__ import annotations

from implementation_of_an_etl_process_spark.operators.graph import (
    SCALE,
    pagerank_fixed_point,
    triangle_count,
)


def test_pagerank_cycle_is_uniform(spark):
    # 3-cycle: perfectly symmetric, every node keeps rank SCALE/3
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    ranks = {r["id"]: r["rank"] for r in pagerank_fixed_point(e).collect()}
    assert len(set(ranks.values())) == 1
    # base + 0.85 * SCALE/3 == SCALE/3 up to fixed-point floor error
    assert abs(ranks[1] - SCALE // 3) <= 5


def test_pagerank_sink_outranks_sources(spark):
    # star into node 9: it aggregates damped mass from all spokes
    e = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (9, 1)], "src long, dst long"
    )
    ranks = {r["id"]: r["rank"] for r in pagerank_fixed_point(e).collect()}
    assert ranks[9] > ranks[1] > ranks[2] == ranks[3]
    # total mass never exceeds SCALE (dangling mass only leaks, never grows)
    assert sum(ranks.values()) <= SCALE


def test_triangle_count_known_graphs(spark):
    # K4 has 4 triangles; direction/duplication must not matter
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    e = spark.createDataFrame(k4, "src long, dst long")
    assert triangle_count(e).first()["n_triangles"] == 4

    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    assert triangle_count(path).first()["n_triangles"] == 0
