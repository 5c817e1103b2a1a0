"""Hand-checkable properties of operators/graph.py (the sf0.01 battery
pins full-graph values against the unrolled-CTE oracle)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators.graph import (
    SCALE,
    _canonical_undirected,
    orient_by_degree,
    pagerank_fixed_point,
    triangle_count,
    triangle_count_unoriented,
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


def test_triangle_oriented_equals_unoriented_on_random_graph(spark):
    # the id-ordered enumeration is the oracle for the degree-oriented
    # path: same count on an arbitrary random digraph (dups, both
    # directions, self-loop noise)
    rng = random.Random(7)
    edges = [
        (rng.randrange(30), rng.randrange(30)) for _ in range(300)
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    assert (
        triangle_count(e).first()["n_triangles"]
        == triangle_count_unoriented(e).first()["n_triangles"]
    )


def test_degree_orientation_bounds_hub_wedges(spark):
    """Hub graph (one center, id in the middle of the id space, spokes
    on both sides): the unoriented a<b enumeration builds
    below·above ≈ (k/2)² wedges through the hub, the degree
    orientation builds ZERO (every spoke edge points INTO the hub, so
    the hub has out-degree 0). This is the intermediate-size evidence
    for the oriented path."""
    hub, k = 50, 40
    spokes = [(i, hub) for i in range(hub - k // 2, hub)] + [
        (hub, i) for i in range(hub + 1, hub + 1 + k // 2)
    ]
    e = spark.createDataFrame(spokes, "src long, dst long")
    und = _canonical_undirected(e, "src", "dst")

    def wedges(d):
        return (
            d.alias("e1")
            .join(
                d.alias("e2"), F.col("e1.dst") == F.col("e2.src")
            )
            .count()
        )

    unoriented = wedges(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    oriented = wedges(orient_by_degree(und))
    assert unoriented == (k // 2) ** 2
    assert oriented == 0
    # and the answer itself is unchanged (no triangles in a star)
    assert triangle_count(e).first()["n_triangles"] == 0


def _pagerank_python(edges, iterations=5, damping=85, redistribute=False):
    """Row-at-a-time reference of the exact integer formula."""
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: SCALE // n for v in nodes}
    base = (100 - damping) * SCALE // (100 * n)
    for _ in range(iterations):
        share = (
            sum(rank[v] for v in nodes if v not in out) // n
            if redistribute
            else 0
        )
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // out[s]
        rank = {
            v: base + damping * (inflow[v] + share) // 100 for v in nodes
        }
    return rank


def test_pagerank_dangling_redistribution_matches_reference(spark):
    # node 4 is dangling; with redistribution its accumulated mass is
    # returned to the graph each step instead of leaking
    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    for redistribute in (False, True):
        got = {
            r["id"]: r["rank"]
            for r in pagerank_fixed_point(
                e, redistribute_dangling=redistribute
            ).collect()
        }
        assert got == _pagerank_python(edges, redistribute=redistribute)
    leaky = sum(_pagerank_python(edges).values())
    kept = sum(_pagerank_python(edges, redistribute=True).values())
    assert kept > leaky
    assert kept <= SCALE  # floor-divides only ever drop mass


def test_star_cc_matches_label_propagation(spark):
    """Star contraction and min-label propagation agree on a mixed
    graph (several components, one with a cycle, isolated pair)."""
    from implementation_of_an_etl_process_spark.operators.dedup import (
        cluster_pairs,
    )
    from implementation_of_an_etl_process_spark.operators.graph import (
        connected_components_star,
    )

    edges = [
        (1, 2), (2, 3), (3, 1),       # triangle
        (10, 11), (11, 12),           # path
        (20, 21),                     # pair
        (5, 5),                       # self-loop ignored
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    star = {
        (r["_id"], r["cluster"])
        for r in connected_components_star(e).collect()
    }
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a long, id_b long"
    )
    lp = {
        (r["_id"], r["cluster"]) for r in cluster_pairs(pairs).collect()
    }
    assert star == lp
    assert (3, 1) in star and (12, 10) in star and (21, 20) in star


def test_star_cc_chain_beats_diameter_bound(spark):
    """The reason star CC exists: a 2000-link chain converges in
    O(log² n) star rounds, where min-label propagation would need 2000
    rounds (cluster_pairs' default 20-round budget provably cannot
    finish it)."""
    from implementation_of_an_etl_process_spark.operators.dedup import (
        cluster_pairs,
    )
    from implementation_of_an_etl_process_spark.operators.graph import (
        connected_components_star,
    )

    n = 2000
    chain = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    labels = connected_components_star(chain, max_iterations=25)
    agg = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("cluster").alias("ncl"),
        F.min("cluster").alias("root"),
    ).first()
    assert (agg["n"], agg["ncl"], agg["root"]) == (n, 1, 0)
    # the O(diameter) alternative genuinely can't, at its default budget
    pairs = chain.select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    lp_clusters = (
        cluster_pairs(pairs).agg(F.count_distinct("cluster")).first()[0]
    )
    assert lp_clusters > 1  # unconverged after 20 rounds, as predicted


def test_star_cc_string_keys(spark):
    """Doc-fingerprint graphs key by strings; least/greatest ordering
    must work unchanged."""
    from implementation_of_an_etl_process_spark.operators.graph import (
        connected_components_star,
    )

    e = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
    )
    got = {
        (r["_id"], r["cluster"])
        for r in connected_components_star(e).collect()
    }
    assert got == {
        ("b", "b"), ("c", "b"), ("d", "b"), ("x", "x"), ("y", "x")
    }


def test_pagerank_key_type_harmonization(spark):
    """Regression (round-8 ADVICE): numeric src/dst of DIFFERENT widths
    (int vs long) must still join — keys harmonize to long; string
    keys pass through; mixed numeric/string raises instead of silently
    matching nothing."""
    import pytest

    edges = [(1, 2), (2, 3), (3, 1)]
    wide = spark.createDataFrame(edges, "src int, dst long")
    same = spark.createDataFrame(edges, "src long, dst long")
    got_w = {
        r["id"]: r["rank"] for r in pagerank_fixed_point(wide).collect()
    }
    got_s = {
        r["id"]: r["rank"] for r in pagerank_fixed_point(same).collect()
    }
    assert got_w == got_s and len(got_w) == 3
    strs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got_str = {
        r["id"]: r["rank"] for r in pagerank_fixed_point(strs).collect()
    }
    assert sorted(got_str.values()) == sorted(got_s.values())
    mixed = spark.createDataFrame(
        [(1, "b")], "src long, dst string"
    )
    with pytest.raises(TypeError, match="incompatible"):
        pagerank_fixed_point(mixed)


def test_pagerank_assume_distinct_edges_skips_dedup(spark):
    """assume_distinct_edges=True on a truly-distinct edge list gives
    the identical ranks with one fewer dedup shuffle; on a DUPLICATED
    list the flag (correctly) changes the answer — documenting why it
    is opt-in."""
    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    base = {r["id"]: r["rank"] for r in pagerank_fixed_point(e).collect()}
    fast = {
        r["id"]: r["rank"]
        for r in pagerank_fixed_point(
            e, assume_distinct_edges=True
        ).collect()
    }
    assert base == fast
    dup = spark.createDataFrame(edges + edges, "src long, dst long")
    dedup = {
        r["id"]: r["rank"] for r in pagerank_fixed_point(dup).collect()
    }
    assert dedup == base  # default path still dedups
