"""Mergeable frequency sketches: count-min (Cormode & Muthukrishnan,
"An improved data stream summary: the count-min sketch and its
applications", J. Algorithms 2005) as a plain RELATION — extension
scope (the reference engine, ``ETL.java:1``, has exact aggregation
only; at 100 TB "how often does X occur" over an unbounded key space
wants a fixed-size summary, the same role HLL++ plays for distinct
counts in ``operators/quality.py``).

Why a relation and not a UDAF blob: the sketch IS a (row, cell, cnt)
table of at most depth x width rows, so building it is one
map-side-combined groupBy — partial aggregation bounds every
partition's contribution to depth x width rows BEFORE the shuffle, the
exact property that makes the sketch stream-mergeable (union two
sketches = unionByName + re-sum). Probing is a broadcast join against
the <= 4096-row table. Nothing driver-side, nothing opaque, and the
md5-derived cells make a DuckDB oracle reconstruct the sketch
word-for-word (same portable-hash convention as the Bloom filter in
``operators/pretrain.py`` and SimHash in ``operators/dedup.py``).

Guarantees (classic CMS): estimate >= true count always;
P[estimate > true + eps*N] <= (1/2)^depth with width = 2/eps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_estimate", "cms_merge"]


def _check_params(depth: int, width: int) -> None:
    if width < 2 or width & (width - 1):
        raise ValueError(f"width must be a power of two >= 2: {width}")
    if not 1 <= depth <= 16:
        raise ValueError(f"depth must be in [1, 16]: {depth}")


def _cms_cell(value: Column, row: int, width: int) -> Column:
    """Cell index of ``value`` in sketch row ``row``: the portable
    64-bit hash of 'r{row}:' || value, folded mod ``width``. Power-of-
    two width keeps Spark's signed pmod congruent with an unsigned
    oracle reading of the same hash bits."""
    from implementation_of_an_etl_process_spark.operators.dedup import (
        portable_hash64,
    )

    return F.pmod(
        portable_hash64(F.concat(F.lit(f"r{row}:"), value)),
        F.lit(width).cast("long"),
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of ``df[value_col]`` (optionally weighted) as
    (row int, cell long, cnt long), at most depth x width rows.

    One explode(depth) + one map-side-combined aggregate: every
    partition emits <= depth x width partial rows regardless of input
    size, so the shuffle is sketch-sized, not data-sized."""
    _check_params(depth, width)
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cms_cell(F.col(value_col), r, width).alias("cell"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"), w.alias("_w"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.cell").alias("cell"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two sketches built with identical (depth, width): cell
    counts add. This is what makes CMS a per-batch/per-day/per-source
    summary — build small, merge cheap."""
    return (
        a.unionByName(b)
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame,
    cms: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "est",
) -> DataFrame:
    """``probes`` plus column ``out_col`` = the CMS point estimate of
    value_col's frequency: min over the depth rows of the probed cell
    counts (0 where the cell was never touched). Collapses duplicate
    probe rows (grouped on the probe's own columns).

    Shape note: probes to a frequency sketch are QUERY-sized (the
    candidate heavy hitters you want estimates for), so the lazy
    explode + broadcast-join + per-probe min is the right plan — ONE
    job in which the sketch lineage executes once and fuses with the
    probe scan. Two alternatives were tried and rejected on plan shape
    (round 9): depth separate broadcast joins embed the (unmaterialized)
    sketch lineage depth times, and collecting the sketch into
    create_map literals pushes ~2 x depth x width literal expressions
    through Catalyst analysis. If you genuinely need corpus-sided
    membership probing, that is the Bloom filter's job
    (``operators/pretrain.py::bloom_membership``), not a frequency
    estimate.

    The sketch side is aliased to reserved ``_cms_*`` names before the
    join, so probe frames may freely carry columns named row/cell/cnt;
    a probe column colliding with the reserved names (or ``out_col``)
    raises up front instead of an AnalysisException mid-plan."""
    _check_params(depth, width)
    reserved = {"_cms_row", "_cms_cell", "_cms_cnt", "_c", out_col}
    collide = reserved & set(probes.columns)
    if collide:
        raise ValueError(
            f"probe columns collide with cms_estimate's reserved names: "
            f"{sorted(collide)}"
        )
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cms_cell(F.col(value_col), r, width).alias("cell"),
            )
            for r in range(depth)
        ]
    )
    sk = cms.select(
        F.col("row").alias("_cms_row"),
        F.col("cell").alias("_cms_cell"),
        F.col("cnt").alias("_cms_cnt"),
    )
    keys = list(probes.columns)
    exploded = probes.select("*", F.explode(cells).alias("_c"))
    return (
        exploded.join(
            F.broadcast(sk),
            (F.col("_c.row") == F.col("_cms_row"))
            & (F.col("_c.cell") == F.col("_cms_cell")),
            "left",
        )
        .groupBy(*keys)
        .agg(F.min(F.coalesce("_cms_cnt", F.lit(0))).alias(out_col))
    )
