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


# --- KMV (bottom-k) distinct sketch -----------------------------------------

KMV_SPACE = 1 << 60  # hash domain: first 15 md5 hex chars = 60 bits


def _kmv_hash(item: Column) -> Column:
    """Engine-portable 60-bit item hash (the repo's md5-prefix
    convention — DuckDB: ``('0x'||substr(md5(x),1,15))::UBIGINT``):
    uniform on [0, 2^60), so bottom-k order statistics estimate
    distinct counts."""
    return F.conv(
        F.substring(F.md5(item.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame, group_col: str, item_col: str, *, k: int = 64
) -> DataFrame:
    """Per-group KMV (k-minimum-values / bottom-k) distinct sketch:
    the sorted k smallest distinct item hashes, plus how many were
    seen (< k means the group's distinct count is exact). The fourth
    mergeable sketch in the family (HLL, GK, CMS/Bloom, and this) —
    KMV additionally supports UNION merging by construction
    (:func:`kmv_union`) and, unlike HLL++, is engine-exact: the same
    md5-derived hashes reproduce bit-for-bit in any engine, so the
    estimate itself can be oracle-hashed.

    Plan shape at 100 TB: distinct on (group, hash), then a rank
    filter that Spark executes as WindowGroupLimit (map-side top-k
    per partition BEFORE the exchange), then a k-bounded
    collect_list — per-group state never exceeds k."""
    from pyspark.sql import Window

    hd = df.select(
        F.col(group_col).alias("_g"),
        _kmv_hash(F.col(item_col)).alias("_h"),
    ).distinct()
    w = Window.partitionBy("_g").orderBy("_h")
    bot = hd.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return bot.groupBy("_g").agg(
        F.sort_array(F.collect_list("_h")).alias("kmv"),
        F.count(F.lit(1)).alias("n_seen"),
    ).select(F.col("_g").alias(group_col), "kmv", "n_seen")


def kmv_distinct_estimate(
    sketch: DataFrame, group_col: str, *, k: int = 64
) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: exact ``n_seen``
    when the group saw fewer than k distinct hashes, else the
    order-statistic estimator ``(k-1) * SPACE div h_(k)`` — integer
    division on the exact 60-bit hash, so the estimate is
    deterministic and engine-portable (no float)."""
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("long")
    ).otherwise(
        F.expr(
            f"CAST(CAST({k - 1} AS DECIMAL(38,0)) * {KMV_SPACE} "
            f"div element_at(kmv, {k}) AS BIGINT)"
        )
    )
    return sketch.select(
        group_col, "n_seen", est.alias("est_distinct")
    )


def kmv_union(a: DataFrame, b: DataFrame, group_col: str, *, k: int = 64):
    """Merge two KMV sketch relations group-wise: bottom-k of the
    union of hash sets. Exact merge property (bottom-k of A∪B equals
    bottom-k of bottom-k(A) ∪ bottom-k(B)) makes the sketch closed
    under union — per-partition sketches roll up to the global one,
    property-tested in tests/test_sketch.py."""
    from pyspark.sql import Window

    ex = a.unionByName(b).select(
        F.col(group_col).alias("_g"), F.explode("kmv").alias("_h")
    ).distinct()
    w = Window.partitionBy("_g").orderBy("_h")
    bot = ex.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return bot.groupBy("_g").agg(
        F.sort_array(F.collect_list("_h")).alias("kmv"),
        F.count(F.lit(1)).alias("n_seen"),
    ).select(F.col("_g").alias(group_col), "kmv", "n_seen")


def kmv_jaccard(
    a: DataFrame,
    b: DataFrame,
    group_col: str,
    *,
    k: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """Group-wise Jaccard similarity estimate between two KMV sketch
    relations (same ``group_col`` domain): over the merged bottom-k
    ``M = bottom_k(A ∪ B)``, the estimator is ``|M ∩ A ∩ B| / |M|`` —
    the classic KMV set-resemblance trick (M is a uniform sample of
    the union, so membership-in-both among M estimates the overlap
    fraction). Output ``jaccard_q = scale * matches div |M|``: integer
    arithmetic on exact hashes, so the ESTIMATE itself is
    deterministic and engine-portable, like everything else in this
    family. Groups present in only one side get jaccard_q = 0.

    The dedup use: cheap corpus-overlap triage between two sources /
    two snapshots BEFORE committing to a full MinHash-LSH pass —
    sketches are k longs per group, so the compare is a broadcast-size
    join however large the corpora were."""
    am = a.select(
        F.col(group_col).alias("_g"), F.col("kmv").alias("_ka")
    )
    bm = b.select(
        F.col(group_col).alias("_g"), F.col("kmv").alias("_kb")
    )
    merged = kmv_union(a, b, group_col, k=k).select(
        F.col(group_col).alias("_g"), F.col("kmv").alias("_km")
    )
    j = (
        merged.join(am, "_g", "left")
        .join(bm, "_g", "left")
        .select(
            "_g",
            F.size("_km").alias("_m"),
            F.size(
                F.array_intersect(
                    F.array_intersect(
                        "_km", F.coalesce("_ka", F.array().cast("array<long>"))
                    ),
                    F.coalesce("_kb", F.array().cast("array<long>")),
                )
            ).alias("_both"),
        )
    )
    return j.select(
        F.col("_g").alias(group_col),
        F.col("_m").cast("long").alias("n_merged"),
        F.col("_both").cast("long").alias("n_in_both"),
        F.expr(f"CAST(CAST({int(scale)} AS BIGINT) * _both div _m AS BIGINT)")
        .alias("jaccard_q"),
    ).orderBy(group_col)
