"""Data-layout operators: space-filling-curve (Z-order) clustering for
multi-dimensional file pruning — mandated-extension scope (the
reference engine, ``ETL.java:1``, has no storage layout at all; at
100 TB layout IS the query optimizer's biggest lever).

Why Z-order: parquet prunes at file/row-group granularity from min/max
statistics. A linear sort clusters ONE column perfectly and leaves
every other column's (min, max) spanning the full domain, so a
predicate on a non-sort column prunes nothing. Interleaving the bits
of d normalized columns (Morton order) bounds every file to a small
hyper-box in all d dimensions at once, so conjunctive range predicates
on ANY subset of them skip most files. The same trick Delta Lake's
OPTIMIZE ZORDER BY and many warehouse CLUSTER BY implementations use.

Scale shape:
- ``zorder_key`` is a pure integer Column expression (shift/and/or
  folds — whole-stage-codegen'd JVM arithmetic, no UDF, no shuffle).
- ``zorder_repartition`` adds exactly ONE range shuffle (the same cost
  a linear sort-by-key layout pays) and drops the key before write —
  layout cost is O(one pass), pruning benefit recurs on every read.
- Bit width is per-dimension and bounded (``bits * len(cols) <= 63``)
  so the key always fits a BIGINT.

Relationship to ``sources/sinks.py``: ``write_zordered_parquet`` /
``zorder_column`` there handle GENERIC numeric columns (doubles,
NULL/constant degradation) via ``width_bucket`` and delegate the
interleave to :func:`interleave_bits` here; this module carries the
exact integer-domain path whose key the DuckDB oracle reproduces
bit-for-bit (:func:`zorder_key_sql`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interleave_bits", "zorder_key", "zorder_repartition"]


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton-interleave the low ``bits`` bits of each integer column:
    output bit (i*d + j) = bit i of cols[j] (d = len(cols)). Callers
    normalize each column into [0, 2**bits) first (``zorder_key`` does
    a pmod; rank-based normalization also works and equalizes skew)."""
    d = len(cols)
    if d < 2:
        raise ValueError("interleave_bits needs >= 2 columns")
    if bits < 1 or bits * d > 63:
        raise ValueError(f"bits * len(cols) must be in [2, 63], got {bits * d}")
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(
                F.lit(1).cast("long")
            )
            out = out.bitwiseOR(F.shiftleft(bit, i * d + j))
    return out


def zorder_key(cols: list[Column | str], *, bits: int = 16) -> Column:
    """Z-order key over integer columns, each folded into [0, 2**bits)
    with pmod (negative-safe). Pure Column arithmetic — engine-portable
    (the DuckDB oracle reproduces it bit-for-bit with the same
    shift/and expression)."""
    dom = 1 << bits
    norm = [
        F.pmod((F.col(c) if isinstance(c, str) else c).cast("long"), F.lit(dom))
        for c in cols
    ]
    return interleave_bits(norm, bits)


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    num_files: int | None = None,
    domains: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Cluster ``df`` along the Z-curve of ``cols``: one range
    repartition on the Morton key plus an intra-partition sort, key
    dropped afterward. Writing the result yields files whose min/max
    boxes are tight in EVERY listed column — the multi-dimensional
    pruning layout (see tests/test_layout.py for the measured
    candidate-file counts vs a linear sort).

    Each column is affine-scaled from its (min, max) domain to the
    FULL [0, 2**bits) range before interleaving — with unequal
    cardinalities (say 100k users x 365 days), raw interleaving puts
    the narrow column's bits only in the LOW positions, so the curve
    degenerates to a sort on the wide column and the narrow dimension
    prunes nothing (measured: a 10% day-slice hit 64/64 files raw vs
    9/64 scaled at 50M rows). ``domains`` maps col -> (lo, hi);
    columns not listed get one min/max aggregate over df (a cheap
    extra pass — pass domains when you know them)."""
    domains = dict(domains or {})
    missing = [c for c in cols if c not in domains]
    if missing:
        aggs = []
        for c in missing:
            aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
        row = df.agg(*aggs).first()
        for c in missing:
            domains[c] = (row[f"_lo_{c}"], row[f"_hi_{c}"])
    dom = 1 << bits
    scaled = []
    for c in cols:
        lo, hi = domains[c]
        if lo is None or hi is None or hi <= lo:
            # all-NULL column, empty input, or constant column: one
            # bucket (same degradation as sinks.zorder_column)
            scaled.append(F.lit(0).cast("long"))
            continue
        width = int(hi) - int(lo) + 1
        # NULLs sort with the domain minimum; out-of-domain rows clamp
        # INTO [lo, hi] *before* any arithmetic — with caller-supplied
        # domains narrower than the data, ``v - lo`` on an unclamped
        # far-out value could overflow int64 and abort the whole
        # rewrite under Spark 4's default ANSI mode (greatest/least is
        # pure comparison, overflow-free).
        v = F.coalesce(F.col(c).cast("long"), F.lit(int(lo)))
        v = F.greatest(
            F.lit(int(lo)).cast("long"),
            F.least(F.lit(int(hi)).cast("long"), v),
        )
        if width <= 1 << 62:
            # EXACT integer bucketing via a power-of-two step:
            # shiftright(v - lo, shift) — no multiply that could
            # overflow int64 (and crash under Spark 4's default ANSI
            # mode), no double division that rounds past 2**53. The
            # pow2 step may use up to 2x fewer than 2**bits buckets
            # when width isn't a power of two — irrelevant for a
            # layout key.
            shift = max(0, width.bit_length() - bits)
            s = F.shiftright(v - F.lit(int(lo)), shift)
        else:
            # full-int64-range domains (snowflake ids, raw 64-bit
            # hashes): (v - lo) itself overflows, so bucket by the
            # top bits of v directly — arithmetic shift is monotone
            # over signed int64; the offset moves it into [0, dom)
            s = F.shiftright(v, 64 - bits) + F.lit(1 << (bits - 1))
        scaled.append(
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.lit(dom - 1).cast("long"), s.cast("long")),
            )
        )
    key = interleave_bits(scaled, bits).alias("_zkey")
    out = df.select("*", key)
    out = (
        out.repartitionByRange(num_files, "_zkey")
        if num_files
        else out.repartitionByRange("_zkey")
    )
    return out.sortWithinPartitions("_zkey").drop("_zkey")


def zorder_key_sql(cols: list[str], *, bits: int = 16) -> str:
    """The DuckDB rendering of :func:`zorder_key` (oracle generator) —
    kept adjacent to the Spark expression so the two stay in lockstep."""
    d = len(cols)
    dom = 1 << bits
    norm = [f"(((({c}) % {dom}) + {dom}) % {dom})" for c in cols]
    terms = [
        f"((({norm[j]} >> {i}) & 1) << {i * d + j})"
        for i in range(bits)
        for j in range(d)
    ]
    return "(" + " | ".join(terms) + ")"
