"""Vector expression builders for embedding columns (array<float>).

Exactness discipline: engines disagree on float summation order, so any
score that feeds a correctness gate is computed over **quantized
integer** vectors — int64 dot products and norms are exact and
order-independent; the final cosine is a deterministic double expression
of exact ints. The float fast path (``float_cosine``) exists for
throughput-only use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT_SCALE = 10_000  # 4 decimal digits of embedding precision


def quantize_vec(col: Column | str, scale: int = QUANT_SCALE) -> Column:
    """array<float> -> array<long> of round(x*scale)."""
    c = F.col(col) if isinstance(col, str) else col
    # Cast to double BEFORE scaling: float32 multiply would round
    # differently from the (double-math) oracle.
    return F.transform(
        c, lambda x: F.round(x.cast("double") * scale, 0).cast("long")
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def int_norm2(a: Column) -> Column:
    return int_dot(a, a)


def int_cosine(a: Column, b: Column, *, decimals: int = 6) -> Column:
    """Cosine similarity over quantized vectors, rounded — deterministic
    across engines because every input to the double math is an exact
    int64."""
    dot = int_dot(a, b).cast("double")
    na = F.sqrt(int_norm2(a).cast("double"))
    nb = F.sqrt(int_norm2(b).cast("double"))
    return F.round(dot / (na * nb), decimals)


def float_cosine(a: Column, b: Column) -> Column:
    """Float-path cosine (throughput use; not oracle-exact)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return dot / (na * nb)
