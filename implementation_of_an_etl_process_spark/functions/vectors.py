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


def int_cosine_pre(
    a_q: Column, b_q: Column, a_n2: Column, b_n2: Column,
    *, decimals: int = 6,
) -> Column:
    """:func:`int_cosine` with both sides' norm² precomputed.

    Bit-identical to ``int_cosine(a_q, b_q)`` whenever ``a_n2 ==
    int_norm2(a_q)`` and ``b_n2 == int_norm2(b_q)``: the dot product,
    the two sqrt operands and the final round see exactly the same
    int64 / double values in the same order (norm² is a deterministic
    function of one side alone, so WHERE it is evaluated cannot change
    its value). Exists because the inline form re-evaluates both norms
    — 2×dim interpreted higher-order-lambda element visits — on every
    PAIR row of a join, where precomputing them once per SIDE row
    leaves only the dot per pair: measured 1.602s → 0.152s for 10k
    64-dim pair rows in a single task (r14 optimization round,
    guide §1.2 per-task work)."""
    dot = int_dot(a_q, b_q).cast("double")
    na = F.sqrt(a_n2.cast("double"))
    nb = F.sqrt(b_n2.cast("double"))
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
