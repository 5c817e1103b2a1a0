"""Text expression builders: tokenization, shingling, rolling hashes.

Everything is a pure Column expression (array/lambda higher-order
functions run inside codegen), so these compose into any plan without
leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Rolling-hash parameters (shared with the DuckDB oracle SQL): small
# enough that acc*BASE + code never overflows int64.
HASH_BASE = 131
HASH_MOD = 1_000_000_007


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def ngram_join(arr: Column, n: int, sep: str = " ") -> Column:
    """Array of ``sep``-joined n-grams of a token array.

    Built as a zip of n length-aligned shifted slices folded with
    concat_ws — column-wise array ops instead of the slice-per-index
    ``transform(sequence(0, cnt-n), i -> join(slice(arr, i+1, n)))``
    idiom, which allocates a fresh n-element array per gram and
    measured 4.7x slower (65s -> 14s for the 31M-shingle explode of
    the r15 600k-doc scale leg; identical output strings and order,
    value-checked across n and edge inputs). Inputs with fewer than n
    tokens yield an empty array (the ``when`` guard also keeps the
    negative-length slices of that case from ever evaluating).
    """
    cnt = F.size(arr)
    m = cnt - n + 1  # gram count when cnt >= n
    sh = F.slice(arr, 1, m)
    for j in range(1, n):
        sh = F.zip_with(
            sh, F.slice(arr, j + 1, m), lambda a, b: F.concat_ws(sep, a, b)
        )
    return F.when(cnt >= n, sh).otherwise(F.array().cast("array<string>"))


def word_shingles(toks: Column, k: int, *, distinct: bool = True) -> Column:
    """Word k-gram shingles as an array column (see :func:`ngram_join`
    for the build and its measured rationale). Documents with fewer
    than k tokens yield an empty array."""
    sh = ngram_join(toks, k)
    return F.array_distinct(sh) if distinct else sh


def rolling_hash(col: Column | str) -> Column:
    """Polynomial rolling hash over characters (document fingerprint).

    acc := (acc*131 + codepoint) mod 1e9+7, folded left-to-right —
    order-dependent by design (a permuted document hashes differently),
    exact int64 arithmetic so any engine reproduces it bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * HASH_BASE + x) % HASH_MOD,
    )


def let(value: Column, body) -> Column:
    """Single-binding "let" expression: evaluate ``value`` ONCE and
    bind it as the lambda variable of ``body``.

    Catalyst performs no common-subexpression elimination across
    higher-order-function lambdas, so an expensive expression (a
    tokenize, an md5-per-gram array) referenced inside a per-element
    lambda is recomputed at EVERY element — measured 11x on winnowing
    fingerprints (operators/text.py) and the per-bigram tokenize in
    bigram_lm_score. A 1-element ``transform`` is the cheapest binder:
    the array wraps one value, the lambda sees a plain reference."""
    return F.element_at(F.transform(F.array(value), body), 1)
