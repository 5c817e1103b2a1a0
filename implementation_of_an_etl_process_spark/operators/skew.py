"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting (enabled in the session factory) handles
sort-merge join skew at runtime; these explicit salting operators cover
the cases AQE doesn't: skewed *aggregation* keys, and hash joins where
one key dominates so badly that a single task would own it.

Correctness note: the salt only changes the partitioning, never the
result — both operators are verified equal to their unsalted plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt from the full row content.

    NOT ``monotonically_increasing_id()``: that value depends on task/
    partition numbering, so a shuffle-map task recomputed after executor
    loss could assign different salts than the lost attempt — the classic
    nondeterministic-shuffle-input hazard that duplicates/drops rows.
    Hashing the row's own columns makes retries reproduce identical
    salts. Fully duplicate rows share a salt, which only costs spreading
    when a hot KEY is also all-duplicate in every payload column.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_group_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    *,
    n_salts: int = 16,
    count_alias: str | None = None,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: pre-aggregate on
    (keys, salt) so a hot key's rows spread over ``n_salts`` tasks, then
    combine the partials. Works for any algebraic aggregate; sums and an
    optional count are provided here.

    (Spark's partial aggregation already combines map-side; explicit
    salting additionally splits the hot key at the *shuffle* level —
    the stage partial aggregation can't help when one reduce key owns
    10% of all rows.)
    """
    salt = _row_salt(df, n_salts)
    aggs1 = [F.sum(c).alias(f"_s_{c}") for c in sum_cols]
    aggs2 = [F.sum(f"_s_{c}").alias(c) for c in sum_cols]
    if count_alias:
        aggs1.append(F.count(F.lit(1)).alias("_s_cnt"))
        aggs2.append(F.sum("_s_cnt").alias(count_alias))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*aggs1)
    return partial.groupBy(*keys).agg(*aggs2)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted key: the small side is replicated
    ``n_salts`` times (one copy per salt), the big side gets a
    pseudo-random salt — so a hot key's probe rows spread across
    ``n_salts`` reduce tasks instead of one.

    Use when the small side is too big to broadcast AND the key is
    skewed. Replication multiplies the small side by ``n_salts``; keep
    it for genuinely small-but-unbroadcastable sides.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", _row_salt(big, n_salts))
    return big_salted.join(small_rep, [key, "_salt"], how).drop("_salt")
