"""Skew-mitigation operators: salted aggregation and salted broadcast-free
joins.

AQE's skew-join splitting (enabled in session.py) handles most hot keys at
runtime; these explicit rewrites cover the two cases AQE cannot: a *grouped
aggregation* whose group key is pathologically hot (one reducer gets the
key's entire partition), and a shuffle join against a replicable side when
AQE stats arrive too late.  Both are pure plan rewrites — results are
bit-identical to the unsalted operator (oracle-verified by the
``salted_aggregate`` query).

Salts are deterministic (``xxhash64`` of identifying columns, mod buckets),
never ``rand()``: retries and speculative tasks must salt a row the same way
or exactly-once semantics break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def with_salt(df: DataFrame, salt_from: list[str], buckets: int = 16) -> DataFrame:
    """Deterministic bucket salt derived from high-cardinality columns."""
    return df.withColumn(SALT, F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(buckets)))


def salted_count(
    df: DataFrame, keys: list[str], salt_from: list[str], buckets: int = 16,
    out: str = "n",
) -> DataFrame:
    """Two-phase grouped count: partial count per (keys, salt) — at most
    ``buckets`` reducers share a hot key — then a tiny final roll-up on keys.

    Identical result to ``df.groupBy(keys).count()``; the first shuffle's
    per-reducer load is bounded by |hot key| / buckets.
    """
    partial = (
        with_salt(df, salt_from, buckets)
        .groupBy(*keys, SALT)
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out))


def salted_sum(
    df: DataFrame, keys: list[str], value: Column, salt_from: list[str],
    buckets: int = 16, out: str = "total",
) -> DataFrame:
    """Two-phase grouped sum (use exact decimal values for bit-stable
    results — see queries/_util.py)."""
    partial = (
        with_salt(df, salt_from, buckets)
        .groupBy(*keys, SALT)
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed shuffle join: salt the big side, replicate the small side once
    per bucket, join on (keys + salt).  A hot join key fans out across
    ``buckets`` reducers instead of one straggler.

    Use when the small side is too big to broadcast but cheap to replicate
    ``buckets``×; result equals ``big.join(small, on, how)`` exactly.
    """
    salted_big = with_salt(big, salt_from, buckets)
    salts = small.sparkSession.range(buckets).select(F.col("id").cast("bigint").alias(SALT))
    replicated = small.crossJoin(F.broadcast(salts))
    return salted_big.join(replicated, [*on, SALT], how).drop(SALT)
