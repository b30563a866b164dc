"""Bloom-filtered semi-join: no-false-negative guarantee, bounded false
positives, exactness of the composed operator (oracle value parity for
bloom_pruned_brand_revenue runs in the generic registry suite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators.bloom import (
    bloom_bits,
    bloom_semi_join,
    bloom_size,
    might_contain,
)
from tests.conftest import SF_DIR


def _keys(spark):
    return (
        load_table(spark, SF_DIR, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )


def test_no_false_negatives(spark):
    """Every inserted key must pass its own bitmap — the property that
    makes the bloom a safe pre-filter."""
    keys = _keys(spark)
    m = bloom_size(keys.count())
    table = bloom_bits(keys, "p_partkey", m)
    assert keys.filter(~might_contain("p_partkey", table, m)).count() == 0


def test_false_positive_rate_bounded(spark):
    """At 1/16 load with k=4 probes the FP rate is < 1%; assert a 2%
    ceiling on the non-member population (deterministic md5 hashes)."""
    keys = _keys(spark)
    m = bloom_size(keys.count())
    table = bloom_bits(keys, "p_partkey", m)
    others = (
        load_table(spark, SF_DIR, "part")
        .filter(F.col("p_brand") != "Brand#1")
        .select("p_partkey")
    )
    n_other = others.count()
    fp = others.filter(might_contain("p_partkey", table, m)).count()
    assert fp / n_other < 0.02, (fp, n_other)


def test_bloom_semi_join_is_exact(spark):
    """The composed operator must return exactly the plain semi-join's
    rows — false positives die in the exact join."""
    keys = _keys(spark)
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_orderkey", "l_linenumber"
    )
    got = sorted(
        tuple(r)
        for r in bloom_semi_join(li, "p_partkey", keys, "p_partkey").collect()
    )
    want = sorted(
        tuple(r) for r in li.join(F.broadcast(keys), "p_partkey", "left_semi").collect()
    )
    assert got == want and len(want) > 0


def test_bitmap_is_bounded(spark):
    """The driver-side word table stays tiny regardless of fact volume —
    it is sized by the BUILD side only (m = next_pow2(16·n) / 32 words)."""
    keys = _keys(spark)
    n = keys.count()
    m = bloom_size(n)
    assert m <= 2 * 16 * max(n, 64)
    assert len(bloom_bits(keys, "p_partkey", m)) == m // 32
