"""Unit tests for text/dedup primitives: simhash determinism + locality,
BPE pre-tokenization."""

from __future__ import annotations

from pyspark.sql import functions as F

from olap_sus_spark.operators import dedup as dd
from olap_sus_spark.operators import text as tx


def _hashes(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r.h for r in df.select(dd.simhash64(F.col("text")).alias("h")).collect()]


def test_simhash_deterministic(spark):
    a = _hashes(spark, ["the quick brown fox jumps over the lazy dog"] * 3)
    b = _hashes(spark, ["the quick brown fox jumps over the lazy dog"])
    assert len(set(a)) == 1 and a[0] == b[0]


def test_simhash_locality(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different content about spark catalyst optimizer internals"
    h_base, h_near, h_far = _hashes(spark, [base, near, far])

    def hamming(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert hamming(h_base, h_near) < hamming(h_base, h_far)
    assert hamming(h_base, h_near) <= 16  # near-dup within typical threshold


def test_bpe_pretokens(spark):
    df = spark.createDataFrame([("Hello world, it's 2024!",)], "text string")
    toks = df.select(tx.bpe_pretokens(F.col("text")).alias("t")).first().t
    assert toks == ["Hello", " world", ",", " it", "'", "s", " 2024", "!"]
    n = df.select(tx.bpe_pretoken_count(F.col("text")).alias("n")).first().n
    assert n == len(toks)
