"""Unit tests for operators/similarity.py helpers that must stay
engine-portable (auto_bits is computed Python-side at index build and
relationally inside the DuckDB oracle — the two must agree for EVERY corpus
size, including the power-of-two boundaries where a float log2 could flip)."""

import duckdb
import pytest

from olap_sus_spark.operators.similarity import auto_bits


def test_auto_bits_boundaries():
    # floor: tiny corpora stay at 4 bits
    assert auto_bits(0) == 4
    assert auto_bits(1) == 4
    assert auto_bits(256) == 4
    assert auto_bits(4096) == 4  # ceil(4096/256)=16 -> 4 bits exactly
    # exact power-of-two edges must not flip by a ulp
    assert auto_bits(4097) == 5
    assert auto_bits(8192) == 5
    assert auto_bits(8193) == 6
    assert auto_bits(200_000) == 10
    assert auto_bits(10**9) == 22


@pytest.mark.parametrize("n", [0, 1, 255, 256, 257, 4095, 4096, 4097,
                               65536, 65537, 200_000, 10**6, 10**9])
def test_auto_bits_matches_oracle_ladder(n):
    """The DuckDB nb-CTE formulation in queries/vector.py must produce the
    identical bit count (both sides: smallest h with 2^h >= ceil(N/256),
    floored at 4 — pure integer arithmetic, no libm)."""
    got = duckdb.sql(
        f"""
        SELECT GREATEST(4, MIN(h.h)) AS b
        FROM range(0, 23) h(h)
        WHERE (CAST(1 AS BIGINT) << h.h) >= ({n} + 255) // 256
        """
    ).fetchone()[0]
    assert got == auto_bits(n)
