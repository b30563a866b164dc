"""Helpers shared by query implementations.

Oracle-exactness rules (see registry.py):

- monetary aggregates run on ``DECIMAL(18,2)`` casts (exact addition,
  identical in Spark and DuckDB);
- NEVER cast a computed double to decimal (Spark rounds the shortest-repr
  string HALF_UP, DuckDB rounds the binary value — they disagree near .005);
  multiply decimals instead;
- a decimal is cast to double only at scale ≤ 2 with scaled magnitude
  < 2^53 (round first if needed) — there the conversion is exact in both
  engines; higher scales hit DuckDB's int128/10^scale double division error;
- derived ratios use pure IEEE double arithmetic on operands produced by
  the rules above, with no rounding step, so results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def money_sum(col: Column | str, alias: str) -> Column:
    """Exact decimal sum emitted as double (same bits as DuckDB's)."""
    return F.sum(dec(col)).cast("double").alias(alias)
