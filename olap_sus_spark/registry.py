"""Query registry: named (Spark callable, DuckDB oracle SQL) pairs.

Every operator the engine claims is registered here with a Spark
implementation ``(spark, sf_dir) -> DataFrame`` and — when the semantics are
ANSI-SQL-expressible — an equivalent DuckDB oracle query over the same
parquet tables.  The driver's correctness gate executes both and compares
row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- float outputs are produced via exact (decimal / integer) arithmetic and
  converted to double with identical rounding at the very end, so the two
  engines emit bit-identical values;
- ties in top-k / rank queries are broken by a deterministic key.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QueryFn = Callable[[Any, str], Any]  # (SparkSession, sf_dir) -> DataFrame

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
