"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``olap_sus_spark``; this module just adapts the
registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary) on /root/testdata/sf0.001."""
    from olap_sus_spark.queries.pricing import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    import olap_sus_spark.queries  # noqa: F401 — populates the registry
    from olap_sus_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twins for every SQL-expressible query."""
    import olap_sus_spark.queries  # noqa: F401
    from olap_sus_spark.registry import ORACLE

    return dict(ORACLE)
