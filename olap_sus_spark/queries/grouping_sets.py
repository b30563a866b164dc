"""Grouping-set extensions: ROLLUP and CUBE (SURVEY.md §7 — the natural
superset of the reference's flat GROUP BY roll-up queries: one pass computes
every grain of the hierarchy, so drill-down needs no second query)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.queries._util import dec
from olap_sus_spark.registry import register

_ROLLUP_ORACLE = """
SELECT
    r.r_name AS regiao,
    n.n_name AS nacao,
    COUNT(*) AS n_clientes,
    CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS saldo_total
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@register("rollup_hierarchy_totals", oracle=_ROLLUP_ORACLE)
def rollup_hierarchy_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the geography hierarchy: (região, nação) + per-região
    subtotals + grand total in one aggregation pass."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("c_nationkey"), "n_name", "n_regionkey")),
        "c_nationkey",
    ).join(
        F.broadcast(region.select(F.col("r_regionkey").alias("n_regionkey"), "r_name")),
        "n_regionkey",
    )
    return joined.rollup(
        F.col("r_name").alias("regiao"), F.col("n_name").alias("nacao")
    ).agg(
        F.count(F.lit(1)).alias("n_clientes"),
        F.sum(dec("c_acctbal")).cast("double").alias("saldo_total"),
    )


_CUBE_ORACLE = """
SELECT
    l_returnflag,
    l_linestatus,
    COUNT(*) AS n_linhas
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_flag_status", oracle=_CUBE_ORACLE)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two attributes: all four grains in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_linhas")
    )


@register("approx_aggregates")  # rows-only: sketch internals differ per engine
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — HyperLogLog distinct count and approximate
    quantiles.  No DuckDB oracle (sketches aren't bit-portable); accuracy is
    pinned by tests/test_text_unit.py::test_approx_aggregates_bounded_error
    against the exact values."""
    orders = load_table(spark, sf_dir, "orders")
    # Scalar p50/p90 columns, not one array column: the driver's pandas
    # canonicalizer cannot hash list-valued cells.
    return orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("clientes_aprox"),
        F.percentile_approx("o_totalprice", F.lit(0.5), 10000).alias("p50_preco"),
        F.percentile_approx("o_totalprice", F.lit(0.9), 10000).alias("p90_preco"),
    )
