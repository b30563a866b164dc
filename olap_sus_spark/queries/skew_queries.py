"""Skew-mitigation parity queries: salted plans must be bit-identical to
their unsalted oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators import skew
from olap_sus_spark.queries._util import dec
from olap_sus_spark.registry import register

_SALTED_AGG_ORACLE = """
SELECT
    l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("salted_aggregate", oracle=_SALTED_AGG_ORACLE)
def salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted count+sum on a 3-value (maximally hot) group key —
    the partial/final decomposition must not change any value."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = skew.salted_count(li, ["l_returnflag"], ["l_orderkey", "l_linenumber"], out="n")
    sums = skew.salted_sum(
        li, ["l_returnflag"], dec("l_quantity"), ["l_orderkey", "l_linenumber"]
    ).select("l_returnflag", F.col("total").cast("double").alias("total_qty"))
    return counts.join(sums, "l_returnflag")


_SALTED_JOIN_ORACLE = """
SELECT n.n_name AS nacao, COUNT(*) AS n_pedidos
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


@register("salted_join_rollup", oracle=_SALTED_JOIN_ORACLE)
def salted_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join (orders ⋈ customer on the salted key, nation
    replicated per salt bucket) — equals the plain join exactly."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = skew.salted_join(orders, cust, ["o_custkey"], ["o_orderkey"], buckets=8)
    joined = joined.join(F.broadcast(nation), "c_nationkey")
    return joined.groupBy(F.col("n_name").alias("nacao")).agg(
        F.count(F.lit(1)).alias("n_pedidos")
    )
