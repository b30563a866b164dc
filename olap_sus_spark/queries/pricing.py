"""Flagship query: pricing summary (scan → filter → wide hash aggregate).

This is the engine's A1/A5/A6-family showcase (SURVEY.md §2.4): a full-scan
grouped aggregation with additive and derived measures, shaped like the
classic TPC-H Q1 pricing summary.  At 100 TB this plan is a single parquet
scan with the date predicate pushed to the row-group level, partial (map-side)
aggregation on 6 tiny groups, and one 6-row shuffle — the optimal shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.queries._util import dec
from olap_sus_spark.registry import register

_CUTOFF = "2001-09-02 00:00:00"

_ORACLE = f"""
SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_disc_price,
    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_charge,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    # Derived measures stay in exact decimal arithmetic end-to-end: a
    # double→decimal cast of a *product* rounds differently in Spark
    # (shortest-repr HALF_UP) vs DuckDB (binary value), so never round
    # doubles — multiply decimals.
    disc = F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    tax = F.lit(1) + F.col("l_tax").cast("decimal(6,4)")
    disc_price = dec("l_extendedprice") * disc
    charge = dec("l_extendedprice") * disc * tax
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / cnt.cast("double")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / cnt.cast("double")).alias("avg_price"),
            (
                F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double")
                / cnt.cast("double")
            ).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )
