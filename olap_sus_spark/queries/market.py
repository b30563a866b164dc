"""Market-analysis query shapes (TPC-H Q8/Q11 families) — the two classic
"aggregate compared against an aggregate" patterns the rest of the surface
doesn't cover:

- **Conditional-share ratio** (Q8 shape): one region's fraction of total
  revenue per year — a FILTERed sum divided by the total sum, both from the
  same single pass.
- **Global-threshold HAVING** (Q11 shape): groups whose aggregate exceeds
  a fraction of the grand total — a scalar subquery threshold applied to a
  grouped aggregate.

Both run one distributed aggregation over the fact; the comparison scalars
are 1-row broadcasts.  Ratios/thresholds follow the _util exactness rules
(decimal sums; the fraction comparison is cross-multiplied in integers so
boundary groups decide identically in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.queries._util import dec
from olap_sus_spark.registry import register

# --------------------------------------------------------------------------
# Q8 shape: AMERICA-supplier share of total revenue per order year.
# One pass: per-year total and per-year conditional sum; share = exact
# decimals cast to double, divided (IEEE-identical).
# --------------------------------------------------------------------------
_SHARE_ORACLE = """
WITH base AS (
    SELECT EXTRACT(YEAR FROM o.o_orderdate)::INT AS ano,
           CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(6,4))) AS receita,
           (r.r_name = 'AMERICA') AS da_regiao
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
)
SELECT ano,
       CAST(ROUND(SUM(receita) FILTER (WHERE da_regiao), 2) AS DOUBLE)
       AS receita_regiao,
       CAST(ROUND(SUM(receita), 2) AS DOUBLE) AS receita_total,
       CAST(ROUND(SUM(receita) FILTER (WHERE da_regiao), 2) AS DOUBLE)
       / CAST(ROUND(SUM(receita), 2) AS DOUBLE) AS parcela
FROM base GROUP BY ano
"""


@register("market_share_by_year", oracle=_SHARE_ORACLE)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    receita = dec("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )
    base = (
        # No broadcast hint on orders: it is a fact table (a hard hint never
        # degrades to a shuffle join, it OOMs at real scale).  AQE picks the
        # strategy — shuffle join on l_orderkey at 100 TB, broadcast at
        # small SF if it sees fit.  The dims below stay hard-broadcast.
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"),
            "l_orderkey",
        )
        .join(
            supp.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"),
            "l_suppkey",
        )
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("s_nationkey"), "n_regionkey"
                )
            ),
            "s_nationkey",
        )
        .join(
            F.broadcast(
                region.select(F.col("r_regionkey").alias("n_regionkey"), "r_name")
            ),
            "n_regionkey",
        )
        .select(
            F.year("o_orderdate").alias("ano"),
            receita.alias("receita"),
            (F.col("r_name") == "AMERICA").alias("da_regiao"),
        )
    )
    reg = F.round(F.sum(F.when(F.col("da_regiao"), F.col("receita"))), 2).cast(
        "double"
    )
    tot = F.round(F.sum("receita"), 2).cast("double")
    return base.groupBy("ano").agg(
        reg.alias("receita_regiao"),
        tot.alias("receita_total"),
        (reg / tot).alias("parcela"),
    )


# --------------------------------------------------------------------------
# Q11 shape: parts whose aggregate quantity exceeds 0.05% of the grand
# total.  Integer quantities → the threshold test is stated cross-
# multiplied in exact integer/decimal arithmetic (qty * 2000 > total)
# instead of qty > total * 0.0005, so boundary parts decide identically.
# --------------------------------------------------------------------------
_IMPORTANT_ORACLE = """
WITH por_parte AS (
    SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qtd
    FROM lineitem GROUP BY l_partkey
),
total AS (SELECT CAST(SUM(qtd) AS BIGINT) AS total_qtd FROM por_parte)
SELECT p.l_partkey, p.qtd
FROM por_parte p CROSS JOIN total t
WHERE p.qtd * 2000 > t.total_qtd
"""


@register("important_stock_parts", oracle=_IMPORTANT_ORACLE)
def important_stock_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    por_parte = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qtd")
    )
    total = por_parte.agg(F.sum("qtd").alias("total_qtd"))
    return (
        por_parte.join(F.broadcast(total))
        .filter(F.col("qtd") * 2000 > F.col("total_qtd"))
        .select("l_partkey", "qtd")
    )


# --------------------------------------------------------------------------
# Skyline (Pareto frontier): parts not DOMINATED on (min price ↓, total
# quantity ↑) — no other part is both cheaper-or-equal and
# higher-or-equal-volume with at least one strict.  The dominance test is
# a non-equi NOT EXISTS anti-join, but it runs on the *aggregated part
# grain* (dim-bounded rows however large the fact table), so the
# broadcast nested loop is intended and cheap; at larger grains the
# standard refinement is grid-blocking by rank buckets.  The fact-side
# aggregation is the only real shuffle.
# --------------------------------------------------------------------------
_SKYLINE_ORACLE = """
WITH pp AS (
    SELECT l_partkey,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qtd,
           CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS menor_preco
    FROM lineitem GROUP BY l_partkey
)
SELECT a.l_partkey, a.menor_preco, a.qtd
FROM pp a
WHERE NOT EXISTS (
    SELECT 1 FROM pp b
    WHERE b.menor_preco <= a.menor_preco AND b.qtd >= a.qtd
      AND (b.menor_preco < a.menor_preco OR b.qtd > a.qtd)
)
"""


@register("skyline_parts", oracle=_SKYLINE_ORACLE)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pp = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qtd"),
        F.min(dec("l_extendedprice")).cast("double").alias("menor_preco"),
    )
    a, b = pp.alias("a"), pp.alias("b")
    dominated = (
        (F.col("b.menor_preco") <= F.col("a.menor_preco"))
        & (F.col("b.qtd") >= F.col("a.qtd"))
        & (
            (F.col("b.menor_preco") < F.col("a.menor_preco"))
            | (F.col("b.qtd") > F.col("a.qtd"))
        )
    )
    return a.join(F.broadcast(b), dominated, "left_anti").select(
        F.col("a.l_partkey").alias("l_partkey"),
        F.col("a.menor_preco").alias("menor_preco"),
        F.col("a.qtd").alias("qtd"),
    )
