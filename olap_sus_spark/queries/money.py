"""Money-measure fact roll-up: the synthetic, oracle'd twin of the
DECIMAL(15,2) ``factInternacoes`` pipeline (reference scripts/init.sql:252-262
declares ``valor NUMERIC(15,2)``; operators/facts.py:build_fact_internacoes
implements it, verified by the golden SIH e2e tests).

The warehouse pipeline runs over staged SIH fixtures, so it can't be driven
by the driver's parquet-table gate directly — this twin reproduces the exact
measure semantics (DECIMAL(15,2) money end-to-end, additive SUM + count +
derived double ratio) over the TPC-H-ish tables, giving the money path a
full value-hash oracle and a bench headline.

Exactness: ``valor_total`` stays DECIMAL through the aggregation (decimal
sums are exact and engine-portable); the OUTPUT is its double view — the
scale-2 → double conversion is exact (scaled magnitude < 2^53) and raw
Decimal cells would hash-mismatch in the driver's pandas canonicalizer
(tests/test_oracle_parity.py::test_no_canon_hostile_output_types).  The
derived ratio divides that double by the count in pure IEEE arithmetic, so
all three measures are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.registry import register

_MONEY = "decimal(15,2)"

_COST_ROLLUP_ORACLE = """
SELECT
    r.r_name AS regiao,
    n.n_name AS nacao,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS valor_total,
    COUNT(*) AS quantidade_itens,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS ticket_medio
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name, n.n_name
"""


@register("money_cost_rollup", oracle=_COST_ROLLUP_ORACLE)
def money_cost_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend + item volume + mean ticket by supplier geography — the
    factInternacoes cost roll-up shape (warehouse.py:
    rollup_cost_by_cause_chapter) over driver-gateable tables.

    Plan: one lineitem scan, supplier join left to the optimizer (a real
    deployment's supplier table outgrows broadcast; AQE picks broadcast
    while it fits), nation/region broadcast, single shuffle to the
    (região, nação) grain with map-side partial aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("n_regionkey"), "r_name"
    )
    valor = F.col("l_extendedprice").cast(_MONEY)
    cnt = F.count(F.lit(1))
    # The SUM stays at Spark's widened DECIMAL(25,2): narrowing it back to
    # DECIMAL(15,2) would make any group total past ~10^13 throw under ANSI
    # mode at warehouse scale (sf >~ 1100).  Only the final OUTPUT view is a
    # double; the per-row DECIMAL(15,2) cast pins the reference's column
    # semantics (scripts/init.sql:252-262 valor NUMERIC(15,2)).
    total = F.sum(valor)
    return (
        li.select("l_suppkey", "l_extendedprice")
        .join(supp, "l_suppkey")
        .join(F.broadcast(nation), "s_nationkey")
        .join(F.broadcast(region), "n_regionkey")
        .groupBy(F.col("r_name").alias("regiao"), F.col("n_name").alias("nacao"))
        .agg(
            total.cast("double").alias("valor_total"),
            cnt.alias("quantidade_itens"),
            (total.cast("double") / cnt.cast("double")).alias("ticket_medio"),
        )
    )
