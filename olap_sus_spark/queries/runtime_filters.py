"""Runtime-filter queries: bloom-pruned star joins.

The reference's star joins rely on the engine's join alone
(/root/reference/dags/queries-scripts.py); at 100 TB a selective
dim-filtered fact join wants scan-side pruning — the probe rows that
can't match should die at the parquet reader, not travel through an
exchange.  ``operators/bloom.py`` provides the portable bitmap; the
query here is the canonical consumer (brand-sliced revenue), and its
oracle is the PLAIN semi-join — the bloom must be semantically
invisible, which is exactly what the value-hash gate proves."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators.bloom import bloom_semi_join
from olap_sus_spark.queries.tpch import _REV_SQL, _rev
from olap_sus_spark.registry import register

_BRAND = "Brand#1"

_BLOOM_ORACLE = f"""
SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ano,
       CAST(COUNT(*) AS BIGINT) AS n_linhas,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS receita
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = '{_BRAND}')
GROUP BY ano
"""


@register("bloom_pruned_brand_revenue", oracle=_BLOOM_ORACLE)
def bloom_pruned_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue of one part brand's lineitems, with the fact scan
    bloom-pruned before the (broadcast) semi-join: non-matching rows are
    dropped by a narrow bitmap expression at the scan — no exchange sees
    them — and the exact join removes the <1% false positives, so the
    result is bit-identical to the plain semi-join the oracle runs.
    Revenue follows the exact-money discipline (decimal product, one
    final cast)."""
    keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _BRAND)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"),
        F.year("l_shipdate").alias("ano"),
        _rev().alias("_rev"),
    )
    hits = bloom_semi_join(li, "p_partkey", keys, "p_partkey")
    return hits.groupBy("ano").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_linhas"),
        F.sum("_rev").cast("double").alias("receita"),
    )
