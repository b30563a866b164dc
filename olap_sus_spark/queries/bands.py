"""Band-join parity queries (SURVEY.md §2.3 J4/J5).

The reference joins facts to banded dimensions (dimDemografia age bands,
dimInfoNascimento weight bands) with equality attributes plus a range
predicate and NULL-matching arms
(/root/reference/dags/spark_script_sinasc.py:218-250).  Two registered
paths over the same band table:

- ``band_join_theta`` — the faithful theta join (broadcast nested loop).
  Correct at any dim size; acceptable only because band dims are tiny.
- ``band_label_equi`` — the scale path from SURVEY.md §7: precompute the
  band label with a searched CASE, then broadcast hash equi-join.  Stays
  inside whole-stage codegen and is the plan to run at 100 TB.

Both must produce identical results; each is hash-checked against the same
DuckDB range-join oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators.joins import band_join, band_label
from olap_sus_spark.queries._util import dec
from olap_sus_spark.registry import register

# Quantity bands play the role of the reference's age/weight bands: a tiny
# banded dim with an open-ended top band (hi IS NULL ≙ idade_maxima IS NULL,
# scripts/init.sql:181-182).
QTY_BANDS: list[tuple[str, int | None, int | None]] = [
    ("01-09", 1, 9),
    ("10-24", 10, 24),
    ("25-39", 25, 39),
    ("40+", 40, None),
]

_BAND_ORACLE = """
WITH bands(banda, lo, hi) AS (
    VALUES ('01-09', 1, 9), ('10-24', 10, 24), ('25-39', 25, 39), ('40+', 40, NULL)
)
SELECT
    banda,
    COUNT(*) AS n_linhas,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem
JOIN bands ON l_quantity >= lo AND (hi IS NULL OR l_quantity <= hi)
GROUP BY banda
"""


def _band_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(label, lo, hi) for label, lo, hi in QTY_BANDS],
        "banda string, lo int, hi int",
    )


def _summarize(joined: DataFrame) -> DataFrame:
    return joined.groupBy("banda").agg(
        F.count(F.lit(1)).alias("n_linhas"),
        F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
    )


@register("band_join_theta", oracle=_BAND_ORACLE)
def band_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful J4/J5 band join: range predicate against a broadcast band dim."""
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity")
    joined = band_join(
        li,
        _band_dim(spark),
        value_col="l_quantity",
        lo_col="lo",
        hi_col="hi",
        how="inner",
        null_arm=False,  # l_quantity is non-null; NULL arms unit-tested separately
    )
    return _summarize(joined)


@register("band_label_equi", oracle=_BAND_ORACLE)
def band_label_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path rewrite: CASE band label then broadcast hash equi-join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity")
    labeled = li.withColumn("banda", band_label(F.col("l_quantity"), QTY_BANDS))
    # Equi-join back to the band dim (in the warehouse this recovers the
    # surrogate key; here the label itself is the key).
    joined = labeled.join(
        F.broadcast(_band_dim(spark).select("banda")), "banda", "inner"
    )
    return _summarize(joined)
