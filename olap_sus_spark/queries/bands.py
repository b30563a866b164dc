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


# ---------------------------------------------------------------------------
# Binned range self-join — a fact-to-fact range join with NO equi key:
# for every order, how many OTHER orders priced within ±delta.  The naive
# plan is a theta join (BroadcastNestedLoopJoin → O(n²) comparisons, the
# shape that dies first at scale).  The scale-correct rewrite is BINNING:
# bucket every price into width-delta bins, replicate each probe row into
# its bin and both neighbors (|a−b| ≤ delta ⇒ bins differ by ≤ 1), hash
# equi-join on the bin id, then apply the exact range residual — work is
# O(n × bin occupancy) and the join is an ordinary shuffled hash join.
# Both engines evaluate the IDENTICAL boundary arithmetic
# (b BETWEEN a−delta AND a+delta — never abs(a−b), whose rounding can
# disagree with the BETWEEN form at float boundaries).
# ---------------------------------------------------------------------------
_PROX_DELTA = 64.0

_PROX_ORACLE = f"""
WITH c AS (
    SELECT a.o_orderkey AS k, COUNT(*) AS n
    FROM orders a
    JOIN orders b
      ON b.o_orderkey <> a.o_orderkey
     AND b.o_totalprice BETWEEN a.o_totalprice - {_PROX_DELTA}
                            AND a.o_totalprice + {_PROX_DELTA}
    GROUP BY a.o_orderkey
)
SELECT o.o_orderkey, COALESCE(c.n, 0) AS n_similares
FROM orders o LEFT JOIN c ON c.k = o.o_orderkey
"""


@register("range_join_binned", oracle=_PROX_ORACLE)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    delta = F.lit(_PROX_DELTA)
    binned = orders.withColumn("_bin", F.floor(F.col("o_totalprice") / delta))
    probe = binned.select(
        F.col("o_orderkey").alias("_k"),
        F.col("o_totalprice").alias("_p"),
        F.explode(
            F.array(F.col("_bin") - 1, F.col("_bin"), F.col("_bin") + 1)
        ).alias("_bin"),
    )
    build = binned.select(
        F.col("o_orderkey").alias("_bk"), F.col("o_totalprice").alias("_bp"), "_bin"
    )
    pairs = probe.join(build, "_bin").filter(
        (F.col("_bk") != F.col("_k"))
        & (F.col("_bp") >= F.col("_p") - delta)
        & (F.col("_bp") <= F.col("_p") + delta)
    )
    counts = pairs.groupBy(F.col("_k").alias("o_orderkey")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return orders.join(counts, "o_orderkey", "left").select(
        "o_orderkey", F.coalesce(F.col("_n"), F.lit(0)).alias("n_similares")
    )
