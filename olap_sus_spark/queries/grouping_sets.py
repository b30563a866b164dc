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


# Sketch internals aren't bit-portable across engines, so the verifiable
# surface is (a) exact twins of each sketch (computable in DuckDB too) and
# (b) within-bound booleans asserting |approx − exact| / exact ≤ bound.
# Both are deterministic, so the row gets a full value-hash oracle.  The
# exact quantile twin is the DISCRETE percentile — the value at 1-based rank
# floor((n−1)·p)+1 of the sorted column — an actual stored double, immune to
# the cross-engine interpolation-order hazard of continuous quantiles.
_HLL_RSD = 0.02
_HLL_BOUND = 0.06  # 3·rsd — ~3σ of the HLL estimator's relative error
# rank error ≤ n/accuracy: 2500 gives 0.04% rank error against a 2% value
# bound — 50× headroom.  (10000 added ~10 s/run of GK-summary merge cost at
# sf0.1 for precision the verification surface never used.)
_PCTL_ACC = 2500
_PCTL_BOUND = 0.02

_APPROX_ORACLE = f"""
WITH s AS (
    SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS clientes_exatos
    FROM orders
),
r AS (
    SELECT o_totalprice AS v, ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn
    FROM orders
)
SELECT
    s.clientes_exatos,
    MAX(CASE WHEN r.rn = CAST(floor((s.n - 1) * 0.5) AS BIGINT) + 1
             THEN r.v END) AS p50_exato,
    MAX(CASE WHEN r.rn = CAST(floor((s.n - 1) * 0.9) AS BIGINT) + 1
             THEN r.v END) AS p90_exato,
    TRUE AS hll_within_bound,
    TRUE AS p50_within_bound,
    TRUE AS p90_within_bound
FROM r CROSS JOIN s
WHERE r.rn IN (CAST(floor((s.n - 1) * 0.5) AS BIGINT) + 1,
               CAST(floor((s.n - 1) * 0.9) AS BIGINT) + 1)
GROUP BY s.clientes_exatos
"""


@register("approx_aggregates", oracle=_APPROX_ORACLE)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — HyperLogLog distinct count and approximate
    quantiles — with a deterministic verification surface.

    Output = exact twins (COUNT DISTINCT, discrete p50/p90 — identical in
    any engine) plus ``*_within_bound`` booleans comparing the Spark sketch
    against its exact twin; the oracle asserts the booleans are TRUE.  The
    bound for HLL is 3·rsd; tests/test_text_unit.py pins tighter accuracy.

    Scale note: the SKETCHES are the production surface (one streaming pass,
    constant memory — at 100 TB only they survive); the exact twins exist to
    make the sketches verifiable.  The exact-rank pass is the distributed
    prefix COUNT (operators/prefix.py) — the k-th order statistic is
    well-defined whatever order ties take, so the two-phase rank picks the
    same p50/p90 values a single-partition row_number would.
    """
    from olap_sus_spark.operators.prefix import running_total

    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_custkey").alias("clientes_exatos"),
        F.approx_count_distinct("o_custkey", rsd=_HLL_RSD).alias("_hll"),
        F.percentile_approx("o_totalprice", F.lit(0.5), _PCTL_ACC).alias("_ap50"),
        F.percentile_approx("o_totalprice", F.lit(0.9), _PCTL_ACC).alias("_ap90"),
    )
    ranked = running_total(
        orders.select(
            F.col("o_totalprice").alias("v"), F.col("o_orderkey").alias("_tb")
        ),
        [F.col("v"), F.col("_tb")],
        F.lit(1).cast("long"),
        "rn",
    ).select("v", "rn")

    def k(p: float):
        return F.floor((F.col("n") - 1) * F.lit(p)).cast("long") + 1

    picked = (
        ranked.crossJoin(F.broadcast(stats))
        .filter((F.col("rn") == k(0.5)) | (F.col("rn") == k(0.9)))
        .agg(
            F.max("clientes_exatos").alias("clientes_exatos"),
            F.max(F.when(F.col("rn") == k(0.5), F.col("v"))).alias("p50_exato"),
            F.max(F.when(F.col("rn") == k(0.9), F.col("v"))).alias("p90_exato"),
            F.max("_hll").alias("_hll"),
            F.max("_ap50").alias("_ap50"),
            F.max("_ap90").alias("_ap90"),
        )
    )
    rel_err = lambda approx, exact: F.abs(approx - exact) / exact  # noqa: E731
    return picked.select(
        "clientes_exatos",
        "p50_exato",
        "p90_exato",
        (rel_err(F.col("_hll"), F.col("clientes_exatos")) <= _HLL_BOUND).alias(
            "hll_within_bound"
        ),
        (rel_err(F.col("_ap50"), F.col("p50_exato")) <= _PCTL_BOUND).alias(
            "p50_within_bound"
        ),
        (rel_err(F.col("_ap90"), F.col("p90_exato")) <= _PCTL_BOUND).alias(
            "p90_within_bound"
        ),
    )
