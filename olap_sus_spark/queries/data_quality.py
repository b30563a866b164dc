"""Data-quality operators: table profiling, constraint validation, numeric
histograms, Pareto/ABC classification.

A 100 TB ingest pipeline runs these before anything else touches the data;
the reference has no validation at all (SURVEY.md §5 — "no tests, no
checks", its ETL silently fillna's bad rows).  All four are single-pass
aggregate shapes: profiling and histograms collapse map-side to a handful
of rows, constraint checks are one anti-join / one groupBy each, and the
Pareto pass adds one bounded window over pre-aggregated groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators.prefix import running_total
from olap_sus_spark.queries._util import dec
from olap_sus_spark.registry import register

# --------------------------------------------------------------------------
# Column profile — the "describe" every pipeline runs first: per column,
# null count, distinct count, and min/max rendered as strings (one schema
# for heterogeneous columns).  One aggregation pass over the table; output
# height = number of profiled columns.
# --------------------------------------------------------------------------
_PROFILE_ORACLE = """
WITH a AS (
    SELECT
        COUNT(*) AS n_linhas,
        COUNT(o_custkey) AS nn_custkey,
        COUNT(DISTINCT o_custkey) AS nd_custkey,
        CAST(MIN(o_custkey) AS VARCHAR) AS min_custkey,
        CAST(MAX(o_custkey) AS VARCHAR) AS max_custkey,
        COUNT(o_orderstatus) AS nn_status,
        COUNT(DISTINCT o_orderstatus) AS nd_status,
        MIN(o_orderstatus) AS min_status,
        MAX(o_orderstatus) AS max_status,
        COUNT(o_orderpriority) AS nn_prio,
        COUNT(DISTINCT o_orderpriority) AS nd_prio,
        MIN(o_orderpriority) AS min_prio,
        MAX(o_orderpriority) AS max_prio
    FROM orders
)
SELECT coluna, n_linhas, nao_nulos, distintos, minimo, maximo FROM (
    SELECT 'o_custkey' AS coluna, n_linhas, nn_custkey AS nao_nulos,
           nd_custkey AS distintos, min_custkey AS minimo, max_custkey AS maximo
    FROM a
    UNION ALL
    SELECT 'o_orderstatus', n_linhas, nn_status, nd_status, min_status, max_status
    FROM a
    UNION ALL
    SELECT 'o_orderpriority', n_linhas, nn_prio, nd_prio, min_prio, max_prio
    FROM a
)
"""


@register("profile_columns", oracle=_PROFILE_ORACLE)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = [F.count(F.lit(1)).alias("n_linhas")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            # min/max in the column's own type, cast to string AFTER —
            # lexicographic min of stringified ints would disagree.
            F.min(F.col(c)).cast("string").alias(f"min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"max_{c}"),
        ]
    wide = orders.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("coluna"),
                F.col("n_linhas").alias("n_linhas"),
                F.col(f"nn_{c}").alias("nao_nulos"),
                F.col(f"nd_{c}").alias("distintos"),
                F.col(f"min_{c}").alias("minimo"),
                F.col(f"max_{c}").alias("maximo"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


# --------------------------------------------------------------------------
# Constraint validation — declarative expectations evaluated distributedly:
#   pk_unique:     duplicate-key groups in lineitem's declared PK
#   fk_orphans:    lineitem rows whose l_orderkey misses orders (anti-join;
#                  at scale a shuffle-hash anti on the fact, broadcast when
#                  the parent fits)
#   range_valid:   quantity outside (0, 100]
#   enum_valid:    returnflag outside its domain
# Output: one row per rule with the violation count (0 = constraint holds),
# so the operator doubles as a data-quality gate in a pipeline.
# --------------------------------------------------------------------------
_CONSTRAINT_ORACLE = """
SELECT regra, violacoes FROM (
    SELECT 'pk_unique' AS regra,
           (SELECT COUNT(*) FROM (
                SELECT l_orderkey FROM lineitem
                GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
            )) AS violacoes
    UNION ALL
    SELECT 'fk_orphans',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'range_valid',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_quantity <= 0 OR l_quantity > 100)
    UNION ALL
    SELECT 'enum_valid',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_returnflag NOT IN ('A', 'N', 'R'))
)
"""


@register("constraint_checks", oracle=_CONSTRAINT_ORACLE)
def constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    pk_dups = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("violacoes"))
        .select(F.lit("pk_unique").alias("regra"), "violacoes")
    )
    orphans = (
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violacoes"))
        .select(F.lit("fk_orphans").alias("regra"), "violacoes")
    )
    bad_range = (
        li.filter((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 100))
        .agg(F.count(F.lit(1)).alias("violacoes"))
        .select(F.lit("range_valid").alias("regra"), "violacoes")
    )
    bad_enum = (
        li.filter(~F.col("l_returnflag").isin("A", "N", "R"))
        .agg(F.count(F.lit(1)).alias("violacoes"))
        .select(F.lit("enum_valid").alias("regra"), "violacoes")
    )
    return pk_dups.unionByName(orphans).unionByName(bad_range).unionByName(bad_enum)


# --------------------------------------------------------------------------
# Fixed-width numeric histogram over a money measure.  Bucket boundaries are
# pure double arithmetic (x / width, floor) — bit-identical in both engines;
# bucket counts collapse map-side so the shuffle moves |buckets| rows.
# --------------------------------------------------------------------------
_HISTOGRAM_ORACLE = """
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INT) AS balde,
       CAST(FLOOR(o_totalprice / 50000.0) AS INT) * 50000.0 AS limite_inferior,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2
"""


@register("histogram_order_value", oracle=_HISTOGRAM_ORACLE)
def histogram_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    balde = F.floor(F.col("o_totalprice") / 50000.0).cast("int")
    return (
        orders.select(balde.alias("balde"))
        .groupBy("balde")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "balde",
            (F.col("balde") * 50000.0).alias("limite_inferior"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# Pareto / ABC classification — parts classed by cumulative revenue share
# (A ≤ 60% < B ≤ 85% < C).  Revenue per part aggregates distributedly
# (decimal-exact); the cumulative sum over the part grain is the two-phase
# distributed prefix sum (operators/prefix.py) — part grain is data-sized
# (~20M rows at sf100), so a plain ORDER-BY window would funnel it through
# one task.  The running share is an IEEE-double division of two exact
# decimals, so class boundaries decide identically in both engines.  Rank
# ties broken by partkey → fully deterministic cumulative order.
# --------------------------------------------------------------------------
_PARETO_ORACLE = """
WITH rev AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS receita_dec
    FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(receita_dec) AS total_dec FROM rev),
acum AS (
    SELECT r.l_partkey,
           r.receita_dec,
           CAST(SUM(r.receita_dec) OVER (
                ORDER BY r.receita_dec DESC, r.l_partkey
                ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST(t.total_dec AS DOUBLE) AS parcela_acum
    FROM rev r CROSS JOIN tot t
)
SELECT l_partkey,
       CAST(receita_dec AS DOUBLE) AS receita,
       parcela_acum,
       CASE WHEN parcela_acum <= 0.60 THEN 'A'
            WHEN parcela_acum <= 0.85 THEN 'B'
            ELSE 'C' END AS classe
FROM acum
"""


@register("pareto_abc_parts", oracle=_PARETO_ORACLE)
def pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).alias("receita_dec")
    )
    cum = running_total(
        rev,
        [F.col("receita_dec").desc(), F.col("l_partkey")],
        "receita_dec",
        "_cum_dec",
    )
    # grand total folded off the CHECKPOINTED prefix output (same exact
    # decimal sum) — a separate rev.agg() branch would scan lineitem twice
    tot = cum.agg(F.sum("receita_dec").alias("total_dec"))
    acum = cum.join(F.broadcast(tot)).withColumn(
        "parcela_acum",
        F.col("_cum_dec").cast("double") / F.col("total_dec").cast("double"),
    )
    return acum.select(
        "l_partkey",
        F.col("receita_dec").cast("double").alias("receita"),
        "parcela_acum",
        F.when(F.col("parcela_acum") <= 0.60, "A")
        .when(F.col("parcela_acum") <= 0.85, "B")
        .otherwise("C")
        .alias("classe"),
    )


# --------------------------------------------------------------------------
# Exact statistical moments — population variance and Pearson correlation
# computed from integer POWER SUMS (Σx, Σx², Σxy … all exact BIGINTs),
# not from the engines' native var/corr aggregates (those use streaming
# Welford updates whose rounding depends on accumulation order — not
# reproducible across engines or even partitionings).  The closed-form
# ratios and sqrt are IEEE operations on exactly-representable integers,
# so results are bit-identical AND partitioning-independent — the property
# a distributed profiler actually needs.  One aggregation pass.
# --------------------------------------------------------------------------
_MOMENTS_ORACLE = """
WITH s AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
           CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                AS BIGINT) AS sxx,
           CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sy,
           CAST(SUM(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT))
                AS BIGINT) AS syy,
           CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT))
                AS BIGINT) AS sxy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS media_qtd,
       CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * n AS DOUBLE)
       AS variancia_pop,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS correlacao
FROM s
"""


@register("exact_moments_battery", oracle=_MOMENTS_ORACLE)
def exact_moments_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.col("l_linenumber").cast("bigint")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        "n",
        (sx.cast("double") / n.cast("double")).alias("media_qtd"),
        ((n * sxx - sx * sx).cast("double") / (n * n).cast("double")).alias(
            "variancia_pop"
        ),
        (
            (n * sxy - sx * sy).cast("double")
            / (
                F.sqrt((n * sxx - sx * sx).cast("double"))
                * F.sqrt((n * syy - sy * sy).cast("double"))
            )
        ).alias("correlacao"),
    )


# --------------------------------------------------------------------------
# IQR outlier detection — orders whose value falls outside
# [Q1 − 1.5·IQR, Q3 + 1.5·IQR] of their year.  Money is floored to CENT
# INTEGERS first (FLOOR(x·100): double multiply + floor are IEEE-identical
# in both engines, unlike double→int CAST which truncates in Spark but
# rounds in DuckDB); interpolated quartiles over integers at quarter
# fractions are exact (same argument as quantile_stats), so the fence
# arithmetic and every boundary comparison decide identically.  Plan: one
# year-grain percentile aggregation broadcast back onto the scan.
# --------------------------------------------------------------------------
_OUTLIER_ORACLE = """
WITH cents AS (
    SELECT o_orderkey, EXTRACT(YEAR FROM o_orderdate)::INT AS ano,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS centavos
    FROM orders
),
q AS (
    SELECT ano,
           quantile_cont(centavos, 0.25) AS q1,
           quantile_cont(centavos, 0.75) AS q3
    FROM cents GROUP BY ano
)
SELECT c.o_orderkey, c.ano, c.centavos,
       CASE WHEN c.centavos < q.q1 - 1.5 * (q.q3 - q.q1) THEN 'baixo'
            ELSE 'alto' END AS lado
FROM cents c
JOIN q ON q.ano = c.ano
WHERE c.centavos < q.q1 - 1.5 * (q.q3 - q.q1)
   OR c.centavos > q.q3 + 1.5 * (q.q3 - q.q1)
"""


@register("outlier_orders_iqr", oracle=_OUTLIER_ORACLE)
def outlier_orders_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("ano"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("centavos"),
    )
    q = cents.groupBy("ano").agg(
        F.expr("percentile(centavos, 0.25)").alias("q1"),
        F.expr("percentile(centavos, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    joined = cents.join(F.broadcast(q), "ano")
    low = F.col("centavos") < F.col("q1") - 1.5 * iqr
    high = F.col("centavos") > F.col("q3") + 1.5 * iqr
    return joined.filter(low | high).select(
        "o_orderkey",
        "ano",
        "centavos",
        F.when(low, "baixo").otherwise("alto").alias("lado"),
    )


# --------------------------------------------------------------------------
# Distribution-drift detection (chi-square statistic, log-free).  The
# monitoring primitive run between a baseline window and the current one
# (training-data pipelines gate ingest batches on it; PSI is the same shape
# with a log weight).  Buckets reuse the fixed-width histogram binning; the
# per-bucket chi-square contribution (c2 − e)²/e with e = T2·c1/T1 is
# algebraically cleared of fractions to
#
#     (c2·T1 − c1·T2)² / (T1·T2 · c1)
#
# computed as exact-BIGINT differences/products cast to DOUBLE with a FIXED
# operation order (one multiply for the square, one for the denominator,
# one division) — bit-identical in both engines, no order-dependent float
# sums.  Buckets absent from the baseline get a NULL contribution (flagged
# novel mass, the honest answer — the statistic is undefined there).
# --------------------------------------------------------------------------
_DRIFT_Y1, _DRIFT_Y2 = 1997, 1998

_CHISQ_DRIFT_ORACLE = f"""
WITH base AS (
    SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INT) AS balde,
           CAST(COUNT(*) AS BIGINT) AS c1
    FROM orders WHERE EXTRACT(year FROM o_orderdate) = {_DRIFT_Y1}
    GROUP BY 1
),
cur AS (
    SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INT) AS balde,
           CAST(COUNT(*) AS BIGINT) AS c2
    FROM orders WHERE EXTRACT(year FROM o_orderdate) = {_DRIFT_Y2}
    GROUP BY 1
),
tot AS (
    SELECT (SELECT CAST(SUM(c1) AS BIGINT) FROM base) AS t1,
           (SELECT CAST(SUM(c2) AS BIGINT) FROM cur) AS t2
),
joined AS (
    SELECT COALESCE(base.balde, cur.balde) AS balde,
           COALESCE(c1, 0) AS c_base,
           COALESCE(c2, 0) AS c_atual
    FROM base FULL OUTER JOIN cur ON base.balde = cur.balde
)
SELECT balde, c_base, c_atual,
       CASE WHEN c_base > 0 THEN
           (CAST(c_atual * t1 - c_base * t2 AS DOUBLE)
            * CAST(c_atual * t1 - c_base * t2 AS DOUBLE))
           / (CAST(t1 * t2 AS DOUBLE) * CAST(c_base AS DOUBLE))
       END AS contribuicao
FROM joined CROSS JOIN tot
"""


@register("chisq_drift_orders", oracle=_CHISQ_DRIFT_ORACLE)
def chisq_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value distribution drift {y1} → {y2}: per-bucket chi-square
    contributions from exact integer counts.  Two pruned scans + one
    tiny full-outer join on the 10-bucket grain; totals broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    balde = F.floor(F.col("o_totalprice") / 50000.0).cast("int").alias("balde")

    def year_counts(y: int, out: str) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == y)
            .select(balde)
            .groupBy("balde")
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    base = year_counts(_DRIFT_Y1, "c1")
    cur = year_counts(_DRIFT_Y2, "c2")
    tot = base.agg(F.sum("c1").cast("bigint").alias("t1")).crossJoin(
        cur.agg(F.sum("c2").cast("bigint").alias("t2"))
    )
    joined = (
        base.join(cur, "balde", "full_outer")
        .select(
            "balde",
            F.coalesce("c1", F.lit(0)).cast("bigint").alias("c_base"),
            F.coalesce("c2", F.lit(0)).cast("bigint").alias("c_atual"),
        )
        .join(F.broadcast(tot))
    )
    d = F.col("c_atual") * F.col("t1") - F.col("c_base") * F.col("t2")
    contrib = (d.cast("double") * d.cast("double")) / (
        (F.col("t1") * F.col("t2")).cast("double") * F.col("c_base").cast("double")
    )
    return joined.select(
        "balde", "c_base", "c_atual",
        F.when(F.col("c_base") > 0, contrib).alias("contribuicao"),
    )


# --------------------------------------------------------------------------
# Benford first-digit profile — the anomaly/fraud screen over a money
# measure: natural multiplicative data follows log10(1+1/d); fabricated or
# truncated data doesn't.  Everything emitted is engine-portable — the
# leading digit comes from the INTEGER STRING of the cents value (double
# formatting is not portable; integer rendering is), and the share is one
# IEEE division of two exact BIGINTs (deterministic in both engines).  The
# expected-Benford column is deliberately omitted: log10 goes through each
# engine's libm and is NOT guaranteed bit-identical — compare downstream.
# --------------------------------------------------------------------------
_BENFORD_ORACLE = """
WITH d AS (
    SELECT substr(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
           AS digito
    FROM orders WHERE o_totalprice > 0
)
SELECT digito, CAST(COUNT(*) AS BIGINT) AS n,
       COUNT(*) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share
FROM d GROUP BY digito
"""


@register("benford_first_digit", oracle=_BENFORD_ORACLE)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed first-digit distribution of order values (count + share
    per leading digit 1-9).  One scan, a 9-row aggregate, and a 9-row
    window for the shares — the profiling shape runs at any fact volume."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    d = orders.select(F.substring(cents.cast("string"), 1, 1).alias("digito"))
    g = d.groupBy("digito").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    return g.select(
        "digito",
        "n",
        (F.col("n") / F.sum("n").over(w).cast("double")).alias("share"),
    )
