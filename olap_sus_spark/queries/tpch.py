"""Classic multi-join TPC-H decision-support shapes (Q3/Q5/Q10 analogues)
over the driver tables — the canonical join-ordering / AQE workout the
per-operator batteries don't exercise: 3-to-6-way star-and-chain joins with
selective filters on BOTH fact and dimension sides.

The reference's own OLAP set (SURVEY.md §2.11) is covered by queries/olap.py;
this module adds the standard decision-support shapes every warehouse user
expects to run, with the engine's exact-money discipline: revenue =
extendedprice·(1−discount) is computed in DECIMAL (products of decimals are
exact, decimal SUM is order-independent) and only the OUTPUT view casts to
double — double SUMs would be shuffle-order-sensitive and break cross-engine
bit-parity (queries/_util.py rules).

Plan expectations (asserted in tests/test_plan_shapes.py): true dimension
sides broadcast, anything that scales with the facts (customer, supplier,
orders) is unhinted so AQE stays free to pick SMJ at warehouse scale,
filters push to the parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.registry import register

_MONEY = "decimal(15,2)"
_DISC = "decimal(15,2)"

# revenue term: DECIMAL product — exact, engine-portable, order-independent
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(15,2))"
    " * (CAST(1 AS DECIMAL(15,2)) - CAST(l_discount AS DECIMAL(15,2)))"
)


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast(_MONEY) * (
        F.lit(1).cast(_DISC) - F.col("l_discount").cast(_DISC)
    )


_Q3_DATE = "1998-06-15"

_Q3_ORACLE = f"""
SELECT l.l_orderkey AS pedido,
       o.o_orderdate AS data_pedido,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS receita
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
  AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY receita DESC, pedido
LIMIT 10
"""


@register("tpch_q3_shipping_priority", oracle=_Q3_ORACLE)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: unshipped-revenue top-10 for one market segment.  Both
    date predicates and the segment filter push to the scans; join
    strategies are left to AQE (customer scales with the warehouse, so
    nothing fact-sized carries a broadcast hint); one grain shuffle;
    deterministic (revenue, orderkey) tie-break on the top-10."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp"))
        .select(
            F.col("l_orderkey").alias("o_orderkey"), _rev().alias("_rev")
        )
    )
    return (
        # customer scales with the facts — no broadcast hint; AQE picks the
        # strategy (broadcast while the filtered side fits, SMJ beyond)
        li.join(orders.join(cust, "o_custkey"), "o_orderkey")
        .groupBy(
            F.col("o_orderkey").alias("pedido"),
            F.col("o_orderdate").alias("data_pedido"),
        )
        .agg(F.sum("_rev").cast("double").alias("receita"))
        .orderBy(F.col("receita").desc(), F.col("pedido"))
        .limit(10)
    )


_Q5_Y0, _Q5_Y1 = "1996-01-01", "1997-01-01"

_Q5_ORACLE = f"""
SELECT n.n_name AS nacao,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS receita
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '{_Q5_Y0}'
  AND o.o_orderdate < TIMESTAMP '{_Q5_Y1}'
GROUP BY n.n_name
"""


@register("tpch_q5_local_supplier_volume", oracle=_Q5_ORACLE)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-way join, revenue by nation where supplier and customer
    share the nation (the join-graph cycle that makes Q5 the classic join-
    order test).  Only the region-filtered 25-row nation list carries a
    broadcast hint; supplier/customer scale with the warehouse and are left
    to AQE.  The one unavoidable big shuffle is lineitem ⋈ orders."""
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("r_regionkey").alias("n_regionkey"))
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name", "n_regionkey"
    )
    nations = nation.join(F.broadcast(region), "n_regionkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("s_nationkey"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(_Q5_Y0).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_Q5_Y1).cast("timestamp"))
        )
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev().alias("_rev")
    )
    return (
        li.join(orders, "l_orderkey")
        .join(supp.join(F.broadcast(nations), "s_nationkey"), "l_suppkey")
        .join(
            cust, ["o_custkey", "s_nationkey"]
        )  # customer in the SAME nation as the supplier (the Q5 cycle).
        # supplier/customer scale with the warehouse — no broadcast hints;
        # only the region-filtered nation list is pinned (25 rows)
        .groupBy(F.col("n_name").alias("nacao"))
        .agg(F.sum("_rev").cast("double").alias("receita"))
    )


_Q10_Y0, _Q10_Y1 = "1997-01-01", "1997-07-01"

_Q10_ORACLE = f"""
SELECT c.c_custkey AS cliente,
       c.c_name AS nome,
       n.n_name AS nacao,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS receita_perdida
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{_Q10_Y0}'
  AND o.o_orderdate < TIMESTAMP '{_Q10_Y1}'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY receita_perdida DESC, cliente
LIMIT 20
"""


@register("tpch_q10_returned_items", oracle=_Q10_ORACLE)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by returned-item revenue in a quarter-ish
    window — returnflag filter on the fact scan, date filter on orders,
    nation broadcast (customer left to AQE), deterministic tie-break."""
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(_Q10_Y0).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_Q10_Y1).cast("timestamp"))
        )
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", _rev().alias("_rev"))
    )
    return (
        li.join(orders, "l_orderkey")
        .join(cust.join(F.broadcast(nation), "c_nationkey"), "o_custkey")
        .groupBy(
            F.col("o_custkey").alias("cliente"),
            F.col("c_name").alias("nome"),
            F.col("n_name").alias("nacao"),
        )
        .agg(F.sum("_rev").cast("double").alias("receita_perdida"))
        .orderBy(F.col("receita_perdida").desc(), F.col("cliente"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Correlated EXISTS / NOT EXISTS shapes (Q4 / Q21 analogues).
#
# The synthetic lineitem has no commit/receipt dates, so "late" is a pure-
# lineitem shipdate-cutoff predicate — which preserves exactly what makes
# these queries hard: subqueries correlated on the OUTER row's order key
# (and, for Q21, anti-correlated on its supplier key).  The oracles run the
# literal EXISTS / NOT EXISTS SQL; the Spark side deliberately does NOT —
# a correlated non-equi EXISTS is where de-correlation most easily degrades
# to a nested-loop/cartesian plan, so the engine uses the distributed
# rewrites that shuffle on the correlation key only:
#   EXISTS (same order)            → left-semi equi-join on l_orderkey
#   EXISTS (other supplier)        → per-order COUNT(DISTINCT supplier) > 1
#   NOT EXISTS (other late suppl.) → per-order late-supplier count == 1
# (plan pin in tests/test_plan_shapes.py: no BroadcastNestedLoopJoin, no
# CartesianProduct anywhere in either plan).

_LATE = "1999-01-01"  # a line shipped past this is "late" (waiting)


_Q4_Y0, _Q4_Y1 = "1997-01-01", "1997-04-01"

_Q4_ORACLE = f"""
SELECT o.o_orderpriority AS prioridade,
       COUNT(*) AS n_pedidos
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_Y0}'
  AND o.o_orderdate < TIMESTAMP '{_Q4_Y1}'
  AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > TIMESTAMP '{_LATE}'
  )
GROUP BY o.o_orderpriority
"""


@register("tpch_q4_order_priority", oracle=_Q4_ORACLE)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order counts by priority for orders with ≥1 late line.
    The correlated EXISTS is a LEFT SEMI equi-join on the correlation key
    (l_orderkey) — one shuffle, no de-correlation risk, and the late
    predicate pushes to the lineitem scan so the semi-join's build side is
    only the late lines."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(_Q4_Y0).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_Q4_Y1).cast("timestamp"))
        )
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    late = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit(_LATE).cast("timestamp"))
        .select("l_orderkey")
    )
    return (
        orders.join(late, "l_orderkey", "left_semi")
        .groupBy(F.col("o_orderpriority").alias("prioridade"))
        .agg(F.count(F.lit(1)).alias("n_pedidos"))
    )


_Q21_ORACLE = f"""
SELECT n.n_name AS nacao,
       s.s_name AS fornecedor,
       COUNT(*) AS numwait
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > TIMESTAMP '{_LATE}'
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > TIMESTAMP '{_LATE}'
  )
GROUP BY n.n_name, s.s_name
ORDER BY numwait DESC, nacao, fornecedor
LIMIT 100
"""


@register("tpch_q21_waiting_shipments", oracle=_Q21_ORACLE)
def tpch_q21_waiting_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE late shipper on a completed
    multi-supplier order — the multi-correlation EXISTS chain (one EXISTS,
    one NOT EXISTS, both correlated on the outer order AND anti-correlated
    on the outer supplier).

    The scale-correct rewrite: both subqueries collapse into ONE per-order
    aggregate over lineitem — n_supp = COUNT(DISTINCT suppkey) and
    n_late_supp = COUNT(DISTINCT suppkey among late lines).  For a late
    outer line l1: "another supplier exists" ⇔ n_supp > 1, and "no OTHER
    supplier was late" ⇔ n_late_supp = 1 (l1's own supplier is late, so it
    is THE late one).  Everything is equi-join/aggregate on l_orderkey —
    one grain shuffle — where the naive de-correlation plans a per-row
    nested-loop over lineitem twice.  Supplier scales with the warehouse
    (left to AQE); only the 25-row nation dim is broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.lit(_LATE).cast("timestamp")).alias("_late"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias(
            "_n_late_supp"
        ),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    return (
        li.filter(F.col("_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("_n_supp") > 1) & (F.col("_n_late_supp") == 1))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp.join(F.broadcast(nation), "s_nationkey"), "l_suppkey")
        .groupBy(F.col("n_name").alias("nacao"), F.col("s_name").alias("fornecedor"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("nacao"), F.col("fornecedor"))
        .limit(100)
    )
