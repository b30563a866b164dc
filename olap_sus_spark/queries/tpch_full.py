"""TPC-H completion battery: the remaining classic decision-support shapes
(Q2/Q6/Q7/Q9/Q12/Q13/Q14/Q15/Q16/Q17/Q18/Q19/Q20/Q22 analogues) over the
driver tables.

queries/tpch.py covers Q3/Q4/Q5/Q10/Q21 (Q1 = pricing_summary, Q8 =
market_share_by_year, Q11 = important_stock_parts); with this module all
22 classic TPC-H query *shapes* — correlated scalar-min subquery, pure
scan-predicate aggregate, cross-border two-role-playing-dimension volume,
profit arithmetic, conditional-count pivoting, left-join count
distribution, conditional-aggregate ratio, view + scalar-MAX equality,
NOT-IN supplier exclusion, correlated per-group AVG threshold,
IN-subquery-with-HAVING, disjunctive predicate pushdown, doubly-nested IN
with a two-key correlated aggregate, scalar-subquery + anti-join — have a
full value-hash oracle twin.
The synthetic tables lack partsupp/shipmode/phone, so each analogue maps
the shape onto the columns that exist (noted per query); what is preserved
is the *plan challenge*, not the TPC-H constants.

Same discipline as queries/tpch.py: exact DECIMAL money arithmetic with a
double cast only on output (queries/_util.py rules), dimension sides
broadcast only when they stay dimension-sized at 100 TB, everything that
scales with the facts left to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_sus_spark.catalog import load_table
from olap_sus_spark.registry import register

_MONEY = "decimal(15,2)"

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(15,2))"
    " * (CAST(1 AS DECIMAL(15,2)) - CAST(l_discount AS DECIMAL(15,2)))"
)


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast(_MONEY) * (
        F.lit(1).cast(_MONEY) - F.col("l_discount").cast(_MONEY)
    )


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier (correlated scalar-MIN subquery).  No partsupp
# table, so lineitem is the part↔supplier link and "cost" is the shipped
# l_extendedprice; the correlated `= (SELECT MIN ...)` structure — the Q2
# signature — is intact.

_Q2_REGION = "EUROPE"

_Q2_ORACLE = f"""
WITH elig AS (
    SELECT l.l_partkey, s.s_name, l.l_extendedprice
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE r.r_name = '{_Q2_REGION}' AND p.p_type = 'ECONOMY' AND p.p_size <= 10
)
SELECT DISTINCT e.l_partkey AS peca, e.s_name AS fornecedor,
       e.l_extendedprice AS preco_min
FROM elig e
WHERE e.l_extendedprice = (
    SELECT MIN(e2.l_extendedprice) FROM elig e2 WHERE e2.l_partkey = e.l_partkey
)
ORDER BY peca, fornecedor
LIMIT 100
"""


@register("tpch_q2_min_cost_supplier", oracle=_Q2_ORACLE)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per-part minimum-price supplier within one region.  The
    correlated scalar-MIN subquery becomes a per-part window MIN + equality
    filter — ONE shuffle on the correlation key (l_partkey) where naive
    de-correlation re-joins the subquery per row.  Region→nation→supplier
    stays broadcast (dimension-sized); part is filtered before the join."""
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_regionkey"
    )
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == _Q2_REGION)
        .select(F.col("r_regionkey").alias("n_regionkey"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_name", "s_nationkey")
        .join(F.broadcast(nation.join(F.broadcast(region), "n_regionkey")), "s_nationkey")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    elig = li.join(part, "l_partkey").join(supp, "l_suppkey")
    w = Window.partitionBy("l_partkey")
    return (
        elig.withColumn("_min", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("_min"))
        .select(
            F.col("l_partkey").alias("peca"),
            F.col("s_name").alias("fornecedor"),
            F.col("l_extendedprice").alias("preco_min"),
        )
        .distinct()
        .orderBy("peca", "fornecedor")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q7: cross-border volume between supplier and customer nations, by year.
# TPC-H pins two nation names; the analogue keeps the two role-playing
# nation joins and makes the pair filter structural (supplier and customer
# nations in DIFFERENT regions) so the query is non-degenerate at every sf.

_Q7_Y0, _Q7_Y1 = 1996, 1997

_Q7_ORACLE = f"""
SELECT ns.n_name AS nacao_fornecedor,
       nc.n_name AS nacao_cliente,
       CAST(YEAR(l.l_shipdate) AS BIGINT) AS ano,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS volume
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ns.n_regionkey <> nc.n_regionkey
  AND YEAR(l.l_shipdate) BETWEEN {_Q7_Y0} AND {_Q7_Y1}
GROUP BY ns.n_name, nc.n_name, YEAR(l.l_shipdate)
"""


@register("tpch_q7_cross_border_volume", oracle=_Q7_ORACLE)
def tpch_q7_cross_border_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: nation role-plays twice (supplier side, customer side) with
    an inequality between the two roles and a year extract in the grain.
    Both 25-row nation copies broadcast; supplier/customer scale with the
    warehouse and stay unhinted; the year filter pushes to the fact scan."""
    nation_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("nacao_fornecedor"),
        F.col("n_regionkey").alias("_reg_s"),
    )
    nation_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nacao_cliente"),
        F.col("n_regionkey").alias("_reg_c"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate").between(_Q7_Y0, _Q7_Y1))
        .select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").cast("long").alias("ano"),
            _rev().alias("_rev"),
        )
    )
    return (
        li.join(orders, "l_orderkey")
        .join(supp.join(F.broadcast(nation_s), "s_nationkey"), "l_suppkey")
        .join(cust.join(F.broadcast(nation_c), "c_nationkey"), "o_custkey")
        .filter(F.col("_reg_s") != F.col("_reg_c"))
        .groupBy("nacao_fornecedor", "nacao_cliente", "ano")
        .agg(F.sum("_rev").cast("double").alias("volume"))
    )


# ---------------------------------------------------------------------------
# Q9: product-line profit by nation and year.  No partsupp.ps_supplycost,
# so cost is proxied by p_retailprice·l_tax (two scale-2 decimals → exact
# scale-4 product, same bound as the revenue term); the Q9 plan challenge —
# part-filtered 6-way join, profit SUBTRACTION inside the aggregate, nation
# × year grain — is intact.

_Q9_ORACLE = f"""
SELECT n.n_name AS nacao,
       CAST(YEAR(o.o_orderdate) AS BIGINT) AS ano,
       CAST(SUM({_REV_SQL}
                - CAST(p_retailprice AS DECIMAL(15,2))
                  * CAST(l_tax AS DECIMAL(15,2))) AS DOUBLE) AS lucro
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = 'STANDARD'
GROUP BY n.n_name, YEAR(o.o_orderdate)
"""


@register("tpch_q9_product_profit", oracle=_Q9_ORACLE)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit (revenue − cost, both exact decimals) for one
    product line, by supplier nation × order year.  Part filter pushes to
    its scan before the join; nation broadcasts; the lineitem ⋈ orders
    shuffle is the only O(facts) exchange."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select(F.col("p_partkey").alias("l_partkey"), "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.year("o_orderdate").cast("long").alias("ano"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_tax"
    )
    profit = _rev() - F.col("p_retailprice").cast(_MONEY) * F.col("l_tax").cast(_MONEY)
    return (
        li.join(part, "l_partkey")
        .join(supp.join(F.broadcast(nation), "s_nationkey"), "l_suppkey")
        .join(orders, "l_orderkey")
        .select(F.col("n_name").alias("nacao"), "ano", profit.alias("_profit"))
        .groupBy("nacao", "ano")
        .agg(F.sum("_profit").cast("double").alias("lucro"))
    )


# ---------------------------------------------------------------------------
# Q12: priority-class line counts per status (shipmode stand-in:
# l_linestatus) in a one-year shipdate window.

_Q12_Y0, _Q12_Y1 = "1997-01-01", "1998-01-01"

_Q12_ORACLE = f"""
SELECT l.l_linestatus AS status,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS linhas_altas,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS linhas_baixas
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q12_Y0}'
  AND l.l_shipdate < TIMESTAMP '{_Q12_Y1}'
GROUP BY l.l_linestatus
"""


@register("tpch_q12_priority_by_status", oracle=_Q12_ORACLE)
def tpch_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counts (high/low priority) per line class —
    the CASE-inside-SUM pivot.  Date filter pushes to the fact scan; the
    orders join is fact-fact and left to AQE."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q12_Y0).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q12_Y1).cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    return (
        li.join(orders, "l_orderkey")
        .groupBy(F.col("l_linestatus").alias("status"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("linhas_altas"),
            F.sum(F.when(high, 0).otherwise(1)).alias("linhas_baixas"),
        )
    )


# ---------------------------------------------------------------------------
# Q13: customer distribution by order count (LEFT JOIN with an extra join
# predicate, then a histogram of the grouped counts — two stacked
# aggregations).  The comment-pattern exclusion maps to a priority class.

_Q13_ORACLE = """
WITH c_orders AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_pedidos
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey
     AND o.o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c.c_custkey
)
SELECT n_pedidos, COUNT(*) AS n_clientes
FROM c_orders
GROUP BY n_pedidos
"""


@register("tpch_q13_order_count_distribution", oracle=_Q13_ORACLE)
def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: LEFT OUTER join (so zero-order customers keep a row) with
    a non-key predicate folded into the join condition, per-customer count,
    then a second aggregation over the counts.  Both shuffles collapse the
    grain; nothing is broadcast (customer scales with the warehouse)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    )
    per_cust = (
        cust.join(orders, "c_custkey", "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_pedidos"))
    )
    return per_cust.groupBy("n_pedidos").agg(F.count(F.lit(1)).alias("n_clientes"))


# ---------------------------------------------------------------------------
# Q14: promo revenue share in one month — conditional aggregate over the
# part join, emitted as a pure-IEEE ratio of two exact decimal sums.

_Q14_M0, _Q14_M1 = "1997-09-01", "1997-10-01"

_Q14_ORACLE = f"""
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL} END) AS DOUBLE)
         AS receita_promo,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS receita_total,
       100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL} END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE) AS pct_promo
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q14_M0}'
  AND l.l_shipdate < TIMESTAMP '{_Q14_M1}'
"""


@register("tpch_q14_promo_revenue", oracle=_Q14_ORACLE)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: global conditional-aggregate ratio.  Both operands are
    exact decimal sums cast to double, the division is a single IEEE op —
    bit-identical across engines (queries/_util.py ratio rule).  The month
    filter prunes the fact scan; part is the only other input."""
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q14_M0).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q14_M1).cast("timestamp"))
        )
        .select("l_partkey", _rev().alias("_rev"))
    )
    agg = li.join(part, "l_partkey").agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("_rev")))
        .cast("double")
        .alias("receita_promo"),
        F.sum("_rev").cast("double").alias("receita_total"),
    )
    return agg.select(
        "receita_promo",
        "receita_total",
        (F.lit(100.0) * F.col("receita_promo") / F.col("receita_total")).alias(
            "pct_promo"
        ),
    )


# ---------------------------------------------------------------------------
# Q16: supplier counts per part attribute with a NOT-IN supplier exclusion
# (complaints stand-in: s_acctbal < 1000).  lineitem is the part↔supplier
# link (no partsupp).

_Q16_SIZES = (1, 5, 10, 15, 20, 25, 30, 35)

_Q16_ORACLE = f"""
SELECT p.p_brand AS marca, p.p_type AS tipo, p.p_size AS tamanho,
       COUNT(DISTINCT l.l_suppkey) AS n_fornecedores
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN {_Q16_SIZES}
  AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY n_fornecedores DESC, marca, tipo, tamanho
LIMIT 100
"""


@register("tpch_q16_supplier_part_counts", oracle=_Q16_ORACLE)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: COUNT(DISTINCT supplier) per part attribute triple with a
    NOT-IN exclusion — a LEFT ANTI join on the distributed side (the NOT-IN
    list is dimension-sized and broadcast), never a per-row subquery.
    Deterministic (count, brand, type, size) ordering on the top-100."""
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(*_Q16_SIZES))
        )
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_type", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .join(part, "l_partkey")
        .groupBy(
            F.col("p_brand").alias("marca"),
            F.col("p_type").alias("tipo"),
            F.col("p_size").alias("tamanho"),
        )
        .agg(F.countDistinct("l_suppkey").alias("n_fornecedores"))
        .orderBy(
            F.col("n_fornecedores").desc(),
            F.col("marca"),
            F.col("tipo"),
            F.col("tamanho"),
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q18: large-volume orders (IN subquery over a HAVING aggregate).

_Q18_QTY = 300

_Q18_ORACLE = f"""
WITH big AS (
    SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qt
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_QTY}
)
SELECT c.c_name AS nome, c.c_custkey AS cliente, o.o_orderkey AS pedido,
       o.o_orderdate AS data_pedido, CAST(big.qt AS DOUBLE) AS qtd_total
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY qtd_total DESC, pedido
LIMIT 100
"""


@register("tpch_q18_large_orders", oracle=_Q18_ORACLE)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: IN (SELECT ... GROUP BY ... HAVING) becomes the aggregate
    itself joined back — the per-order quantity rollup IS the driving
    table, so the fact history is scanned once, not once per subquery
    evaluation.  Exact decimal quantity sum (doubles would be shuffle-
    order-sensitive); deterministic (qty, orderkey) top-100."""
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qt"))
        .filter(F.col("_qt") > _Q18_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return (
        big.join(orders, "l_orderkey")
        .join(cust, "o_custkey")
        .select(
            F.col("c_name").alias("nome"),
            F.col("o_custkey").alias("cliente"),
            F.col("l_orderkey").alias("pedido"),
            F.col("o_orderdate").alias("data_pedido"),
            F.col("_qt").cast("double").alias("qtd_total"),
        )
        .orderBy(F.col("qtd_total").desc(), F.col("pedido"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive multi-attribute revenue (three OR'd conjunction groups
# spanning both sides of the join — the classic pushdown/CNF challenge).

_Q19_ORACLE = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS receita
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("tpch_q19_disjunctive_revenue", oracle=_Q19_ORACLE)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR of conjunction groups mixing part and lineitem
    attributes.  The single-side residues (brand list, quantity envelope)
    are pre-filtered onto each scan so the disjunction's cross-side parts
    run on already-reduced inputs — the optimization TPC-H Q19 exists to
    test."""
    brands = ("Brand#2", "Brand#12", "Brand#22")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin(*brands) & (F.col("p_size") >= 1))
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_size")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(1, 30))  # envelope of all arms
        .select("l_partkey", "l_quantity", _rev().alias("_rev"))
    )
    arm = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, "l_partkey")
        .filter(arm)
        .agg(F.sum("_rev").cast("double").alias("receita"))
    )


# ---------------------------------------------------------------------------
# Q22: dormant high-balance customers (scalar AVG subquery + NOT EXISTS
# anti-join), grouped by market segment (country-code stand-in).

_Q22_CUTOFF = "2000-01-01"

_Q22_ORACLE = f"""
WITH media AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
    FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment AS segmento,
       COUNT(*) AS n_clientes,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS saldo_total
FROM customer c
WHERE c.c_acctbal > (SELECT a FROM media)
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'
  )
GROUP BY c.c_mktsegment
"""


@register("tpch_q22_dormant_customers", oracle=_Q22_ORACLE)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar subquery (global average, computed as an exact
    decimal sum ÷ count so the threshold is bit-identical across engines)
    broadcast against every customer row, plus a NOT EXISTS that becomes a
    LEFT ANTI join on the correlation key.  No collect(): the scalar rides
    a broadcast cross join inside the plan."""
    cust = load_table(spark, sf_dir, "customer")
    media = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_avg")
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.crossJoin(F.broadcast(media))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segmento"))
        .agg(
            F.count(F.lit(1)).alias("n_clientes"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("saldo_total"),
        )
    )


# ---------------------------------------------------------------------------
# Q6: forecast revenue change — the pure scan-predicate query.  No join at
# all: the whole plan challenge is pushing the three range predicates into
# the parquet scan and summing exactly.

_Q6_Y0, _Q6_Y1 = "1997-01-01", "1998-01-01"

_Q6_ORACLE = f"""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
              * CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE) AS receita
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_Y0}'
  AND l_shipdate < TIMESTAMP '{_Q6_Y1}'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6_forecast_revenue", oracle=_Q6_ORACLE)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: scan + conjunctive range predicates + one exact-decimal
    aggregate.  Every predicate reaches PushedFilters; ReadSchema is the
    four referenced columns; the aggregate is a map-side partial with a
    1-row exchange — the minimal possible plan for the query."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q6_Y0).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q6_Y1).cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    receita = F.col("l_extendedprice").cast(_MONEY) * F.col("l_discount").cast(_MONEY)
    return li.agg(F.sum(receita).cast("double").alias("receita"))


# ---------------------------------------------------------------------------
# Q15: top supplier by quarterly revenue (the CREATE VIEW + scalar-MAX
# query).  The revenue rollup is computed once and reused for both the MAX
# and the final equality — never twice.

_Q15_Q0, _Q15_Q1 = "1997-01-01", "1997-04-01"

_Q15_ORACLE = f"""
WITH receita AS (
    SELECT l_suppkey, SUM({_REV_SQL}) AS total
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q15_Q0}'
      AND l_shipdate < TIMESTAMP '{_Q15_Q1}'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey AS fornecedor, s.s_name AS nome,
       CAST(r.total AS DOUBLE) AS receita_total
FROM supplier s
JOIN receita r ON r.l_suppkey = s.s_suppkey
WHERE r.total = (SELECT MAX(total) FROM receita)
ORDER BY fornecedor
"""


@register("tpch_q15_top_supplier", oracle=_Q15_ORACLE)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: a reusable revenue view + scalar-MAX equality.  The
    per-supplier rollup is ONE grain-collapse shuffle; the global max rides
    back as a broadcast 1-row frame (no collect, no second scan of the
    fact); the supplier join resolves names after the filter, so only the
    winner row(s) touch the dimension.  Revenue stays DECIMAL through the
    equality — exact, so ties are engine-independent."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q15_Q0).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q15_Q1).cast("timestamp"))
        )
        .select("l_suppkey", _rev().alias("_rev"))
    )
    receita = li.groupBy("l_suppkey").agg(F.sum("_rev").alias("_total"))
    best = receita.agg(F.max("_total").alias("_best"))
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    return (
        receita.crossJoin(F.broadcast(best))
        .filter(F.col("_total") == F.col("_best"))
        .join(supp, "l_suppkey")
        .select(
            F.col("l_suppkey").alias("fornecedor"),
            F.col("s_name").alias("nome"),
            F.col("_total").cast("double").alias("receita_total"),
        )
        .orderBy("fornecedor")
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — the correlated per-part average
# quantity threshold.  No p_container, so the part slice is a p_type class.

_Q17_ORACLE = """
WITH alvo AS (
    SELECT p_partkey FROM part WHERE p_type = 'SMALL'
),
medias AS (
    SELECT l.l_partkey,
           0.2 * (CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*)) AS limite
    FROM lineitem l JOIN alvo a ON a.p_partkey = l.l_partkey
    GROUP BY l.l_partkey
)
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS receita_media_anual
FROM lineitem l
JOIN medias m ON m.l_partkey = l.l_partkey
WHERE CAST(l.l_quantity AS DOUBLE) < m.limite
"""


@register("tpch_q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: `l_quantity < (SELECT 0.2*AVG(l_quantity) ... WHERE same
    part)` — the correlated scalar-AVG becomes a per-part window over the
    part-sliced fact, so the fact is scanned ONCE (naive de-correlation
    rescans per row).  The average is an exact decimal sum ÷ count cast to
    double, then one IEEE multiply — bit-identical threshold on both
    engines.  Part slice broadcasts; the window shuffle on l_partkey is the
    single O(facts) exchange."""
    alvo = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "SMALL")
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(alvo), "l_partkey")
    )
    w = Window.partitionBy("l_partkey")
    limite = F.lit(0.2) * (
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        li.withColumn("_lim", limite)
        .filter(F.col("l_quantity").cast("double") < F.col("_lim"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(_MONEY)).cast("double")
                / F.lit(7.0)
            )
            .cast("double")
            .alias("receita_media_anual")
        )
    )


# ---------------------------------------------------------------------------
# Q20: potential part promotions — nested IN subqueries with a correlated
# two-key scalar aggregate.  No partsupp.ps_availqty, so "excess stock"
# maps to shipment concentration: a (part, supplier) pair qualifies when
# its target-year quantity exceeds half its all-time quantity.

_Q20_Y0, _Q20_Y1 = "1997-01-01", "1998-01-01"
_Q20_REGION = 3

_Q20_ORACLE = f"""
SELECT s.s_suppkey AS fornecedor, s.s_name AS nome
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_regionkey = {_Q20_REGION}
  AND s.s_suppkey IN (
        SELECT ps.l_suppkey FROM (
            SELECT l_suppkey, l_partkey,
                   SUM(CASE WHEN l_shipdate >= TIMESTAMP '{_Q20_Y0}'
                             AND l_shipdate < TIMESTAMP '{_Q20_Y1}'
                            THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS qt_ano,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qt_total
            FROM lineitem
            GROUP BY l_suppkey, l_partkey
        ) ps
        WHERE ps.l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
          AND ps.qt_ano * 2 > ps.qt_total
  )
ORDER BY fornecedor
"""


@register("tpch_q20_potential_promotions", oracle=_Q20_ORACLE)
def tpch_q20_potential_promotions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: the deepest TPC-H nesting — supplier IN (pairs whose
    part IN (name-pattern parts) and whose correlated two-key aggregate
    clears a threshold).  The inner correlation is ONE grouped aggregate
    over the part-sliced fact (conditional year sum + total sum in the
    same pass), never a per-pair rescan; the part slice broadcasts BEFORE
    the rollup so the shuffle carries only matching pairs; both IN
    subqueries become LEFT SEMI joins.  The threshold is exact decimal
    arithmetic (qt_ano*2 > qt_total) — no float boundary."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    in_year = (
        F.col("l_shipdate") >= F.lit(_Q20_Y0).cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit(_Q20_Y1).cast("timestamp"))
    qty = F.col("l_quantity").cast("decimal(18,2)")
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_partkey", "l_shipdate", "l_quantity")
        .join(F.broadcast(parts), "l_partkey")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_year, qty)).alias("qt_ano"),
            F.sum(qty).alias("qt_total"),
        )
        .filter(F.col("qt_ano") * 2 > F.col("qt_total"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    nation = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == _Q20_REGION)
        .select(F.col("n_nationkey").alias("s_nationkey"))
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), "s_nationkey")
        .join(pairs, "s_suppkey", "left_semi")
        .select(
            F.col("s_suppkey").alias("fornecedor"), F.col("s_name").alias("nome")
        )
        .orderBy("fornecedor")
    )
