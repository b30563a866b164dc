"""Customer/product affinity analytics — market-basket co-occurrence and
RFM segmentation.

Neither shape exists in the reference (its query surface stops at star-join
roll-ups — SURVEY.md §2.11); both are standard next steps for a warehouse
user, and both have well-defined distributed shapes:

- **Co-occurrence**: the self-join runs co-partitioned on the basket key
  (one shuffle per side, same key), so pair generation never crosses
  baskets; output is bounded by Σ basket_size² — data-dependent, not
  engine-dependent.
- **RFM**: metrics are one groupBy over orders; the quartile windows
  partition by nation (each customer population quartiles within its
  nation), so ranking distributes instead of collapsing to one partition —
  the honest 100 TB formulation of NTILE-based segmentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_sus_spark.catalog import load_table
from olap_sus_spark.queries._util import dec
from olap_sus_spark.registry import register

# --------------------------------------------------------------------------
# Market-basket pairs: parts ordered together in the same order, counted
# across orders, kept where support ≥ 2.  DISTINCT first so a part repeated
# in one order (multiple lineitems) counts once per basket; a < b emits each
# unordered pair exactly once.
# --------------------------------------------------------------------------
_BASKET_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS pedidos_juntos
FROM li a
JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


@register("basket_part_pairs", oracle=_BASKET_ORACLE)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    return (
        pairs.groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("pedidos_juntos"))
        .filter(F.col("pedidos_juntos") >= 2)
    )


# --------------------------------------------------------------------------
# RFM segmentation: recency (days since last order, anchored at the global
# max order date so the result is reproducible), frequency (order count),
# monetary (decimal-exact spend), each quartiled WITHIN the customer's
# nation.  Ties break on custkey so every NTILE assignment is deterministic
# in both engines.  The 1-row anchor is a broadcast (cross) join — free.
# --------------------------------------------------------------------------
_RFM_ORACLE = """
WITH m AS (
    SELECT o_custkey,
           MAX(o_orderdate) AS ultimo,
           COUNT(*) AS freq,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS gasto_dec
    FROM orders GROUP BY o_custkey
),
anc AS (SELECT MAX(o_orderdate) AS fim FROM orders),
base AS (
    SELECT m.o_custkey,
           CAST(date_diff('day', CAST(m.ultimo AS DATE), CAST(anc.fim AS DATE))
                AS INT) AS recencia_dias,
           m.freq, m.gasto_dec, c.c_nationkey
    FROM m CROSS JOIN anc
    JOIN customer c ON c.c_custkey = m.o_custkey
)
SELECT o_custkey, recencia_dias,
       freq AS frequencia,
       CAST(gasto_dec AS DOUBLE) AS gasto,
       NTILE(4) OVER (PARTITION BY c_nationkey
                      ORDER BY recencia_dias, o_custkey) AS r_quartil,
       NTILE(4) OVER (PARTITION BY c_nationkey
                      ORDER BY freq DESC, o_custkey) AS f_quartil,
       NTILE(4) OVER (PARTITION BY c_nationkey
                      ORDER BY gasto_dec DESC, o_custkey) AS m_quartil
FROM base
"""


@register("rfm_segmentation", oracle=_RFM_ORACLE)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    m = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("ultimo"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(dec("o_totalprice")).alias("gasto_dec"),
    )
    anc = orders.agg(F.max("o_orderdate").alias("fim"))
    base = (
        m.join(F.broadcast(anc))
        .join(
            # both sides are customer-cardinality: co-partitioned shuffle
            # join on the key (a hard broadcast hint would OOM at scale)
            cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
            "o_custkey",
        )
        .select(
            "o_custkey",
            F.datediff(F.col("fim").cast("date"), F.col("ultimo").cast("date")).alias(
                "recencia_dias"
            ),
            "freq",
            "gasto_dec",
            "c_nationkey",
        )
    )
    wn = Window.partitionBy("c_nationkey")
    return base.select(
        "o_custkey",
        "recencia_dias",
        F.col("freq").alias("frequencia"),
        F.col("gasto_dec").cast("double").alias("gasto"),
        F.ntile(4)
        .over(wn.orderBy("recencia_dias", "o_custkey"))
        .alias("r_quartil"),
        F.ntile(4)
        .over(wn.orderBy(F.col("freq").desc(), "o_custkey"))
        .alias("f_quartil"),
        F.ntile(4)
        .over(wn.orderBy(F.col("gasto_dec").desc(), "o_custkey"))
        .alias("m_quartil"),
    )


# --------------------------------------------------------------------------
# PageRank over the co-purchase graph.  Edges = basket co-occurrence pairs
# (support ≥ 2), both directions; ranks surface the parts most central to
# cross-selling.  The operator runs in fixed-point BIGINT arithmetic
# (operators/graph.py), so the iterative fixpoint IS SQL-expressible: the
# oracle unrolls the 8 iterations as chained CTEs over the same integer
# ops — bit-exact by construction.  The graph is symmetric, hence no
# dangling nodes and the oracle needs no mass-redistribution arm (the
# operator's dangling aggregate evaluates to 0 and contributes nothing).
# Unit gates (test_graph_unit.py): Σ rank ∈ (1−ε, 1], determinism, known
# orderings, flat plan via localCheckpoint.
# --------------------------------------------------------------------------
_PR_ITERS = 8
_PR_SCALE = 1_000_000_000_000


def _pagerank_oracle(iters: int = _PR_ITERS, scale: int = _PR_SCALE) -> str:
    # The shared CTEs are MATERIALIZED: every unrolled iteration r_i
    # references edges/deg/nodes, and DuckDB's default single-reference
    # inlining re-derives the expensive lineitem self-join once per
    # iteration — at the sf1 probe scale that recomputation spilled the
    # whole disk before finishing (found by tools/sf1_sweep.py; at the
    # sf0.01 gate the recompute was merely invisible slack).  Semantics
    # are unchanged — materialization only pins evaluate-once.
    head = f"""
WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pares AS MATERIALIZED (
    SELECT a.l_partkey AS p1, b.l_partkey AS p2
    FROM li a
    JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
),
edges AS MATERIALIZED (
    SELECT p1 AS src, p2 AS dst FROM pares
    UNION ALL
    SELECT p2, p1 FROM pares
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
params AS MATERIALIZED (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST((({scale} * 15) // 100) // COUNT(*) AS BIGINT) AS base
    FROM nodes
),
deg AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS grau FROM edges GROUP BY 1),
r0 AS (
    SELECT node, CAST({scale} // p.n AS BIGINT) AS rank_fp
    FROM nodes CROSS JOIN params p
)"""
    steps = "".join(
        f""",
r{i} AS (
    SELECT n2.node,
           CAST(p.base + (85 * COALESCE(s.soma, 0)) // 100 AS BIGINT) AS rank_fp
    FROM nodes n2 CROSS JOIN params p
    LEFT JOIN (
        SELECT e.dst AS node, CAST(SUM(r.rank_fp // d.grau) AS BIGINT) AS soma
        FROM r{i - 1} r
        JOIN deg d ON d.node = r.node
        JOIN edges e ON e.src = r.node
        GROUP BY e.dst
    ) s ON s.node = n2.node
)"""
        for i in range(1, iters + 1)
    )
    tail = f"""
SELECT node AS parte, rank_fp,
       rank_fp / {float(scale)} AS rank
FROM r{iters}"""
    return head + steps + tail


@register("pagerank_parts", oracle=_pagerank_oracle())
def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from olap_sus_spark.operators.graph import pagerank

    pairs = basket_part_pairs(spark, sf_dir)
    # Both edge orientations from ONE generator: unionByName duplicated the
    # whole basket-pairs subtree (the lineitem basket self-join — the
    # dominant term) because differently-aliased exchanges are not reused;
    # explode evaluates its input once and emits two rows (r11, the
    # _mutual_nn_from_buckets fix applied here — VERDICT r10 #3).
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("p1").alias("src"), F.col("p2").alias("dst")),
                F.struct(F.col("p2").alias("src"), F.col("p1").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    return pagerank(edges, iters=_PR_ITERS, scale=_PR_SCALE).select(
        F.col("node").alias("parte"), "rank_fp", "rank"
    )


# --------------------------------------------------------------------------
# Exact MODE aggregate — most frequent order priority per year, smallest
# value on ties (neither engine's native mode() has portable tie-breaks, so
# both sides state it as count + rank — deterministic everywhere).  Two
# aggregations then a per-year top-1: WindowGroupLimit pushes the rank<=1
# filter into a partial top-1 before the exchange.
# --------------------------------------------------------------------------
_MODE_ORACLE = """
WITH c AS (
    SELECT EXTRACT(YEAR FROM o_orderdate)::INT AS ano,
           o_orderpriority AS prioridade, COUNT(*) AS n
    FROM orders GROUP BY 1, 2
)
SELECT ano, prioridade, n FROM (
    SELECT ano, prioridade, n,
           ROW_NUMBER() OVER (PARTITION BY ano
                              ORDER BY n DESC, prioridade) AS rk
    FROM c
) WHERE rk = 1
"""


@register("exact_mode_priority", oracle=_MODE_ORACLE)
def exact_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(
        F.year("o_orderdate").alias("ano"),
        F.col("o_orderpriority").alias("prioridade"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("ano").orderBy(F.col("n").desc(), "prioridade")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("ano", "prioridade", "n")
    )


# --------------------------------------------------------------------------
# Item-to-item recommendations: top-3 co-purchased parts per part by basket
# support (ties → smallest partner id).  Pairs come from basket_part_pairs;
# each unordered pair fans out to both directions so every part gets its
# own ranked partner list — the "customers also bought" shape.
# --------------------------------------------------------------------------
_COBUY_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pares AS (
    SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS suporte
    FROM li a
    JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
),
dirigido AS (
    SELECT p1 AS parte, p2 AS parceiro, suporte FROM pares
    UNION ALL
    SELECT p2, p1, suporte FROM pares
)
SELECT parte, parceiro, suporte FROM (
    SELECT parte, parceiro, suporte,
           ROW_NUMBER() OVER (PARTITION BY parte
                              ORDER BY suporte DESC, parceiro) AS rk
    FROM dirigido
) WHERE rk <= 3
"""


@register("top_copurchases_per_part", oracle=_COBUY_ORACLE)
def top_copurchases_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    pares = basket_part_pairs(spark, sf_dir).withColumnRenamed(
        "pedidos_juntos", "suporte"
    )
    # unionByName re-evaluated the basket-pairs subtree per direction —
    # one explode generator emits both orientations from a single pass
    # (same rewrite as pagerank_parts above).
    dirigido = pares.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("p1").alias("parte"),
                    F.col("p2").alias("parceiro"),
                    F.col("suporte").alias("suporte"),
                ),
                F.struct(
                    F.col("p2").alias("parte"),
                    F.col("p1").alias("parceiro"),
                    F.col("suporte").alias("suporte"),
                ),
            )
        ).alias("_e")
    ).select("_e.parte", "_e.parceiro", "_e.suporte")
    w = Window.partitionBy("parte").orderBy(F.col("suporte").desc(), "parceiro")
    return (
        dirigido.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("parte", "parceiro", "suporte")
    )
