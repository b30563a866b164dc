"""Graph analytics over the co-purchase graph: triangles + k-hop BFS.

Extends the iterative-graph family (pagerank_parts, near-dup connected
components) with the two remaining classic shapes:

- **Triangle counting** — the clustering-coefficient / community-density
  primitive.  The engine side is degree-ordered compact-forward counting
  (`operators/graph.py:triangle_counts`): hub wedge volume bounded by
  orienting edges along the degree order, the difference between O(m^1.5)
  and O(Σdeg²) on power-law graphs.  The oracle counts the same triangles
  by the independent id-ordered 3-way self-join — orientation changes the
  enumeration, never the triangle set, so the value hash pins exactness.

- **k-hop BFS distance** — frontier expansion with per-round anti-join on
  the visited set (`graph.py:khop_distances`); the oracle unrolls k
  neighbor expansions and takes MIN(hop), which equals BFS distance
  because a node at distance d first appears in expansion d.

Both run on the same graph as ``basket_part_pairs``: parts co-purchased in
≥2 distinct orders (each unordered pair once, a < b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators.graph import khop_distances, triangle_counts
from olap_sus_spark.registry import register

_EDGES_SQL = """
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM li a
    JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
)
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= 2)
        .drop("sup")
    )


_TRIANGLE_ORACLE = f"""
WITH {_EDGES_SQL},
tri AS (
    SELECT e1.u AS x, e1.v AS y, e2.v AS z
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
)
GROUP BY node
"""


@register("triangle_counts_parts", oracle=_TRIANGLE_ORACLE)
def triangle_counts_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation per part in the co-purchase graph.  Edges
    are materialized once (the khop discipline): the degree aggregate and
    the orientation join would otherwise each re-run the basket self-join
    (r11)."""
    return triangle_counts(
        _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    )


_KHOP_K = 3

_KHOP_ORACLE = f"""
WITH {_EDGES_SQL},
adj AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
a0 AS (
    SELECT DISTINCT u AS node FROM adj WHERE u % 97 = 0
),
a1 AS (SELECT DISTINCT adj.v AS node FROM a0 JOIN adj ON adj.u = a0.node),
a2 AS (SELECT DISTINCT adj.v AS node FROM a1 JOIN adj ON adj.u = a1.node),
a3 AS (SELECT DISTINCT adj.v AS node FROM a2 JOIN adj ON adj.u = a2.node)
SELECT node, CAST(MIN(hop) AS INT) AS hop
FROM (
    SELECT node, 0 AS hop FROM a0
    UNION ALL SELECT node, 1 FROM a1
    UNION ALL SELECT node, 2 FROM a2
    UNION ALL SELECT node, 3 FROM a3
)
GROUP BY node
"""


@register("khop_reachable_parts", oracle=_KHOP_ORACLE)
def khop_reachable_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS distance (≤3 hops) from seed parts (graph nodes ≡ 0 mod 97)."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    seeds = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .filter(F.col("node") % 97 == 0)
        .distinct()
    )
    return khop_distances(edges, seeds, k=_KHOP_K)
