"""Iterative graph analytics as DataFrame loops.

Complements the connected-components clustering in operators/dedup.py
(:func:`dedup_clusters`) with PageRank — the two standard "iterate joins to
a fixpoint" shapes.  Both follow the same scale discipline: per round, ONE
shuffle (the rank contribution groupBy) with every other input broadcast,
and ``localCheckpoint`` truncating lineage so the plan stays flat however
many rounds run (the kmeans pattern from operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank).

    Standard damped formulation with dangling-mass redistribution, so
    Σ rank == 1 every round (asserted by the unit gate).  Each iteration:
    contributions = ranks ⋈ edges (broadcast ranks when small, else
    co-partitioned on src) → groupBy(dst) — one shuffle; the dangling mass
    and N are 1-row broadcasts.  Deterministic: no RNG, no order
    dependence (sums are grouped exactly once per node).

    At 100 TB-scale graphs, pre-partition ``edges`` by ``src`` once
    (bucketed table) and every round's join is shuffle-free; rank state is
    2 columns per node.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    degree = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("grau")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))

    for _ in range(iters):
        state = ranks.join(F.broadcast(degree), "node", "left")
        contrib = (
            state.filter(F.col("grau").isNotNull())
            .join(edges.withColumnRenamed(src, "node"), "node")
            .select(F.col(dst).alias("node"), (F.col("rank") / F.col("grau")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("soma"))
        )
        dangling = (
            state.filter(F.col("grau").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("massa"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("soma"), F.lit(0.0)) + F.col("massa") / n_nodes)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
