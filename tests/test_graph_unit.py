"""Unit gates for the iterative graph operators (operators/graph.py).

PageRank is fixed-point BIGINT (multiples of 1e-12): mass is lost only to
integer-division truncation (< n_edges + 2·n_nodes units per round), never
created, so Σ rank ∈ (1 − ε, 1] and results are bit-identical across runs.
"""

from __future__ import annotations

import math

from olap_sus_spark.operators.graph import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_mass_conserved_and_deterministic(spark):
    # a small graph with a dangling node (4 has no out-edges)
    rows = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (2, 4)]
    r1 = {r.node: r.rank_fp for r in pagerank(_edges(spark, rows), iters=12).collect()}
    r2 = {r.node: r.rank_fp for r in pagerank(_edges(spark, rows), iters=12).collect()}
    assert r1 == r2  # bit-identical across runs
    total = sum(r1.values())
    assert 1_000_000_000_000 - 10_000 < total <= 1_000_000_000_000
    # node 2 has the single weakest inflow (half of 1's rank);
    # the sinks fed by multiple nodes (3, 4) outrank the sources
    assert min(r1, key=r1.get) == 2
    assert r1[3] > r1[1] and r1[4] > r1[1]


def test_pagerank_uniform_on_symmetric_cycle(spark):
    rows = [(1, 2), (2, 3), (3, 1)]
    r = {x.node: x.rank for x in pagerank(_edges(spark, rows), iters=20).collect()}
    for v in r.values():
        assert math.isclose(v, 1 / 3, rel_tol=1e-9)


def test_pagerank_empty_edges(spark):
    out = pagerank(_edges(spark, []), iters=5)
    assert out.count() == 0
    assert set(out.columns) == {"node", "rank_fp", "rank"}


def test_pagerank_on_basket_graph(spark):
    from olap_sus_spark.queries.affinity import pagerank_parts
    from tests.conftest import SF_DIR

    r = pagerank_parts(spark, SF_DIR)
    rows = r.collect()
    total = sum(x.rank_fp for x in rows)
    assert 0 < 1_000_000_000_000 - total < 1_000_000  # truncation-only loss
    assert len(rows) > 0


# --------------------------------------------------------------------------
# Triangle counting + k-hop BFS (degree-ordered compact-forward / frontier
# expansion) on known graphs.
# --------------------------------------------------------------------------


def _und(spark, rows):
    from olap_sus_spark.operators.graph import khop_distances, triangle_counts  # noqa

    return spark.createDataFrame(rows, "a long, b long")


def test_triangles_k4_complete(spark):
    from olap_sus_spark.operators.graph import triangle_counts

    # K4: every vertex is in C(3,2)=3 triangles; 4 triangles total
    rows = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = {r.node: r.n_triangles for r in triangle_counts(_und(spark, rows)).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_none_in_tree_or_square(spark):
    from olap_sus_spark.operators.graph import triangle_counts

    tree = [(1, 2), (1, 3), (2, 4)]
    square = [(1, 2), (2, 3), (3, 4), (1, 4)]
    assert triangle_counts(_und(spark, tree)).count() == 0
    assert triangle_counts(_und(spark, square)).count() == 0


def test_triangles_hub_graph(spark):
    from olap_sus_spark.operators.graph import triangle_counts

    # hub 0 connected to 1..6; single outer edge (1,2) → one triangle
    rows = [(0, i) for i in range(1, 7)] + [(1, 2)]
    got = {r.node: r.n_triangles for r in triangle_counts(_und(spark, rows)).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_khop_path_graph_distances(spark):
    from olap_sus_spark.operators.graph import khop_distances

    # path 1-2-3-4-5-6, seed {1}: hop = index distance, capped at k
    rows = [(i, i + 1) for i in range(1, 6)]
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.hop
        for r in khop_distances(_und(spark, rows), seeds, k=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_khop_two_seeds_min_distance(spark):
    from olap_sus_spark.operators.graph import khop_distances

    # seeds at both ends of a path: distance is to the NEAREST seed;
    # adjacent seeds stay at hop 0
    rows = [(i, i + 1) for i in range(1, 6)]
    seeds = spark.createDataFrame([(1,), (2,), (6,)], "node long")
    got = {
        r.node: r.hop
        for r in khop_distances(_und(spark, rows), seeds, k=2).collect()
    }
    assert got == {1: 0, 2: 0, 6: 0, 3: 1, 5: 1, 4: 2}


def test_khop_early_exit_on_exhausted_frontier(spark):
    from olap_sus_spark.operators.graph import khop_distances

    rows = [(1, 2)]
    seeds = spark.createDataFrame([(1,)], "node long")
    # k far beyond the component: loop must stop when the frontier empties
    got = {
        r.node: r.hop
        for r in khop_distances(_und(spark, rows), seeds, k=50).collect()
    }
    assert got == {1: 0, 2: 1}
