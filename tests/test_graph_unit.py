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
