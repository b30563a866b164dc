"""Positional phrase search: adjacency-join semantics and the positional
inverted-index invariants (oracle value parity for phrase_search_topk /
phrase_search_indexed runs in the generic registry suite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olap_sus_spark.queries.search import _phrase_topk
from tests.conftest import SF_DIR


def _pos_frames(spark, tokens: list[str], w1: str, w2: str):
    rows = [(1, i, t) for i, t in enumerate(tokens)]
    pos = spark.createDataFrame(rows, "doc_id int, pos int, term string")
    return (
        pos.filter(F.col("term") == w1).select("doc_id", "pos"),
        pos.filter(F.col("term") == w2).select("doc_id", "pos"),
    )


def test_adjacency_counts_every_occurrence(spark):
    """'a b a b a' contains 'a b' at offsets 0 and 2 — interleaved
    occurrences must each count (substring scans over a joined string
    get this wrong once matches share a boundary)."""
    p1, p2 = _pos_frames(spark, ["a", "b", "a", "b", "a"], "a", "b")
    got = _phrase_topk(p1, p2).collect()
    assert [(r.doc_id, r.phrase_tf, r.rank) for r in got] == [(1, 2, 1)]


def test_adjacency_repeated_token_phrase_overlaps(spark):
    """'a a a' contains 'a a' at offsets 0 and 1: positional adjacency
    counts OVERLAPPING matches, and the oracle's bigram-equality twin
    counts the same set — the semantics a non-overlapping regex scan
    would silently undercount."""
    p1, p2 = _pos_frames(spark, ["a", "a", "a"], "a", "a")
    got = _phrase_topk(p1, p2).collect()
    assert [(r.doc_id, r.phrase_tf, r.rank) for r in got] == [(1, 2, 1)]


def test_phrase_absent_yields_empty(spark):
    p1, p2 = _pos_frames(spark, ["b", "a", "b"], "a", "a")
    assert _phrase_topk(p1, p2).count() == 0


def test_postings_positions_consistent(spark, tmp_path, monkeypatch):
    """Every posting's positions array is sorted, duplicate-free, and of
    length tf — the invariant phrase probes rely on."""
    from olap_sus_spark.operators.inverted import load_or_build_inverted_index

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    postings, _ = load_or_build_inverted_index(spark, SF_DIR)
    bad = postings.filter(
        (F.size("positions") != F.col("tf"))
        | (F.expr("positions != array_sort(array_distinct(positions))"))
    ).count()
    assert bad == 0


def test_transition_probs_are_row_stochastic(spark):
    """Each origem's outgoing probabilities must sum to 1 (IEEE sums of
    the exact count ratios — tolerance for association only)."""
    from collections import defaultdict

    from olap_sus_spark.queries.behavior import event_transition_matrix

    rows = event_transition_matrix(spark, SF_DIR).collect()
    by_o = defaultdict(float)
    for r in rows:
        by_o[r.origem] += r.prob
    assert by_o and all(abs(s - 1.0) < 1e-9 for s in by_o.values())
