"""Interval sweep-line operators: island-merge semantics on known data
and the timeline's conservation invariants (oracle value parity for both
registered queries runs in the generic registry suite)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from olap_sus_spark.queries import intervals as iv
from tests.conftest import SF_DIR


def _d(s: str) -> datetime.date:
    return datetime.date.fromisoformat(s)


def test_merge_intervals_known_islands(spark):
    """[1-5] ∪ [3-8] overlap into one island; [10-12] is separate; the
    adjacent-but-disjoint [13-14] starts its own island (merge joins on
    OVERLAP, ini > prev fim ⇒ new island)."""
    rows = [
        (1, _d("2020-01-01"), _d("2020-01-05")),
        (1, _d("2020-01-03"), _d("2020-01-08")),
        (1, _d("2020-01-10"), _d("2020-01-12")),
        (1, _d("2020-01-13"), _d("2020-01-14")),
        (2, _d("2020-01-02"), _d("2020-01-02")),
    ]
    df = spark.createDataFrame(rows, "k int, ini date, fim date")
    got = sorted(
        (r.k, str(r.ini), str(r.fim))
        for r in iv.merge_intervals(df, "k").collect()
    )
    assert got == [
        (1, "2020-01-01", "2020-01-08"),
        (1, "2020-01-10", "2020-01-12"),
        (1, "2020-01-13", "2020-01-14"),
        (2, "2020-01-02", "2020-01-02"),
    ]


def test_merge_contained_interval(spark):
    """An interval fully inside a predecessor ([2-3] ⊂ [1-9]) must not
    split the island, and a later interval overlapping only the OUTER
    end ([5-10]) must still merge — the prefix MAX of fim is what makes
    this work where 'previous row's fim' fails."""
    rows = [
        (1, _d("2020-01-01"), _d("2020-01-09")),
        (1, _d("2020-01-02"), _d("2020-01-03")),
        (1, _d("2020-01-05"), _d("2020-01-10")),
    ]
    df = spark.createDataFrame(rows, "k int, ini date, fim date")
    got = [(str(r.ini), str(r.fim)) for r in iv.merge_intervals(df, "k").collect()]
    assert got == [("2020-01-01", "2020-01-10")]


def test_timeline_conserves_and_stays_nonnegative(spark):
    """Every order eventually closes, so the sweep must return to zero at
    the final change point and never dip negative in between."""
    tl = iv.open_orders_timeline(spark, SF_DIR).orderBy("dia").collect()
    assert tl[-1].abertos == 0
    assert min(r.abertos for r in tl) >= 0
    assert max(r.abertos for r in tl) > 0


def test_coverage_bounds(spark):
    """Per-customer: the longest island can't exceed total coverage, and
    total covered days can't exceed the customer's overall span."""
    cov = iv.customer_order_coverage(spark, SF_DIR)
    assert cov.filter(F.col("maior_ilha") > F.col("dias_cobertos")).count() == 0
    assert cov.filter(F.col("n_ilhas") < 1).count() == 0


def test_twa_weights_cover_every_day(spark):
    """Year-grain weighted-day totals must sum to the full span between
    the first and last change point (+1 for the closing point's one-day
    hold) — no day double-counted or dropped."""
    tl = iv.open_orders_timeline(spark, SF_DIR).orderBy("dia").collect()
    twa = iv.open_orders_time_weighted_avg(spark, SF_DIR).collect()
    span = (tl[-1].dia - tl[0].dia).days + 1
    assert sum(r.dias_ponderados for r in twa) == span
    hi = max(r.abertos for r in tl)
    assert all(0.0 <= r.media_ponderada <= hi for r in twa)
