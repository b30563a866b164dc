"""Unit regressions for behavioral operators (queries/behavior.py)."""

from __future__ import annotations

import datetime as dt


def test_sequence_pattern_tolerates_trailing_error(spark, tmp_path):
    """A user whose LAST event is 'error' must not blow up the lookahead
    (ANSI element_at beyond the array end throws — caught by the 100x
    scale probe; the lookahead now uses clamping slice)."""
    from olap_sus_spark.queries.behavior import sequence_pattern_users

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: error -> signup within 3 -> match, and last event is error
        (1, t0, 1, "error", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "signup", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "error", 0.0, "{}"),
        # user 2: error then signup 4 events later -> no match
        (4, t0, 2, "error", 0.0, "{}"),
        (5, t0 + dt.timedelta(minutes=1), 2, "view", 0.0, "{}"),
        (6, t0 + dt.timedelta(minutes=2), 2, "view", 0.0, "{}"),
        (7, t0 + dt.timedelta(minutes=3), 2, "view", 0.0, "{}"),
        (8, t0 + dt.timedelta(minutes=4), 2, "signup", 0.0, "{}"),
        # user 3: ONLY event is error (n=1 boundary)
        (9, t0, 3, "error", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    d = str(tmp_path)
    df.write.parquet(f"{d}/events.parquet")
    got = {r.user_id for r in sequence_pattern_users(spark, d).collect()}
    assert got == {1}
