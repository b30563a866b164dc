"""Streaming operators vs their batch twins (the streaming correctness
contract: final streaming result == batch result on the same input)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.streaming import (
    dedup_events_stream,
    interval_join_attribution,
    read_event_stream,
    run_available_now,
    running_user_totals,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from tests.conftest import SF_DIR

pytestmark = pytest.mark.slow  # hour-scale chain/probe suite: opt-in via -m slow (driver verify window, r11)



@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """events sf0.001 rewritten as a 4-file parquet directory (micros ts)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_DIR, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def _batch(spark, stream_dir):
    return spark.read.parquet(stream_dir)


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    got = run_available_now(tumbling_counts(stream), "complete")
    want = (
        _batch(spark, stream_dir)
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_eventos"),
            F.min("value").alias("menor_valor"),
            F.max("value").alias("maior_valor"),
        )
        .select("event_type", F.col("w.start").alias("hora"), "n_eventos",
                "menor_valor", "maior_valor")
    )
    assert _sorted(got) == _sorted(want)


def test_sliding_stream_matches_batch(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    got = run_available_now(sliding_counts(stream), "complete")
    want = (
        _batch(spark, stream_dir)
        .groupBy("event_type", F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_eventos"))
        .select("event_type", F.col("w.start").alias("inicio"), "n_eventos")
    )
    assert _sorted(got) == _sorted(want)


def test_session_stream_matches_batch(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    got = run_available_now(session_counts(stream), "complete")
    want = (
        _batch(spark, stream_dir)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_eventos"))
        .select("user_id", F.col("w.start").alias("inicio_sessao"), "n_eventos")
    )
    assert _sorted(got) == _sorted(want)


def test_dedup_within_watermark(spark, stream_dir, tmp_path_factory):
    """Two copies of every file -> exactly one surviving row per event_id."""
    doubled = str(tmp_path_factory.mktemp("events_doubled"))
    base = _batch(spark, stream_dir)
    base.write.mode("overwrite").parquet(doubled)
    base.write.mode("append").parquet(doubled)

    stream = read_event_stream(spark, doubled)
    got = run_available_now(dedup_events_stream(stream), "append")
    assert got.count() == base.count()
    assert got.select("event_id").distinct().count() == base.count()


def test_stream_stream_interval_join_matches_batch(spark, stream_dir):
    """Watermarked stream-stream interval join == the batch interval join
    on the same input (the oracle-verified interval_join_attribution)."""

    def split(df):
        return (
            df.filter(F.col("event_type") == "purchase"),
            df.filter(F.col("event_type") == "click"),
        )

    got = run_available_now(
        interval_join_attribution(
            *split(read_event_stream(spark, stream_dir))
        ),
        "append",
    )
    want = interval_join_attribution(*split(_batch(spark, stream_dir)))
    assert _sorted(got) == _sorted(want)
    assert got.count() > 0


@pytest.mark.parametrize("variant", ["per_user", "bucketed"])
def test_stateful_running_totals(spark, stream_dir, variant):
    """applyInPandasWithState across several micro-batches (per-user AND
    bucketed dispatch): the last emitted cumulative row per user must equal
    the batch aggregate."""
    from olap_sus_spark.streaming.streams import running_user_totals_bucketed

    op = running_user_totals if variant == "per_user" else (
        lambda s: running_user_totals_bucketed(s, buckets=16)
    )
    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    updates = run_available_now(op(stream), "update")
    # take the row with the highest cumulative count per user (soma itself
    # isn't monotonic if values can be negative)
    final = (
        updates.groupBy("user_id")
        .agg(F.max(F.struct("n_eventos", "soma_valor")).alias("m"))
        .select("user_id", "m.n_eventos", "m.soma_valor")
        .collect()
    )
    want = {
        r.user_id: (r.n, r.s)
        for r in _batch(spark, stream_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert len(final) == len(want)
    for r in final:
        n, s = want[r.user_id]
        assert r.n_eventos == n
        assert r.soma_valor == pytest.approx(s, rel=1e-9)


@pytest.mark.parametrize("variant", ["per_user", "bucketed"])
def test_streaming_sessionize_matches_batch(spark, tmp_path_factory, variant):
    """sessionize_stream (per-user AND bucketed dispatch) across ordered
    micro-batches == the batch gaps-and-islands sessionization (session
    ordinals and sizes) — the bucketed run exercises multi-user array
    state carried across triggers."""
    import time as _time

    from olap_sus_spark.queries.behavior import sessionize_events
    from olap_sus_spark.streaming.streams import (
        sessionize_stream,
        sessionize_stream_bucketed,
    )
    from tests.conftest import SF_DIR

    op = sessionize_stream if variant == "per_user" else (
        lambda s: sessionize_stream_bucketed(s, buckets=16)  # few users/bucket AND multi-user buckets
    )

    # Stage time-RANGED files written sequentially so the file source
    # (ordered by mtime) replays events in per-user ts order.
    d = str(tmp_path_factory.mktemp("events_sessions"))
    ev = load_table(spark, SF_DIR, "events")
    ranged = ev.repartitionByRange(4, "ts").sortWithinPartitions("ts")
    for i in range(4):
        part = ranged.withColumn("p", F.spark_partition_id()).filter(
            F.col("p") == i
        ).drop("p")
        part.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)  # distinct mtimes -> deterministic replay order

    stream = read_event_stream(spark, d, max_files_per_trigger=1)
    got = (
        run_available_now(op(stream), "append")
        .groupBy("user_id", "sessao")
        .agg(F.count(F.lit(1)).alias("n_eventos"))
    )
    want = sessionize_events(spark, SF_DIR).select(
        "user_id", "sessao", "n_eventos"
    )
    assert _sorted(got) == _sorted(want)
    assert got.count() > 0


@pytest.mark.parametrize("variant", ["per_user", "bucketed"])
def test_streaming_funnel_matches_batch(spark, tmp_path_factory, variant):
    """funnel_stream's final per-user stages (per-user AND bucketed
    dispatch) aggregate to the same stage counts as the batch funnel
    (view/click/purchase semantics)."""
    import time as _time

    from olap_sus_spark.queries.behavior import funnel_stage_counts
    from olap_sus_spark.streaming.streams import (
        funnel_stream,
        funnel_stream_bucketed,
    )
    from tests.conftest import SF_DIR

    op = funnel_stream if variant == "per_user" else (
        lambda s: funnel_stream_bucketed(s, buckets=16)
    )

    d = str(tmp_path_factory.mktemp("events_funnel"))
    ev = load_table(spark, SF_DIR, "events")
    ranged = ev.repartitionByRange(3, "ts").sortWithinPartitions("ts")
    for i in range(3):
        part = ranged.withColumn("p", F.spark_partition_id()).filter(
            F.col("p") == i
        ).drop("p")
        part.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)

    stream = read_event_stream(spark, d, max_files_per_trigger=1)
    updates = run_available_now(op(stream), "update")
    # final stage per user = max stage emitted (stages only move forward)
    final = updates.groupBy("user_id").agg(F.max("etapa").alias("etapa"))
    got = {
        etapa: final.filter(F.col("etapa") >= nivel).count()
        for etapa, nivel in [("view", 1), ("click", 2), ("purchase", 3)]
    }
    want = {
        r.etapa: r.usuarios for r in funnel_stage_counts(spark, SF_DIR).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# TTL eviction in the bucketed stateful operators: state must track the
# ACTIVE user population on churning streams, and an evicted user who
# returns restarts from empty state (emit-and-drop semantics).


def _mk_churn_events(spark, d, generations=6, users_per_gen=400, base="2024-01-01"):
    """One parquet file per 'day', each day a DISJOINT user population —
    the worst case for unbounded state (state grows by users_per_gen/day
    without eviction)."""
    import time as _time

    for g in range(generations):
        day = spark.createDataFrame(
            [
                (
                    g * 1_000_000 + i,
                    g * users_per_gen + i % users_per_gen,
                    float(i % 7),
                )
                for i in range(users_per_gen * 2)  # 2 events/user/day
            ],
            "event_id long, user_id long, value double",
        ).select(
            "event_id",
            (
                F.lit(base).cast("timestamp")
                + F.make_interval(days=F.lit(g), mins=F.col("event_id") % 60)
            ).alias("ts"),
            "user_id",
            F.lit("view").alias("event_type"),
            "value",
            F.lit("{}").alias("props"),
        )
        day.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)  # distinct mtimes -> deterministic replay order


def _drain_with_progress(stream_df, output_mode):
    import uuid as _uuid

    name = f"ttl_{_uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name), list(q.recentProgress)


def _state_bytes(progress):
    ops = [
        op
        for p in progress
        if p["numInputRows"] > 0
        for op in (p.get("stateOperators") or [])
    ]
    return [op.get("memoryUsedBytes") for op in ops]


def test_ttl_bounds_state_under_churn(spark, tmp_path_factory):
    """Rotating user population across micro-batches: with a TTL shorter
    than the rotation, per-batch state stays flat instead of accumulating
    every user ever seen — and the last generation's emitted totals are
    identical with and without TTL (eviction only touches idle users)."""
    from olap_sus_spark.streaming.streams import running_user_totals_bucketed

    d = str(tmp_path_factory.mktemp("churn"))
    _mk_churn_events(spark, d, generations=6, users_per_gen=400)

    def run(ttl):
        stream = read_event_stream(spark, d, max_files_per_trigger=1)
        return _drain_with_progress(
            running_user_totals_bucketed(stream, buckets=4, ttl=ttl), "update"
        )

    out_ttl, prog_ttl = run("2 days")
    out_inf, prog_inf = run(None)

    # final-batch state: bounded (~2 generations) vs all 6 generations
    b_ttl, b_inf = _state_bytes(prog_ttl)[-1], _state_bytes(prog_inf)[-1]
    assert b_ttl < b_inf * 0.6, (b_ttl, b_inf)

    # active (last-generation) users' outputs are untouched by eviction
    last_users = F.col("user_id") >= 5 * 400
    assert _sorted(out_ttl.filter(last_users)) == _sorted(out_inf.filter(last_users))


def test_ttl_returning_user_restarts_totals(spark, tmp_path_factory):
    """Emit-and-drop semantics made concrete: a user idle past the TTL who
    returns restarts counts from zero (without TTL the totals continue)."""
    import time as _time

    from olap_sus_spark.streaming.streams import running_user_totals_bucketed

    d = str(tmp_path_factory.mktemp("ttl_return"))
    for day, n_ev in [(0, 2), (40, 3)]:
        spark.createDataFrame(
            [(day * 100 + i, 7, 1.0) for i in range(n_ev)],
            "event_id long, user_id long, value double",
        ).select(
            "event_id",
            (
                F.lit("2024-01-01").cast("timestamp")
                + F.make_interval(days=F.lit(day), mins=F.col("event_id") % 60)
            ).alias("ts"),
            "user_id",
            F.lit("view").alias("event_type"),
            "value",
            F.lit("{}").alias("props"),
        ).coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)

    def final_n(ttl):
        stream = read_event_stream(spark, d, max_files_per_trigger=1)
        out, _ = _drain_with_progress(
            running_user_totals_bucketed(stream, buckets=2, ttl=ttl), "update"
        )
        rows = sorted(out.collect(), key=lambda r: r.n_eventos)
        return [r.n_eventos for r in rows]

    assert final_n(None) == [2, 5]       # continues: 2 then 2+3
    assert final_n("30 days") == [2, 3]  # evicted at the 40-day gap: restart


def test_ttl_returning_user_restarts_sessions_and_funnel(spark, tmp_path_factory):
    """Session ordinals restart at 1 and the funnel restarts at stage 0
    after an eviction — and with TTL=None both match their unbounded
    behavior (ordinal 2 / stage 3)."""
    import time as _time

    from olap_sus_spark.streaming.streams import (
        funnel_stream_bucketed,
        sessionize_stream_bucketed,
    )

    d = str(tmp_path_factory.mktemp("ttl_sess"))
    # day 0: view then click; day 40: purchase (qualifies only if fc survives)
    for day, events in [(0, [("view", 0), ("click", 1)]), (40, [("purchase", 0)])]:
        spark.createDataFrame(
            [(day * 100 + i, 7, kind, 1.0) for i, (kind, _) in enumerate(events)],
            "event_id long, user_id long, event_type string, value double",
        ).select(
            "event_id",
            (
                F.lit("2024-01-01").cast("timestamp")
                + F.make_interval(days=F.lit(day), mins=F.col("event_id") % 60)
            ).alias("ts"),
            "user_id",
            "event_type",
            "value",
            F.lit("{}").alias("props"),
        ).coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)

    def run_sess(ttl):
        stream = read_event_stream(spark, d, max_files_per_trigger=1)
        out, _ = _drain_with_progress(
            sessionize_stream_bucketed(stream, gap="30 minutes", buckets=2, ttl=ttl),
            "append",
        )
        return max(r.sessao for r in out.collect())

    assert run_sess(None) == 2        # day-40 events open session ordinal 2
    assert run_sess("30 days") == 1   # state evicted: ordinals restart at 1

    def run_funnel(ttl):
        stream = read_event_stream(spark, d, max_files_per_trigger=1)
        out, _ = _drain_with_progress(
            funnel_stream_bucketed(stream, buckets=2, ttl=ttl), "update"
        )
        return sorted(r.etapa for r in out.collect())  # one row per batch

    assert run_funnel(None) == [2, 3]       # day-0 view+click, then purchase -> 3
    assert run_funnel("30 days") == [0, 2]  # evicted: purchase alone is stage 0
