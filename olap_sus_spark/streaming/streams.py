"""Streaming operators over the ``events`` stream.

Design (idiomatic Structured Streaming, not in the reference):

- **Event time + watermark** everywhere: late data within the watermark
  updates its window; beyond it, state is dropped — bounded state at 100 TB/day.
- **Same expressions as batch**: ``tumbling_counts``/``session_counts`` are
  the exact groupBys of the oracle-verified batch queries
  (queries/events_windows.py), applied to an unbounded DataFrame.  Batch
  result == final streaming result (tested), which is the Spark streaming
  correctness contract.
- **Stateful custom operator** via ``applyInPandasWithState``: running
  per-user totals, Arrow-batched, state schema declared explicitly.
- File source here (directory of parquet); swapping in Kafka is a one-line
  source change because every operator takes the stream DataFrame, not a path.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
# The driver's events.parquet stores TIMESTAMP(NANOS) which Spark reads as
# long under spark.sql.legacy.parquet.nanosAsLong (see session.py).
EVENTS_SCHEMA_NANOS = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    ts_is_nanos: bool = False,
) -> DataFrame:
    """File-source event stream with a declared schema (no inference)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA_NANOS if ts_is_nanos else EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if ts_is_nanos:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of ``events_tumbling_window`` (same output columns)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_eventos"),
            F.min("value").alias("menor_valor"),
            F.max("value").alias("maior_valor"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("hora"),
            "n_eventos",
            "menor_valor",
            "maior_valor",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of ``events_sliding_window``: overlapping hopping
    windows — each event updates window/slide concurrent aggregates."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_eventos"))
        .select("event_type", F.col("w.start").alias("inicio"), "n_eventos")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of ``events_session_window``: merging session windows
    with an inactivity gap — the canonical stateful-merge operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_eventos"))
        .select("user_id", F.col("w.start").alias("inicio_sessao"), "n_eventos")
    )


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once by event id within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keys state by event_id and expires it
    once the watermark passes — bounded state, unlike plain dropDuplicates
    on a stream (which would keep every id forever).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-user event count and value
    total, emitted on every update (applyInPandasWithState, Arrow-batched).

    The reference has nothing like this; it demonstrates the engine's
    escape hatch for operators Structured Streaming lacks natively.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_eventos": [n], "soma_valor": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_eventos long, soma_valor double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream (or batch-batch) interval join: each purchase matched
    to every click by the same user within ``horizon`` before it.

    The same expressions serve both execution modes — the batch twin is the
    oracle-verified ``interval_join_attribution`` query
    (queries/relational_ext.py); here the two sides are unbounded and the
    time-range predicate plus watermarks bound the join state (Spark evicts
    click state older than watermark + horizon).  At scale both sides
    shuffle once on user_id; state per key is the horizon's click window.
    """
    p = purchases.select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    c = clicks.select(F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts"))
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return p.join(c, cond).select("event_id", "user_id", "purchase_ts", "click_ts")


def run_available_now(
    stream_df: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Drain all available input through the streaming plan into a memory
    sink (Trigger.AvailableNow) and return the result table.

    AvailableNow gives batch-job semantics (process everything, then stop)
    while exercising the real streaming state machinery — the idiomatic way
    to run a streaming pipeline as a scheduled batch increment.
    """
    name = name or f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def sessionize_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming twin of the batch ``sessionize_events`` gaps-and-islands
    operator (queries/behavior.py): assigns each event its per-user session
    ORDINAL — the stable session id Spark's ``session_window`` aggregate
    cannot give you — via ``applyInPandasWithState``.

    State per user = (last event micros, current session ordinal).  Each
    micro-batch sorts its rows by (ts, event_id) and continues the count:
    a >gap silence since the previous event (in-batch or in-state) starts a
    new session.  Per-user correctness requires per-user ts-ordered arrival
    across triggers (the usual prerequisite for exactly reproducing the
    batch result on a stream); within a trigger, order is restored locally.
    Arrow-batched, state is two scalars per user — bounded.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)

    def update(key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState):
        last_us, sess = state.get if state.exists else (-1, 0)
        batch = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        # Normalize to ns before the int64 view: pandas 2 can hand Arrow
        # batches over as datetime64[us], where a fixed //1000 would turn
        # micros into millis and merge nearly all sessions.
        ts_us = batch["ts"].astype("datetime64[ns]").astype("int64") // 1000
        prev = ts_us.shift(1)
        prev.iloc[0] = last_us if last_us >= 0 else float("nan")
        quebra = prev.isna() | (ts_us - prev > gap_us)
        sessao = sess + quebra.cumsum().astype("int64")
        state.update((int(ts_us.iloc[-1]), int(sessao.iloc[-1])))
        yield pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "sessao": sessao.astype("int32"),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, event_id long, sessao int",
        stateStructType="last_us long, sessao int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ordered funnel (behavior.py:
    funnel_stage_counts): a per-user stage machine over
    ``applyInPandasWithState`` emitting the user's furthest stage after
    every micro-batch (0 none, 1 viewed, 2 clicked-after-view,
    3 purchased-after-click).

    State = (first_view_us, first_qualifying_click_us, stage) — three
    scalars per user, bounded.  Requires per-user ts-ordered arrival for
    exact batch parity (same prerequisite as sessionize_stream).  The batch
    twin's RANGE framing lets equal-timestamp events see each other (its
    gates compare with >=), so within a micro-batch events are processed in
    (ts, stage-kind, event_id) order — all views at a timestamp before the
    clicks at that timestamp before its purchases — which reproduces the
    >=-gate result even when a later-stage event carries a smaller
    event_id at the same ts.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    _KIND_RANK = {"view": 0, "click": 1, "purchase": 2}

    def update(key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState):
        fv, fc, stage = state.get if state.exists else (-1, -1, 0)
        batch = pd.concat(list(pdfs))
        batch = batch.assign(
            _kind_rank=batch["event_type"].map(_KIND_RANK).fillna(3).astype("int64")
        ).sort_values(["ts", "_kind_rank", "event_id"])
        ts_us = batch["ts"].astype("datetime64[ns]").astype("int64") // 1000
        for t, kind in zip(ts_us, batch["event_type"]):
            if kind == "view" and fv < 0:
                fv, stage = t, max(stage, 1)
            elif kind == "click" and fv >= 0 and fc < 0 and t >= fv:
                fc, stage = t, max(stage, 2)
            elif kind == "purchase" and fc >= 0 and t >= fc:
                stage = 3
        state.update((int(fv), int(fc), int(stage)))
        yield pd.DataFrame({"user_id": [key[0]], "etapa": [stage]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, etapa int",
        stateStructType="fv long, fc long, etapa int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
