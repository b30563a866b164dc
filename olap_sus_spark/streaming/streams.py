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


def _ttl_us(ttl: str | None) -> int | None:
    import pandas as pd

    return None if ttl is None else int(pd.Timedelta(ttl).total_seconds() * 1_000_000)


def _evict_idle(
    st_last: dict, other_maps: tuple[dict, ...], ttl_us: int | None, now_us: int
) -> None:
    """Idle-age eviction inside a bucket's packed state (emit-and-drop):
    BEFORE this batch is folded in, users whose last activity lags the
    batch's max event time (the per-bucket watermark proxy — monotone under
    the operators' shared ordered-arrival prerequisite) by more than the
    TTL are dropped from every state map, so state size — and the per-batch
    wholesale array rewrite — tracks the ACTIVE population, not every user
    ever seen.  Evicting pre-fold is what makes the semantics clean: a
    returning user past the TTL gap starts from EMPTY state rather than
    silently merging with expired state.  Semantics trade-off, as with any
    watermark TTL: totals restart, session ordinals restart, funnel stage
    resets — the pre-idle results were already emitted.  ``ttl_us=None``
    keeps exact unbounded-lifetime state (the registered batch-parity
    queries use it on their finite inputs)."""
    if ttl_us is None or not st_last:
        return
    horizon = now_us - ttl_us
    for u in [u for u, t in st_last.items() if t < horizon]:
        del st_last[u]
        for m in other_maps:
            m.pop(u, None)


def running_user_totals_bucketed(
    events: DataFrame, buckets: int = 512, ttl: str | None = None
) -> DataFrame:
    """Bucketed-dispatch variant of :func:`running_user_totals` — completes
    the adopted pattern across all three stateful operators (see
    :func:`sessionize_stream_bucketed` for the rationale and trade-offs).
    Per-batch work is one pandas groupby-agg per bucket; state packs the
    bucket's users as parallel arrays.  ``ttl`` bounds state on unbounded
    streams with user churn (see :func:`_evict_idle`)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl_us = _ttl_us(ttl)

    def update(key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState):
        if state.exists:
            uids, ns, totals, lasts = state.get
            st_n = dict(zip(uids, ns))
            st_t = dict(zip(uids, totals))
            st_last = dict(zip(uids, lasts))
        else:
            st_n, st_t, st_last = {}, {}, {}
        batch = pd.concat(list(pdfs))
        # size (ALL rows), not count (non-null only): the per-user twin
        # counts len(pdf), so a NULL value row must still increment
        # n_eventos identically here; pandas' NaN-skipping sum matches the
        # twin's pdf["value"].sum().
        ts_us = batch["ts"].astype("datetime64[ns]").astype("int64") // 1000
        _evict_idle(st_last, (st_n, st_t), ttl_us, int(ts_us.max()))
        agg = batch.assign(_ts_us=ts_us).groupby("user_id").agg(
            size=("value", "size"), sum=("value", "sum"), last=("_ts_us", "max")
        )
        out_users, out_n, out_t = [], [], []
        for u, row in agg.iterrows():
            n = st_n.get(u, 0) + int(row["size"])
            t = st_t.get(u, 0.0) + float(row["sum"])
            st_n[u], st_t[u] = n, t
            st_last[u] = max(st_last.get(u, -1), int(row["last"]))
            out_users.append(u)
            out_n.append(n)
            out_t.append(t)
        users = list(st_n)
        state.update(
            (
                [int(u) for u in users],
                [int(st_n[u]) for u in users],
                [float(st_t[u]) for u in users],
                [int(st_last[u]) for u in users],
            )
        )
        yield pd.DataFrame(
            {"user_id": out_users, "n_eventos": out_n, "soma_valor": out_t}
        ).astype({"user_id": "int64", "n_eventos": "int64"})

    return (
        events.withColumn("_bucket", F.pmod(F.hash("user_id"), F.lit(buckets)))
        .groupBy("_bucket")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_eventos long, soma_valor double",
            stateStructType=(
                "uids array<long>, ns array<long>, totals array<double>, "
                "last_us array<long>"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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


def sessionize_stream_bucketed(
    events: DataFrame,
    gap: str = "30 minutes",
    buckets: int = 512,
    ttl: str | None = None,
) -> DataFrame:
    """Bucketed-dispatch variant of :func:`sessionize_stream`: state groups
    are hash buckets of users, not individual users.

    The per-user variant's cost ceiling is Python dispatch: one pandas
    function invocation per user per micro-batch (the ×100 probe measured
    150k invocations/batch dominating trigger latency).  Here the stream
    groups by ``pmod(hash(user_id), buckets)``, each invocation handles the
    bucket's whole user slice VECTORIZED (groupby-shift/cumsum — no
    per-user Python), and state packs the bucket's users as parallel
    arrays.  Dispatch count per batch drops from |users| to ≤ buckets;
    output is identical to the per-user operator row-for-row (same
    registered oracle).

    Trade-offs: each bucket's full state round-trips Arrow per batch even
    if one user in the bucket changed (arrays rewrite wholesale), and a
    bucket is the unit of parallelism — size ``buckets`` ≳ 4× total cores
    at the target scale so no executor idles.  ``buckets`` only shards
    state; results don't depend on it.  ``ttl`` bounds state on unbounded
    streams with user churn (see :func:`_evict_idle`; a returning evicted
    user's session ordinals restart at 1).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    ttl_us = _ttl_us(ttl)

    def update(key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState):
        if state.exists:
            uids, lasts, sesss = state.get
            st_last = dict(zip(uids, lasts))
            st_sess = dict(zip(uids, sesss))
        else:
            st_last, st_sess = {}, {}
        batch = pd.concat(list(pdfs)).sort_values(["user_id", "ts", "event_id"])
        uid = batch["user_id"]
        ts_us = batch["ts"].astype("datetime64[ns]").astype("int64") // 1000
        # pre-fold eviction: a returning user past the TTL gets a NaN carry
        # below, so their session ordinals restart at 1
        _evict_idle(st_last, (st_sess,), ttl_us, int(ts_us.max()))
        # within-batch previous event per user (vectorized); first rows pull
        # the carried-over last event time from state (NaN if user is new)
        prev = ts_us.groupby(uid.to_numpy()).shift(1)
        carry = uid.map(st_last)  # Series.map(dict): C-level lookup
        prev = prev.where(prev.notna(), carry)
        quebra = (prev.isna() | (ts_us - prev > gap_us)).astype("int64")
        base = uid.map(st_sess).fillna(0).astype("int64")
        sessao = base + quebra.groupby(uid.to_numpy()).cumsum()
        # fold each user's final (ts, session) back into the bucket state
        tail = ~uid.duplicated(keep="last")
        st_last.update(zip(uid[tail], ts_us[tail]))
        st_sess.update(zip(uid[tail], sessao[tail]))
        users = list(st_last)
        state.update(
            (
                [int(u) for u in users],
                [int(st_last[u]) for u in users],
                [int(st_sess[u]) for u in users],
            )
        )
        yield pd.DataFrame(
            {
                "user_id": uid,
                "event_id": batch["event_id"],
                "sessao": sessao.astype("int32"),
            }
        )

    return (
        events.withColumn("_bucket", F.pmod(F.hash("user_id"), F.lit(buckets)))
        .groupBy("_bucket")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, event_id long, sessao int",
            stateStructType="uids array<long>, last_us array<long>, sessao array<int>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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


def funnel_stream_bucketed(
    events: DataFrame, buckets: int = 512, ttl: str | None = None
) -> DataFrame:
    """Bucketed-dispatch variant of :func:`funnel_stream` (same rationale as
    :func:`sessionize_stream_bucketed`: ≤ ``buckets`` Python invocations per
    micro-batch instead of one per user, state packed as parallel arrays).

    The per-event Python loop is ALSO gone: given per-user ts-ordered
    arrival (the shared prerequisite), the stage machine reduces to three
    vectorized per-user passes per batch — first view = carried fv else the
    batch's min view ts; first qualifying click = carried fc else min click
    ts ≥ fv; stage 3 iff any purchase ts ≥ fc — because "first X after Y"
    under monotone arrival is a masked groupby-min, not a scan.  Emits the
    furthest stage per user seen in the batch (update semantics identical
    to the per-user operator).  ``ttl`` bounds state on unbounded streams
    with user churn (see :func:`_evict_idle`; a returning evicted user's
    funnel restarts at stage 0).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl_us = _ttl_us(ttl)

    def update(key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState):
        if state.exists:
            uids, fvs, fcs, stages, lasts = state.get
            st_fv = dict(zip(uids, fvs))
            st_fc = dict(zip(uids, fcs))
            st_stage = dict(zip(uids, stages))
            st_last = dict(zip(uids, lasts))
        else:
            st_fv, st_fc, st_stage, st_last = {}, {}, {}, {}
        batch = pd.concat(list(pdfs))
        uid = batch["user_id"]
        ts_us = batch["ts"].astype("datetime64[ns]").astype("int64") // 1000
        kind = batch["event_type"]
        # pre-fold eviction: a returning user past the TTL re-enters the
        # funnel at stage 0 (their carried fv/fc/stage are expired)
        _evict_idle(st_last, (st_fv, st_fc, st_stage), ttl_us, int(ts_us.max()))

        # pass 1 — first view per user: carried fv wins (it is <= any batch
        # ts under ordered arrival), else the batch's earliest view
        vmin = ts_us[kind == "view"].groupby(uid[kind == "view"].to_numpy()).min()
        fv = {
            **{u: t for u, t in vmin.items()},
            **{u: t for u, t in st_fv.items() if t >= 0},
        }
        # pass 2 — first click at/after the first view
        cmask = (kind == "click") & uid.map(fv).notna() & (ts_us >= uid.map(fv))
        cmin = ts_us[cmask].groupby(uid[cmask].to_numpy()).min()
        fc = {
            **{u: t for u, t in cmin.items()},
            **{u: t for u, t in st_fc.items() if t >= 0},
        }
        # pass 3 — any purchase at/after the first qualifying click
        pmask = (kind == "purchase") & uid.map(fc).notna() & (ts_us >= uid.map(fc))
        bought = set(uid[pmask])

        out_users = list(dict.fromkeys(uid))  # batch users, first-seen order
        etapas = []
        for u in out_users:
            stage = 3 if (u in bought or st_stage.get(u, 0) == 3) else (
                2 if u in fc else (1 if u in fv else 0)
            )
            stage = max(stage, st_stage.get(u, 0))
            st_fv[u] = int(fv.get(u, -1))
            st_fc[u] = int(fc.get(u, -1))
            st_stage[u] = stage
            etapas.append(stage)
        # last activity = the user's max batch ts (ANY event type counts as
        # activity, not just funnel-stage events)
        last_batch = ts_us.groupby(uid.to_numpy()).max()
        for u, t in last_batch.items():
            st_last[u] = max(st_last.get(u, -1), int(t))
        users = list(st_fv)
        state.update(
            (
                [int(u) for u in users],
                [int(st_fv[u]) for u in users],
                [int(st_fc[u]) for u in users],
                [int(st_stage[u]) for u in users],
                [int(st_last[u]) for u in users],
            )
        )
        yield pd.DataFrame({"user_id": out_users, "etapa": etapas}).astype(
            {"user_id": "int64", "etapa": "int32"}
        )

    return (
        events.withColumn("_bucket", F.pmod(F.hash("user_id"), F.lit(buckets)))
        .groupBy("_bucket")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, etapa int",
            stateStructType=(
                "uids array<long>, fv array<long>, fc array<long>, "
                "etapa array<int>, last_us array<long>"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
