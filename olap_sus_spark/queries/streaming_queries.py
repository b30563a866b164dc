"""Driver-registered streaming queries (rows compared against DuckDB SQL).

Each runs the full Structured Streaming machinery (file source → watermarked
stateful operator → memory sink) drained with Trigger.AvailableNow, then
returns the materialized result — so the driver's oracle gate verifies the
*streaming* path end-to-end, not a batch re-expression.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from olap_sus_spark.catalog import load_table
from olap_sus_spark.queries.events_windows import _TUMBLING_ORACLE
from olap_sus_spark.registry import register
from olap_sus_spark.streaming import (
    dedup_events_stream,
    read_event_stream,
    run_available_now,
    tumbling_counts,
)

_STAGED: dict[str, str] = {}


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The file stream source requires a *directory*; the driver fixture is a
    single parquet file.  Stage it once per sf_dir into a temp landing dir
    (batch rewrite also normalizes the nanos timestamp to micros)."""
    if sf_dir not in _STAGED:
        d = os.path.join(tempfile.mkdtemp(prefix="olap_sus_stream_"), "events")
        load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(d)
        _STAGED[sf_dir] = d
    return read_event_stream(spark, _STAGED[sf_dir])


@register("streaming_tumbling_window", oracle=_TUMBLING_ORACLE)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling counts, run as a stream (same oracle as
    the batch twin events_tumbling_window)."""
    return run_available_now(tumbling_counts(_events_stream(spark, sf_dir)), "complete")


_DEDUP_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
"""


@register("streaming_dedup", oracle=_DEDUP_ORACLE)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over a stream; the fixture has unique
    event ids, so the result must be exactly the input relation."""
    return run_available_now(dedup_events_stream(_events_stream(spark, sf_dir)), "append")


_SESSIONIZE_EVENTS_ORACLE = """
WITH d AS (
    SELECT user_id, event_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
),
m AS (
    SELECT user_id, event_id, ts,
           CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS quebra
    FROM d
)
SELECT user_id, event_id,
       CAST(SUM(quebra) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS INT) AS sessao
FROM m
"""


@register("streaming_sessionize", oracle=_SESSIONIZE_EVENTS_ORACLE)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session ids assigned by the stateful streaming operator
    (applyInPandasWithState), drained in one AvailableNow batch and
    hash-verified against the gaps-and-islands SQL."""
    from olap_sus_spark.streaming.streams import sessionize_stream

    return run_available_now(
        sessionize_stream(_events_stream(spark, sf_dir)), "append"
    )


@register("streaming_sessionize_bucketed", oracle=_SESSIONIZE_EVENTS_ORACLE)
def streaming_sessionize_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same sessionization, bucketed dispatch: state groups are hash
    buckets of users with vectorized per-bucket processing — ≤ buckets
    Python invocations per micro-batch instead of one per user (the
    measured applyInPandasWithState cost ceiling; ×100 probe in PLANS.md).
    Identical output, identical oracle."""
    from olap_sus_spark.streaming.streams import sessionize_stream_bucketed

    return run_available_now(
        sessionize_stream_bucketed(_events_stream(spark, sf_dir)), "append"
    )


_FUNNEL_STAGES_ORACLE = """
WITH v AS (SELECT user_id, MIN(ts) AS t_view
           FROM events WHERE event_type = 'view' GROUP BY user_id),
     c AS (SELECT e.user_id, MIN(e.ts) AS t_click
           FROM events e JOIN v ON v.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts >= v.t_view
           GROUP BY e.user_id),
     p AS (SELECT e.user_id, MIN(e.ts) AS t_buy
           FROM events e JOIN c ON c.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
           GROUP BY e.user_id)
SELECT u.user_id,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1
            ELSE 0 END AS etapa
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
"""


@register("streaming_funnel_stages", oracle=_FUNNEL_STAGES_ORACLE)
def streaming_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user furthest funnel stage from the streaming stage machine,
    hash-verified against the chained-aggregate SQL."""
    from olap_sus_spark.streaming.streams import funnel_stream

    return run_available_now(
        funnel_stream(_events_stream(spark, sf_dir)), "update"
    )


@register("streaming_funnel_bucketed", oracle=_FUNNEL_STAGES_ORACLE)
def streaming_funnel_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same funnel stage machine, bucketed dispatch + fully vectorized
    per-batch passes (no per-event Python) — see
    streams.funnel_stream_bucketed.  Identical output, identical oracle."""
    from olap_sus_spark.streaming.streams import funnel_stream_bucketed

    return run_available_now(
        funnel_stream_bucketed(_events_stream(spark, sf_dir)), "update"
    )


# --------------------------------------------------------------------------
# Stream-stream interval join: the watermarked two-sided join is the one
# streaming shape the batch-registered interval_join_attribution doesn't
# exercise end-to-end.  Both sides come from the same staged file source
# (a stream self-join); watermarks bound the click-side state to
# watermark + horizon at real scale.  Same oracle as the batch twin.
# --------------------------------------------------------------------------
from olap_sus_spark.queries.relational_ext import _INTERVAL_ORACLE  # noqa: E402


@register("streaming_interval_join", oracle=_INTERVAL_ORACLE)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases stream ⋈ clicks stream on (user_id, 1-hour range) with
    watermarks on both event-time columns, drained AvailableNow and
    hash-verified against the batch interval-join SQL."""
    from pyspark.sql import functions as F

    from olap_sus_spark.streaming.streams import interval_join_attribution as ij

    ev = _events_stream(spark, sf_dir)
    return run_available_now(
        ij(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
            horizon="1 hour",
        ),
        "append",
    )


# --------------------------------------------------------------------------
# Stream-static enrichment: the standard "facts stream in, dimensions sit
# in the warehouse" join.  The static side is broadcast per micro-batch
# (re-read each trigger, so a dimension update is picked up without
# restarting the query); the stream side never shuffles.
# --------------------------------------------------------------------------
_ENRICH_ORACLE = """
SELECT e.event_id, e.user_id, e.event_type, c.c_name AS cliente,
       c.c_mktsegment AS segmento
FROM events e JOIN customer c ON c.c_custkey = e.user_id
"""


@register("streaming_dim_enrich", oracle=_ENRICH_ORACLE)
def streaming_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event stream enriched with the static customer dimension (broadcast
    stream-static equi-join), drained AvailableNow."""
    from pyspark.sql import functions as F

    ev = _events_stream(spark, sf_dir)
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey"), F.col("c_name"), F.col("c_mktsegment")
        )
    )
    joined = ev.join(cust, ev.user_id == cust.c_custkey).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("c_name").alias("cliente"),
        F.col("c_mktsegment").alias("segmento"),
    )
    return run_available_now(joined, "append")


_FACT_STAGED: dict[str, str] = {}


@register(
    "streaming_fact_ingest_loop",
    oracle="""
SELECT
    CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ano,
    CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mes,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS valor_total,
    CAST(COUNT(*) AS BIGINT) AS n_itens
FROM lineitem
GROUP BY 1, 2
""",
)
def streaming_fact_ingest_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ingest→refresh→serve loop for the fact summaries, run as a
    STREAM: lineitem is split into a pre-loaded corpus (≤1995) plus two
    landing drops, drained through stream_lineitem_ingest (two real
    micro-batches, exactly-once appends, refresh_fact_summaries inside
    each batch), then the maintained revenue rollup is SERVED from the
    streamed corpus.  The oracle recomputes from the ORIGINAL lineitem —
    equality proves drops landed exactly once and every in-stream refresh
    left the maintained table identical to a full recompute."""
    import shutil

    from pyspark.sql import functions as F

    from olap_sus_spark.queries.incremental import incremental_revenue_by_month
    from olap_sus_spark.streaming.facts import stream_lineitem_ingest

    if sf_dir not in _FACT_STAGED:
        base = tempfile.mkdtemp(prefix="olap_sus_factstream_")
        corpus = os.path.join(base, "corpus")
        landing = os.path.join(base, "landing")
        os.makedirs(corpus)
        os.makedirs(landing)
        for t in ("orders", "supplier"):
            src = os.path.join(sf_dir, f"{t}.parquet")
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(
                src, os.path.join(corpus, f"{t}.parquet")
            )
        li = load_table(spark, sf_dir, "lineitem")
        li.filter(F.year("l_shipdate") <= 1995).coalesce(1).write.parquet(
            os.path.join(corpus, "lineitem.parquet")
        )
        rest = li.filter(F.year("l_shipdate") > 1995)
        for i, part in enumerate(
            (rest.filter(F.year("l_shipdate") <= 1998),
             rest.filter(F.year("l_shipdate") > 1998))
        ):
            tmp = os.path.join(base, f"tmp{i}")
            part.coalesce(1).write.parquet(tmp)
            src = next(
                f for f in os.listdir(tmp)
                if f.startswith("part-") and f.endswith(".parquet")
            )
            os.rename(os.path.join(tmp, src), os.path.join(landing, f"drop_{i}.parquet"))
            shutil.rmtree(tmp, ignore_errors=True)
        stream_lineitem_ingest(
            spark, landing, corpus, os.path.join(base, "ck"), max_files_per_trigger=1
        )
        _FACT_STAGED[sf_dir] = corpus
    return incremental_revenue_by_month(spark, _FACT_STAGED[sf_dir])
