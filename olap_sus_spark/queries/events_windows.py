"""Event-time windowing over the ``events`` table.

The reference has no streaming surface (SURVEY.md §2.9) — its temporal
incrementality is daily batch partitions.  These queries are the engine's
forward-looking extension: the same event-time semantics Structured
Streaming uses (tumbling windows, session windows, analytic frames),
expressed here in batch so the DuckDB oracle can verify them; the streaming
module (olap_sus_spark.streaming) reuses the identical expressions over
``readStream``.

Double-typed ``value`` is never summed (float addition is
order-dependent → hash-unstable across engines); windows aggregate with
count/min/max, which are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_sus_spark.catalog import load_table
from olap_sus_spark.queries._util import dec
from olap_sus_spark.registry import register

# --------------------------------------------------------------------------
# Tumbling event-time window: 1-hour buckets per event_type.
# Streaming twin: readStream + withWatermark("ts", ...) + same groupBy.
# --------------------------------------------------------------------------
_TUMBLING_ORACLE = """
SELECT
    event_type,
    date_trunc('hour', ts) AS hora,
    COUNT(*) AS n_eventos,
    MIN(value) AS menor_valor,
    MAX(value) AS maior_valor
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


@register("events_tumbling_window", oracle=_TUMBLING_ORACLE)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
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


# --------------------------------------------------------------------------
# Sliding (hopping) event-time window: 1-hour windows every 15 minutes —
# each event lands in exactly 4 overlapping windows.  Spark aligns window
# starts to epoch multiples of the slide; the oracle reproduces that with
# time_bucket (epoch-aligned at 15-min granularity) minus k slides.
# Streaming twin: streaming/streams.py:sliding_counts (same expressions).
# --------------------------------------------------------------------------
_SLIDING_ORACLE = """
SELECT event_type,
       time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS inicio,
       COUNT(*) AS n_eventos
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) ks
GROUP BY 1, 2
"""


@register("events_sliding_window", oracle=_SLIDING_ORACLE)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_eventos"))
        .select("event_type", F.col("w.start").alias("inicio"), "n_eventos")
    )


# --------------------------------------------------------------------------
# Session windows: per-user sessions with a 30-minute inactivity gap.
# Spark merges windows [ts, ts+gap) that overlap, so two consecutive events
# share a session iff their gap is STRICTLY less than 30 minutes — the
# oracle's gaps-and-islands flag uses the same strict inequality.
# --------------------------------------------------------------------------
_SESSION_ORACLE = """
WITH flagged AS (
    SELECT
        user_id, ts,
        CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  < INTERVAL 30 MINUTE
             THEN 0 ELSE 1 END AS nova_sessao
    FROM events
), numbered AS (
    SELECT user_id, ts,
           SUM(nova_sessao) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id, MIN(ts) AS inicio_sessao, COUNT(*) AS n_eventos
FROM numbered
GROUP BY user_id, sid
"""


@register("events_session_window", oracle=_SESSION_ORACLE)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_eventos"))
        .select(
            "user_id",
            F.col("w.start").alias("inicio_sessao"),
            "n_eventos",
        )
    )


# --------------------------------------------------------------------------
# Analytic frames: lag + running decimal total per customer over order
# history (rowsBetween UNBOUNDED PRECEDING..CURRENT ROW).  Exact decimal
# arithmetic keeps the running sum order-independent bit-for-bit; the
# (date, orderkey) sort key is unique so the frame is deterministic.
# --------------------------------------------------------------------------
_RUNNING_ORACLE = """
SELECT
    o_custkey,
    o_orderkey,
    CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS DOUBLE) AS preco_anterior,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS total_acumulado
FROM orders
"""


@register("running_total_frames", oracle=_RUNNING_ORACLE)
def running_total_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag(dec("o_totalprice")).over(w).cast("double").alias("preco_anterior"),
        F.sum(dec("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("total_acumulado"),
    )
