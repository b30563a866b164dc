"""Behavioral / change-history operators over the events stream.

Two shapes every warehouse outgrowing the reference needs next, neither of
which the reference can express (its only temporal logic is daily batch
partitions — SURVEY.md §2.9):

- **Ordered funnel** (view → click → purchase): staged conversion counts
  where each stage must happen at-or-after the previous stage's first
  qualifying event.
- **SCD Type 2 from a change log**: collapse an event stream into
  validity-interval dimension rows (valid_from / valid_to / is_current) —
  the standard Kimball slowly-changing-dimension build, done as a pure
  DataFrame transform instead of the reference's overwrite-only dims
  (/root/reference/scripts/init.sql keeps no history anywhere).

Both are single-shuffle on ``user_id``: every window/group in the plan
shares that partitioning, so at 100 TB the cost is one exchange of the
events table, no matter how many window passes follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_sus_spark.catalog import load_table
from olap_sus_spark.registry import register

# --------------------------------------------------------------------------
# Ordered funnel.  Stage semantics (inclusive, ts-based):
#   view     — user has ≥1 'view'
#   click    — user has a 'click' at ts >= their first view
#   purchase — user has a 'purchase' at ts >= their first qualifying click
# The oracle states it as three chained aggregate-joins; the Spark plan is
# ONE shuffle: a running-min window over (user_id RANGE ts) computes "first
# view so far" / "first qualifying click so far" per row, so a row knows its
# stage eligibility without self-joins.  RANGE (not ROWS) framing makes
# equal-ts events mutually visible, matching the oracle's `>=` exactly.
# --------------------------------------------------------------------------
_FUNNEL_ORACLE = """
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
SELECT 'view' AS etapa, (SELECT COUNT(*) FROM v) AS usuarios
UNION ALL
SELECT 'click', (SELECT COUNT(*) FROM c)
UNION ALL
SELECT 'purchase', (SELECT COUNT(*) FROM p)
"""


@register("funnel_stage_counts", oracle=_FUNNEL_ORACLE)
def funnel_stage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RANGE framing needs a numeric key; session TZ is pinned UTC
    # (session.py), so the NTZ→TIMESTAMP cast is an exact micros reading.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_view = F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w)
    staged = ev.withColumn(
        "qual_click",
        F.when((F.col("event_type") == "click") & first_view.isNotNull(), F.col("ts_us")),
    )
    first_qclick = F.min("qual_click").over(w)
    staged = staged.withColumn(
        "qual_buy",
        F.when(
            (F.col("event_type") == "purchase") & first_qclick.isNotNull(),
            F.col("ts_us"),
        ),
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1)).alias("viu"),
        F.min("qual_click").alias("t_click"),
        F.min("qual_buy").alias("t_buy"),
    )
    counts = per_user.agg(
        F.count("viu").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_buy").alias("n_buy"),
    )
    return counts.select(
        F.explode(
            F.array(
                F.struct(F.lit("view").alias("etapa"), F.col("n_view").alias("usuarios")),
                F.struct(F.lit("click").alias("etapa"), F.col("n_click").alias("usuarios")),
                F.struct(F.lit("purchase").alias("etapa"), F.col("n_buy").alias("usuarios")),
            )
        ).alias("linha")
    ).select("linha.etapa", "linha.usuarios")


# --------------------------------------------------------------------------
# SCD Type 2 build from a change log.  Treat each user's event stream as an
# attribute-change log (the attribute being event_type = the user's latest
# activity state); emit one row per constant-state run with its validity
# interval — gaps-and-islands via LAG, then LEAD for the closing bound.
# Deterministic total order (ts, event_id); is_current as int (0/1) for
# portable hashing.  Both windows share (user_id) partitioning → 1 shuffle.
# --------------------------------------------------------------------------
_SCD2_ORACLE = """
WITH d AS (
    SELECT user_id, ts, event_id, event_type AS estado,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS anterior
    FROM events
),
chg AS (
    SELECT user_id, ts, event_id, estado FROM d
    WHERE anterior IS NULL OR estado <> anterior
)
SELECT user_id, estado, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL THEN 1 ELSE 0 END AS is_current
FROM chg
"""


@register("scd2_user_status", oracle=_SCD2_ORACLE)
def scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("event_type").alias("estado")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = ev.withColumn("anterior", F.lag("estado").over(w)).filter(
        F.col("anterior").isNull() | (F.col("estado") != F.col("anterior"))
    )
    nxt = F.lead("ts").over(w)
    return chg.select(
        "user_id",
        "estado",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


# --------------------------------------------------------------------------
# Gap-based sessionization with explicit session IDs — the batch complement
# of streaming/streams.py:session_counts (Spark's session_window gives the
# aggregate but not a stable per-event session id).  Classic gaps-and-
# islands: a session break is a >30-min silence; the running sum of breaks
# IS the session ordinal.  Both windows and the closing groupBy share the
# (user_id) partitioning → one shuffle end-to-end at any scale.
# --------------------------------------------------------------------------
_SESSIONIZE_ORACLE = """
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
),
s AS (
    SELECT user_id, ts,
           SUM(quebra) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sessao
    FROM m
)
SELECT user_id, CAST(sessao AS INT) AS sessao,
       MIN(ts) AS inicio, MAX(ts) AS fim,
       COUNT(*) AS n_eventos,
       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duracao_s
FROM s GROUP BY user_id, sessao
"""


@register("sessionize_events", oracle=_SESSIONIZE_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    marked = ev.withColumn(
        "quebra",
        F.when(prev_us.isNull() | (ts_us - prev_us > gap_us), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "sessao",
        F.sum("quebra")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    # date_diff('second', a, b) counts second-BOUNDARY crossings, not
    # truncated elapsed time: floor each endpoint to epoch seconds first
    # (micros are positive, so `div` == floor), then difference.
    def _sec(c):
        return F.expr(f"unix_micros(cast({c} as timestamp)) div 1000000")

    return sess.groupBy("user_id", "sessao").agg(
        F.min("ts").alias("inicio"),
        F.max("ts").alias("fim"),
        F.count(F.lit(1)).alias("n_eventos"),
        (_sec("max(ts)") - _sec("min(ts)")).alias("duracao_s"),
    )


# --------------------------------------------------------------------------
# Retention cohort matrix — users grouped by first-seen day, counted on each
# later active day (the (cohort, age) triangle every growth dashboard draws).
# Cohort assignment and the distinct-activity grain both shuffle on user_id
# (co-partitioned join); the final aggregation collapses to a
# calendar-bounded matrix (≤ |days|² cells) however large the source is.
# --------------------------------------------------------------------------
_COHORT_ORACLE = """
WITH primeiro AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS coorte
    FROM events GROUP BY user_id
),
atividade AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS dia FROM events
)
SELECT p.coorte,
       CAST(date_diff('day', p.coorte, a.dia) AS INT) AS idade_dias,
       COUNT(*) AS usuarios_ativos
FROM atividade a
JOIN primeiro p ON p.user_id = a.user_id
GROUP BY 1, 2
"""


@register("retention_cohorts", oracle=_COHORT_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("dia")
    )
    primeiro = ev.groupBy("user_id").agg(F.min("dia").alias("coorte"))
    atividade = ev.distinct()
    return (
        atividade.join(primeiro, "user_id")
        .groupBy(
            "coorte", F.datediff("dia", "coorte").alias("idade_dias")
        )
        .agg(F.count(F.lit(1)).alias("usuarios_ativos"))
    )


# --------------------------------------------------------------------------
# Rolling active users (DAU / trailing-7-day WAU).  The oracle states WAU
# as a BETWEEN range join; the Spark plan avoids the nested-loop that range
# join would cost by EXPLODING each (user, day) activity row into the ≤7
# report days it contributes to — a narrow generator — then counting
# distinct users per report day.  Both formulations count a user toward
# day D iff they were active in [D-6, D].  Report days are restricted to
# days with actual activity (semi-join with the DAU grain) so the two
# shapes emit identical rows.  Shuffles: activity distinct + per-day
# count-distinct — both on bounded grains.
# --------------------------------------------------------------------------
_ACTIVE_ORACLE = """
WITH atividade AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS dia FROM events
),
dau AS (SELECT dia, COUNT(*) AS dau FROM atividade GROUP BY dia),
wau AS (
    SELECT c.dia, COUNT(DISTINCT a.user_id) AS wau
    FROM (SELECT dia FROM dau) c
    JOIN atividade a ON a.dia BETWEEN c.dia - 6 AND c.dia
    GROUP BY c.dia
)
SELECT d.dia, d.dau, w.wau
FROM dau d JOIN wau w ON w.dia = d.dia
"""


@register("rolling_active_users", oracle=_ACTIVE_ORACLE)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("dia")
    )
    atividade = ev.distinct()
    dau = atividade.groupBy("dia").agg(F.count(F.lit(1)).alias("dau"))
    contrib = atividade.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("delta"),
        F.col("dia").alias("dia_atividade"),
    ).select("user_id", F.date_add("dia_atividade", F.col("delta")).alias("dia"))
    wau = (
        contrib.join(F.broadcast(dau.select("dia")), "dia", "left_semi")
        .groupBy("dia")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "dia").select("dia", "dau", "wau")


# --------------------------------------------------------------------------
# Sequence-pattern detection (MATCH_RECOGNIZE-lite): users whose ordered
# event stream contains an 'error' followed by a 'signup' within the next
# 3 events.  The stream collapses to one ordered array per user (same
# collect+sort shape as the reference's bridge signature, SURVEY §2.4-A2);
# the pattern test is a pure array expression — EXISTS over positions —
# evaluated engine-side with no joins.  One shuffle (the per-user collect).
# --------------------------------------------------------------------------
_SEQPAT_ORACLE = """
WITH seq AS (
    SELECT user_id,
           list_transform(
               list_sort(list_zip(
                   list(ts ORDER BY ts, event_id),
                   list(event_id ORDER BY ts, event_id),
                   list(event_type ORDER BY ts, event_id))),
               p -> p[3]) AS tipos
    FROM events GROUP BY user_id
)
SELECT user_id, len(tipos) AS n_eventos
FROM seq
WHERE len(list_filter(range(1, len(tipos) + 1),
          i -> tipos[i] = 'error'
               AND len(list_filter(range(i + 1, least(i + 4, len(tipos) + 1)),
                       j -> tipos[j] = 'signup')) > 0)) > 0
"""


@register("sequence_pattern_users", oracle=_SEQPAT_ORACLE)
def sequence_pattern_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda p: p["event_type"],
        ).alias("tipos")
    )
    n = F.size("tipos")
    # the lookahead uses slice (which CLAMPS at the array end) rather than
    # index arithmetic: element_at beyond the end throws under ANSI mode —
    # hit in the 100x scale probe when a user's LAST event is 'error'
    # (sequence(i+1, least(i+3, n)) turns descending and walks off the end)
    hit = F.exists(
        F.sequence(F.lit(1), n),
        lambda i: (F.element_at(F.col("tipos"), i) == "error")
        & F.exists(
            F.slice(F.col("tipos"), i + 1, 3),
            lambda x: x == "signup",
        ),
    )
    return seq.filter(hit).select("user_id", n.alias("n_eventos"))


# --------------------------------------------------------------------------
# Point-in-time (effective-dated) dimension join — every purchase enriched
# with the SCD2 status interval valid AT ITS TIMESTAMP ([valid_from,
# valid_to) semantics).  The oracle states it as the textbook BETWEEN
# interval join; the Spark plan avoids that (it would be a nested loop) by
# UNIONING interval-open rows with facts and taking last(ignorenulls) over
# (user, ts) — the as-of trick (relational_ext.asof_join_purchase_click),
# so the whole join is ONE shuffle on user_id.  Interval opens sort before
# facts at equal ts, matching `>= valid_from` inclusively.
# --------------------------------------------------------------------------
_PIT_ORACLE = """
WITH dim AS (
    SELECT user_id, estado, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
    FROM (
        SELECT user_id, ts, event_id, event_type AS estado,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS anterior
        FROM events
    ) WHERE anterior IS NULL OR estado <> anterior
),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts, d.estado AS estado_vigente
FROM p
JOIN dim d ON d.user_id = p.user_id
          AND p.ts >= d.valid_from
          AND (d.valid_to IS NULL OR p.ts < d.valid_to)
"""


@register("point_in_time_status", oracle=_PIT_ORACLE)
def point_in_time_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Change rows re-derived WITH their source event_id (scd2_user_status
    # drops it from its output): two changes at an identical ts must
    # tie-break on event_id, matching the oracle's interval join where the
    # later (ts, event_id) change wins and the earlier gets a zero-width
    # interval.  The window orders by (ts, kind, ord) with ord = the source
    # event_id on BOTH arms, so the resolution is fully deterministic.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("event_type").alias("estado")
    )
    wd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.withColumn("anterior", F.lag("estado").over(wd))
        .filter(F.col("anterior").isNull() | (F.col("estado") != F.col("anterior")))
        .select("user_id", "ts", "event_id", "estado")
    )
    facts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    tagged = dim.select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
        "estado", F.lit(0).alias("kind"), F.col("event_id").alias("ord"),
    ).unionByName(
        facts.select(
            "user_id", "ts", "event_id",
            F.lit(None).cast("string").alias("estado"), F.lit(1).alias("kind"),
            F.col("event_id").alias("ord"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vigente = F.last(F.when(F.col("kind") == 0, F.col("estado")), ignorenulls=True)
    return (
        tagged.withColumn("estado_vigente", vigente.over(w))
        .filter(F.col("kind") == 1)
        .select("event_id", "user_id", "ts", "estado_vigente")
    )


# --------------------------------------------------------------------------
# Top navigation paths — the most common event-type sequences per session
# (product-analytics "user flows").  Composite of gap-sessionization and
# the ordered-collect shape (bridge signatures, SURVEY §2.4-A2): each
# session's events concatenate in (ts, event_id) order into a path string;
# paths are counted and top-10 ranked with a deterministic tie-break.
# Session assignment + path build share the user_id exchange; the path
# count is a second, tiny aggregation.
# --------------------------------------------------------------------------
_PATHS_ORACLE = """
WITH d AS (
    SELECT user_id, event_id, ts, event_type,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
),
s AS (
    SELECT user_id, event_id, ts, event_type,
           SUM(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sessao
    FROM d
),
caminhos AS (
    SELECT user_id, sessao,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS caminho
    FROM s GROUP BY user_id, sessao
)
SELECT caminho, n, posicao FROM (
    SELECT caminho, COUNT(*) AS n,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, caminho) AS INT)
           AS posicao
    FROM caminhos GROUP BY caminho
) WHERE posicao <= 10
"""


@register("top_session_paths", oracle=_PATHS_ORACLE)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    s = ev.withColumn(
        "sessao",
        F.sum(
            F.when(prev_us.isNull() | (ts_us - prev_us > gap_us), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    caminhos = s.groupBy("user_id", "sessao").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda p: p["event_type"],
            ),
        ).alias("caminho")
    )
    contagem = caminhos.groupBy("caminho").agg(F.count(F.lit(1)).alias("n"))
    # top-10 FIRST (TakeOrderedAndProject: per-partition partial top-k, only
    # 10 rows cross), THEN rank the bounded survivors — a bare global
    # row_number here would funnel every distinct path through one task
    wr = Window.orderBy(F.col("n").desc(), "caminho")
    return (
        contagem.orderBy(F.col("n").desc(), "caminho")
        .limit(10)
        .withColumn("posicao", F.row_number().over(wr).cast("int"))
        .select("caminho", "n", "posicao")
    )


# --------------------------------------------------------------------------
# First-order Markov transition matrix over per-user event sequences: the
# navigation-model summary recommendation/anomaly pipelines start from.
# One shuffle on user_id (the module's standing shape); the probability is
# one IEEE division of two exact BIGINTs — bit-identical across engines.
# --------------------------------------------------------------------------
_TRANSITION_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS proximo
    FROM events
),
pares AS (
    SELECT event_type AS origem, proximo AS destino,
           CAST(COUNT(*) AS BIGINT) AS n_trans
    FROM seq WHERE proximo IS NOT NULL
    GROUP BY origem, destino
)
SELECT origem, destino, n_trans,
       CAST(n_trans AS DOUBLE)
           / CAST(SUM(n_trans) OVER (PARTITION BY origem) AS DOUBLE) AS prob
FROM pares
"""


@register("event_transition_matrix", oracle=_TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(origem → destino) transition counts and row-conditional
    probabilities over each user's (ts, event_id)-ordered event stream.
    lead() is per-user (partitioned window, distributes across the key
    space); the |types|² matrix that follows is dimension-bounded.  The
    event_id tie-break makes equal-ts sequences deterministic on both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("proximo")
    ).filter(F.col("proximo").isNotNull())
    pares = seq.groupBy(
        F.col("event_type").alias("origem"), F.col("proximo").alias("destino")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    w_o = Window.partitionBy("origem")
    return pares.select(
        "origem",
        "destino",
        "n_trans",
        (
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(w_o).cast("double")
        ).alias("prob"),
    )
