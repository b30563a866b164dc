"""Time-series repair + snapshot reconciliation operators.

Three shapes a warehouse needs once data arrives continuously (the
reference's only notion of time is an append-only ``dt=`` folder —
SURVEY.md §2.9):

- **Calendar gap fill**: densify a daily series to the full calendar with
  zeros — the precondition for any window/rolling computation downstream.
- **Linear interpolation**: reconstruct missing values between known
  points (sensor/metric repair) via last/next-known windows + lerp.
- **Snapshot diff**: added/removed/changed rows between two table
  versions — the reconciliation step of every CDC / backfill pipeline,
  as one co-partitioned full-outer join.

The calendar frames are bounded by the calendar (|days| rows however big
the facts), so their single-partition windows are not scale hazards; the
snapshot diff shuffles each side once on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_sus_spark.catalog import load_table
from olap_sus_spark.queries._util import dec
from olap_sus_spark.registry import register

# --------------------------------------------------------------------------
# Calendar gap fill — left join the dense day sequence (derived from the
# series' own bounds) against the aggregated daily counts, zero-filling
# holes.  The calendar generates from a 1-row bounds aggregate → broadcast.
# --------------------------------------------------------------------------
_GAPFILL_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS dia, COUNT(*) AS n
    FROM orders GROUP BY 1
),
lim AS (SELECT MIN(dia) AS d0, MAX(dia) AS d1 FROM daily),
cal AS (
    SELECT CAST(unnest(generate_series(lim.d0, lim.d1, INTERVAL 1 DAY)) AS DATE)
           AS dia
    FROM lim
)
SELECT c.dia, COALESCE(d.n, 0) AS pedidos
FROM cal c LEFT JOIN daily d ON d.dia = c.dia
"""


@register("gap_fill_daily", oracle=_GAPFILL_ORACLE)
def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("dia")).agg(
        F.count(F.lit(1)).alias("n")
    )
    lim = daily.agg(F.min("dia").alias("d0"), F.max("dia").alias("d1"))
    cal = lim.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("dia")
    )
    return cal.join(daily, "dia", "left").select(
        "dia", F.coalesce("n", F.lit(0)).alias("pedidos")
    )


# --------------------------------------------------------------------------
# Linear interpolation over a sparse daily series.  A deterministic
# sparsity rule (day-of-month % 3 == 1 keeps the observation) simulates a
# sensor that reports every third day; the operator reconstructs the rest:
#   prev/next known value+day via last/first(ignorenulls) frames,
#   value = prev + (next - prev) * (day - prev_day) / (next_day - prev_day)
# Ends extrapolate flat (prev-only / next-only).  The lerp is IEEE double
# arithmetic on exact operands (decimal-sourced values, int day deltas) —
# bit-identical in both engines.
# --------------------------------------------------------------------------
_INTERP_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS dia,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS receita
    FROM orders GROUP BY 1
),
obs AS (
    SELECT dia,
           CASE WHEN EXTRACT(DAY FROM dia) % 3 = 1 THEN receita END AS valor,
           CASE WHEN EXTRACT(DAY FROM dia) % 3 = 1
                THEN CAST(date_diff('day', DATE '1970-01-01', dia) AS BIGINT)
           END AS dia_obs,
           CAST(date_diff('day', DATE '1970-01-01', dia) AS BIGINT) AS dia_num
    FROM daily
),
marked AS (
    SELECT dia, dia_num, valor,
           LAST_VALUE(valor IGNORE NULLS) OVER (
               ORDER BY dia_num ROWS UNBOUNDED PRECEDING) AS v_prev,
           LAST_VALUE(dia_obs IGNORE NULLS) OVER (
               ORDER BY dia_num ROWS UNBOUNDED PRECEDING) AS d_prev,
           FIRST_VALUE(valor IGNORE NULLS) OVER (
               ORDER BY dia_num ROWS BETWEEN CURRENT ROW
               AND UNBOUNDED FOLLOWING) AS v_next,
           FIRST_VALUE(dia_obs IGNORE NULLS) OVER (
               ORDER BY dia_num ROWS BETWEEN CURRENT ROW
               AND UNBOUNDED FOLLOWING) AS d_next
    FROM obs
)
SELECT dia,
       CASE WHEN valor IS NOT NULL THEN valor
            WHEN v_prev IS NULL THEN v_next
            WHEN v_next IS NULL THEN v_prev
            ELSE v_prev + (v_next - v_prev)
                 * ((dia_num - d_prev) / CAST(d_next - d_prev AS DOUBLE))
       END AS valor_interp,
       CASE WHEN valor IS NOT NULL THEN 0 ELSE 1 END AS interpolado
FROM marked
"""


@register("interpolate_daily_revenue", oracle=_INTERP_ORACLE)
def interpolate_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("dia")).agg(
        F.sum(dec("o_totalprice")).cast("double").alias("receita")
    )
    known = F.dayofmonth("dia") % 3 == 1
    obs = daily.select(
        "dia",
        F.when(known, F.col("receita")).alias("valor"),
        F.when(known, F.unix_date("dia").cast("bigint")).alias("dia_obs"),
        F.unix_date("dia").cast("bigint").alias("dia_num"),
    )
    wp = Window.orderBy("dia_num").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("dia_num").rowsBetween(0, Window.unboundedFollowing)
    marked = obs.select(
        "dia",
        "dia_num",
        "valor",
        F.last("valor", ignorenulls=True).over(wp).alias("v_prev"),
        F.last("dia_obs", ignorenulls=True).over(wp).alias("d_prev"),
        F.first("valor", ignorenulls=True).over(wn).alias("v_next"),
        F.first("dia_obs", ignorenulls=True).over(wn).alias("d_next"),
    )
    frac = (F.col("dia_num") - F.col("d_prev")) / (
        F.col("d_next") - F.col("d_prev")
    ).cast("double")
    interp = (
        F.when(F.col("valor").isNotNull(), F.col("valor"))
        .when(F.col("v_prev").isNull(), F.col("v_next"))
        .when(F.col("v_next").isNull(), F.col("v_prev"))
        .otherwise(F.col("v_prev") + (F.col("v_next") - F.col("v_prev")) * frac)
    )
    return marked.select(
        "dia",
        interp.alias("valor_interp"),
        F.when(F.col("valor").isNotNull(), 0).otherwise(1).alias("interpolado"),
    )


# --------------------------------------------------------------------------
# Snapshot diff (reconciliation).  Snapshot B derives from orders by
# deterministic rules both engines apply identically: every 97th key is
# deleted, every 11th has its status rewritten, every 101st is re-inserted
# under a shifted key.  The diff is ONE full-outer equi-join on the key —
# each side shuffles once, co-partitioned — emitting only drift rows.
# --------------------------------------------------------------------------
_DIFF_ORACLE = """
WITH a AS (
    SELECT o_orderkey, o_orderstatus AS st, o_totalprice AS preco FROM orders
),
b AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS st,
           o_totalprice AS preco
    FROM orders WHERE o_orderkey % 97 != 0
    UNION ALL
    SELECT o_orderkey + 30000000, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 101 = 0
)
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS mudanca
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
   OR a.st != b.st OR a.preco != b.preco
"""


@register("snapshot_diff", oracle=_DIFF_ORACLE)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select(
        "o_orderkey", F.col("o_orderstatus").alias("st"), F.col("o_totalprice").alias("preco")
    )
    b = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 11 == 0, "X")
            .otherwise(F.col("o_orderstatus"))
            .alias("st"),
            F.col("o_totalprice").alias("preco"),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 30000000).alias("o_orderkey"),
                F.col("o_orderstatus").alias("st"),
                F.col("o_totalprice").alias("preco"),
            )
        )
    )
    al, bl = a.alias("a"), b.alias("b")
    joined = al.join(bl, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    return joined.filter(
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.st") != F.col("b.st"))
        | (F.col("a.preco") != F.col("b.preco"))
    ).select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .otherwise("changed")
        .alias("mudanca"),
    )


# --------------------------------------------------------------------------
# Exponential time-decay scoring — "what's trending" with EXACT arithmetic.
# Weights are powers of two over WEEK buckets (half-life = 1 week, horizon
# 8 weeks), so the decayed sum is pure BIGINT: q · 2^(8−weeks_ago) summed,
# then normalized by 2^8 — a dyadic division both engines perform exactly
# in IEEE doubles.  The usual float pow(λ, age) pipeline can never be
# bit-matched across engines (summation order); the dyadic form can, which
# is what lets the driver gate hash-check a DECAYED metric at all.  The
# anchor (max ship date) is one scalar aggregate collected driver-side —
# bounded — so the 8-week filter reaches the scan as a plain range
# predicate (pushdown, partition pruning on a dt-partitioned lake).
# --------------------------------------------------------------------------
_DECAY_ORACLE = """
WITH anchor AS (SELECT MAX(CAST(l_shipdate AS DATE)) AS mx FROM lineitem),
src AS (
    SELECT p.p_brand,
           CAST(FLOOR(l.l_quantity) AS BIGINT) AS q,
           date_diff('day', CAST(l.l_shipdate AS DATE), a.mx) // 7 AS w
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    CROSS JOIN anchor a
)
SELECT p_brand,
       CAST(SUM(q * (1 << (8 - w))) AS BIGINT) AS decayed_score,
       CAST(SUM(q * (1 << (8 - w))) AS BIGINT) / 256.0 AS decayed_norm
FROM src WHERE w <= 8
GROUP BY p_brand
"""


@register("decayed_brand_popularity", oracle=_DECAY_ORACLE)
def decayed_brand_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted brand popularity: each lineitem's quantity counts
    at weight 2^(8−weeks_ago) relative to the newest ship date, i.e. it
    halves every week and drops out after 8 — the trending-score shape
    (recency-weighted source/popularity ranking in a training-data
    pipeline) with every weight a power of two so the fold stays in
    BIGINT and the oracle replays it bit-for-bit.  The part dim
    broadcasts; the week filter is a range predicate on l_shipdate at the
    scan."""
    import datetime

    li = load_table(spark, sf_dir, "lineitem")
    anchor = li.agg(F.max(F.to_date("l_shipdate"))).first()[0]  # 1-row scalar
    start = anchor - datetime.timedelta(days=9 * 7)  # covers w <= 8 fully
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    src = (
        li.filter(F.col("l_shipdate") >= F.lit(str(start)).cast("timestamp"))
        .select(
            "l_partkey",
            # floor, not a bare cast: ANSI cast truncates, DuckDB rounds
            F.floor("l_quantity").cast("bigint").alias("q"),
            F.expr(
                f"datediff(DATE'{anchor}', to_date(l_shipdate)) DIV 7"
            ).alias("w"),
        )
        .filter(F.col("w") <= 8)
        .join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
    )
    score = F.sum(F.col("q") * F.expr("shiftleft(CAST(1 AS BIGINT), 8 - w)"))
    return src.groupBy("p_brand").agg(
        score.cast("bigint").alias("decayed_score"),
        (score.cast("bigint") / F.lit(256.0)).alias("decayed_norm"),
    )


# --------------------------------------------------------------------------
# Partition content checksums — merkle-style replica reconciliation.  Two
# copies of a table (primary/DR, pre/post-migration) are compared partition
# by partition: only partitions whose checksum differs need a row-level
# diff (snapshot_diff above).  The per-partition digest is BIT_XOR over
# 48-bit row hashes — order-independent and CONSTANT SPACE per group, so it
# holds at billions of rows per partition where a collect-and-hash digest
# (the bridge-signature idiom) would OOM; paired with the row count (xor is
# blind to duplicate pairs; n catches them).  Hash inputs stick to
# integer/string/date columns — canonical across engines — never raw
# doubles, whose string rendering is not portable.
# The oracle's hex prefix uses '||' (NOT concat): DuckDB's concat IGNORES
# NULL arguments, so concat('0x', NULL-hash) would yield the unparseable
# string '0x' and crash the BIGINT cast on NULL-keyed rows; '||' propagates
# the NULL and bit_xor skips it — exactly what the Spark side does.
# --------------------------------------------------------------------------
_CHECKSUM_ORACLE = """
SELECT strftime(l_shipdate, '%Y-%m') AS mes_dt,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(CAST('0x' || substr(md5(
             CAST(l_orderkey AS VARCHAR) || '|' ||
             CAST(l_partkey AS VARCHAR) || '|' ||
             CAST(l_suppkey AS VARCHAR) || '|' ||
             l_returnflag || '|' ||
             CAST(CAST(FLOOR(l_quantity) AS BIGINT) AS VARCHAR) || '|' ||
             strftime(l_shipdate, '%Y-%m-%d')), 1, 12) AS BIGINT))
            AS BIGINT) AS checksum
FROM lineitem
GROUP BY 1
"""


@register("partition_content_checksums", oracle=_CHECKSUM_ORACLE)
def partition_content_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month (n_rows, BIT_XOR-of-row-hashes) digest of lineitem — the
    cheap half of replica reconciliation: ship these ~|months| rows across
    sites, compare, and row-diff only the partitions that disagree.  One
    scan, one |months|-row shuffle, no per-group state growth.  The oracle
    rebuilds the digests from the same rows, so the gate proves the digest
    function itself is engine-portable — which is the whole point of a
    cross-site checksum."""
    return _partition_checksums(load_table(spark, sf_dir, "lineitem"))


def _partition_checksums(li: DataFrame) -> DataFrame:
    """The digest pipeline over any lineitem-shaped frame (split out so the
    NULL/fractional parity tests drive the EXACT production expression).
    concat, NOT concat_ws: the oracle's `||` propagates NULL (row drops
    out of the xor on both engines identically); concat_ws would skip the
    NULL field and hash a shifted-but-valid string on this side only —
    the same parity class fixed in operators/cms.py:_slot.  floor() on
    the double quantity, NOT a bare bigint cast: Spark's ANSI cast
    truncates where DuckDB's rounds."""
    ident = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("|"),
        F.col("l_partkey").cast("string"),
        F.lit("|"),
        F.col("l_suppkey").cast("string"),
        F.lit("|"),
        F.col("l_returnflag"),
        F.lit("|"),
        F.floor("l_quantity").cast("string"),
        F.lit("|"),
        F.date_format("l_shipdate", "yyyy-MM-dd"),
    )
    h = F.conv(F.substring(F.md5(ident), 1, 12), 16, 10).cast("bigint")
    return (
        li.select(F.date_format("l_shipdate", "yyyy-MM").alias("mes_dt"), h.alias("h"))
        .groupBy("mes_dt")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("CAST(bit_xor(h) AS BIGINT)").alias("checksum"),
        )
    )
