"""Maintained incremental aggregate over the driver tables — the
TPC-H-gateable twin of the warehouse's ``etl.refresh_aggregate`` /
``read_aggregate`` pair (reference recomputes every summary from the full
fact history after each ingest; the engine maintains per-partition partials
and refreshes only the partitions an ingest touched).

The pattern at 100 TB: a daily ingest re-aggregates ONE day's facts and
dynamic-partition-overwrites that day's slice of the partial table
(idempotent, same contract as the fact sink); serving queries fold the
partials — O(aggregate cardinality), never O(fact history).  Additive
measures use exact types end-to-end (DECIMAL sums + BIGINT counts), so
partial-then-total is bit-identical to a direct recompute no matter how the
rows were grouped — which is precisely what lets the serving query share a
full-recompute DuckDB oracle.

Layout: partials keep DAY grain rows, partitioned by month (84 month
directories instead of ~2500 day directories — same pruning story for the
month-rollup serving path, far fewer tiny files; a real lake with daily
ingest volume would partition by day).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.registry import register

_AGG_ALGO_VERSION = "v1"
_MONEY = "decimal(15,2)"


def daily_revenue_path(sf_dir: str) -> str:
    """The maintained table's path is keyed by corpus LOCATION only — NOT
    by the corpus stamp, unlike the immutable ANN/cluster indexes.  A
    stamp-keyed path can never be refreshed incrementally: any ingest that
    changes the facts changes the stamp, the new path doesn't exist, and
    'refresh' degenerates to a full rebuild every time.  Staleness is
    tracked instead by a stamp MARKER inside the table (written at build
    and updated by refresh): serve-time mismatch means the caller ingested
    without refreshing, and the safe fallback is a full rebuild."""
    from olap_sus_spark.operators.index_store import index_path

    return index_path(
        "dailyrev", f"{_AGG_ALGO_VERSION}|{os.path.abspath(sf_dir)}"
    )


_STAMP_MARKER = "_corpus_stamp.txt"


def _current_stamp(sf_dir: str) -> str:
    from olap_sus_spark.operators.index_store import corpus_stamp

    return corpus_stamp(sf_dir, "lineitem")


def _read_marker(path: str) -> str | None:
    try:
        with open(os.path.join(path, _STAMP_MARKER)) as f:
            return f.read().strip()
    except OSError:
        return None


def _write_marker(path: str, stamp: str) -> None:
    with open(os.path.join(path, _STAMP_MARKER), "w") as f:
        f.write(stamp)


def _partials(spark: SparkSession, sf_dir: str, months: list[str] | None = None) -> DataFrame:
    """Day-grain revenue partials from lineitem: (dia, valor, n) + month
    partition key.  ``months`` (yyyy-MM) restricts the scan as RANGE
    predicates on the raw timestamp column — `date_format(..) IN (..)`
    would wrap the column in an expression and never reach the parquet
    scan; plain `>= start AND < next-month` comparisons push down to
    row-group stats (and prune partitions outright on a date-partitioned
    lake), keeping refresh cost O(day), not O(history)."""
    li = load_table(spark, sf_dir, "lineitem")
    if months is not None:
        import datetime

        cond = F.lit(False)
        for m in sorted(set(months)):
            start = datetime.date(int(m[:4]), int(m[5:7]), 1)
            nxt = (start + datetime.timedelta(days=32)).replace(day=1)
            cond = cond | (
                (F.col("l_shipdate") >= F.lit(str(start)).cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(str(nxt)).cast("timestamp"))
            )
        li = li.filter(cond)
    return (
        li.select(
            F.date_format("l_shipdate", "yyyy-MM").alias("mes_dt"),
            F.to_date("l_shipdate").alias("dia"),
            F.col("l_extendedprice").cast(_MONEY).alias("valor"),
        )
        .groupBy("mes_dt", "dia")
        .agg(F.sum("valor").alias("valor"), F.count(F.lit(1)).alias("n"))
    )


def load_or_build_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained partial table: staged build + atomic promotion (index
    contract), staleness via the stamp marker.  A marker matching the
    current facts serves directly; a mismatch (the caller ingested without
    calling :func:`refresh_daily_revenue`) triggers the safe full rebuild —
    the maintained table must never silently serve stale partials."""
    import shutil

    from olap_sus_spark.operators.index_store import (
        index_root,
        promote,
        staging_path,
        sweep_stale_staging,
    )

    path = daily_revenue_path(sf_dir)
    stamp = _current_stamp(sf_dir)
    if not os.path.exists(path) or _read_marker(path) != stamp:
        sweep_stale_staging()
        os.makedirs(index_root(), exist_ok=True)
        staging = staging_path(path)
        _partials(spark, sf_dir).write.partitionBy("mes_dt").mode("overwrite").parquet(
            staging
        )
        _write_marker(staging, stamp)
        if os.path.exists(path):
            # Stale table: retire-then-promote.  The retire rename must NOT
            # assume it wins — a concurrent rebuilder over the same stale
            # marker may have retired (or already re-promoted) the path, in
            # which case our rename raises and we fall through to `promote`,
            # which lands this staging if the path is still absent or
            # discards it if the winner's copy is already live (the same
            # race-loser contract as the IVF quarantine in similarity.py).
            # Readers CAN observe a brief no-table window between retire and
            # promote; the serve below retries through it.
            tomb = staging_path(path) + ".stale"
            try:
                os.rename(path, tomb)
            except OSError:
                tomb = None  # concurrent retire won; nothing of ours to reap
            promote(staging, path)
            if tomb is not None:
                shutil.rmtree(tomb, ignore_errors=True)
        else:
            promote(staging, path)
    # Serve with a bounded retry: a concurrent rebuilder's retire→promote
    # window can make the path vanish between our freshness check and the
    # read.  The window is microseconds (two renames); by the retry the
    # winner has promoted and the read succeeds.
    import time

    for _ in range(100):
        try:
            return spark.read.parquet(path)
        except Exception:
            if os.path.exists(path):
                raise
            time.sleep(0.05)
    return spark.read.parquet(path)


def refresh_daily_revenue(spark: SparkSession, sf_dir: str, days: list[str]) -> None:
    """Incremental maintenance: re-aggregate ONLY the partitions containing
    the ingested days and dynamic-partition-overwrite them in place —
    idempotent (re-refreshing an unchanged day rewrites identical bytes).
    Cost is one pruned scan + one partition write, never the fact history.
    """
    months = sorted({d[:7] for d in days})
    path = daily_revenue_path(sf_dir)
    if not os.path.exists(path):
        # Refreshing a never-built table must NOT create a months-only
        # partial that load_or_build would later mistake for the complete
        # table — fall through to the full staged build instead.
        load_or_build_daily_revenue(spark, sf_dir)
        return
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        _partials(spark, sf_dir, months).write.partitionBy("mes_dt").mode(
            "overwrite"
        ).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # The caller declares the ingest reconciled: stamp the table with the
    # CURRENT facts identity so serves trust the refreshed partials (this
    # is what makes the O(day) path reachable on actually-changed facts —
    # a stamp-keyed path would full-rebuild on every ingest).
    _write_marker(path, _current_stamp(sf_dir))


_INCR_ORACLE = """
SELECT
    CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ano,
    CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mes,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS valor_total,
    CAST(COUNT(*) AS BIGINT) AS n_itens
FROM lineitem
GROUP BY 1, 2
"""


@register("incremental_revenue_by_month", oracle=_INCR_ORACLE)
def incremental_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month revenue roll-up served from the MAINTAINED day-grain partials —
    O(2500 partial rows), never a lineitem scan — while the oracle
    recomputes from the raw facts: the hash match proves the maintained
    table is exactly equivalent to a full recompute.  Exact-additive
    measures (DECIMAL sum, BIGINT count) make partial-then-total
    bit-identical regardless of grouping order; only the final output view
    casts to double."""
    partials = load_or_build_daily_revenue(spark, sf_dir)
    return (
        partials.groupBy(
            F.year("dia").alias("ano"), F.month("dia").alias("mes")
        )
        .agg(
            F.sum("valor").cast("double").alias("valor_total"),
            F.sum("n").alias("n_itens"),
        )
    )
