"""Daily close: one call refreshes EVERY maintained fact summary in O(day).

The engine keeps four maintained summaries over the TPC-H-shaped facts —
the revenue rollup (queries/incremental.py), the KMV distinct-count cube
(queries/sketches.py), the CMS frequency grid (queries/cms.py) and the
order-value histogram (queries/hist.py) — each refreshable per ingest day
on the shared operators/maintained.py contract.  Ingest pipelines (the
streaming loop, the backfill window, a plain daily job) should not need to
know the inventory: :func:`refresh_fact_summaries` is the single entry
point, the TPC-H-side analogue of the warehouse loop's per-batch
``etl.refresh_aggregate`` sweep (streaming/ingest.py) and the corpus
stream's index refreshes (streaming/corpus.py).

Every underlying refresh is idempotent (dynamic partition overwrite of
month partitions, never-built fallback to a full staged build), so the
composition is too: replaying a day converges.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def refresh_fact_summaries(
    spark: SparkSession, sf_dir: str, days: list[str]
) -> list[str]:
    """Refresh all maintained summaries for the ingested ``days``
    (yyyy-MM-dd).  Returns the names of the summaries refreshed.  Cost is
    O(day) per summary: each re-derives only the months containing
    ``days`` from a range-pruned fact scan and overwrites those partitions.
    """
    from olap_sus_spark.queries.cms import refresh_supplier_cms
    from olap_sus_spark.queries.hist import refresh_order_hist
    from olap_sus_spark.queries.incremental import refresh_daily_revenue
    from olap_sus_spark.queries.sketches import refresh_orderkey_kmv
    from olap_sus_spark.sources.zorder import refresh_zorder_monthly

    refresh_daily_revenue(spark, sf_dir, days)
    refresh_orderkey_kmv(spark, sf_dir, days)
    refresh_supplier_cms(spark, sf_dir, days)
    refresh_order_hist(spark, sf_dir, days)
    # the fact lake's default layout: re-z-order ONLY the touched months
    # (round 7 — the global z-copy rebuilt the whole table on any change)
    refresh_zorder_monthly(
        spark, sf_dir, "lineitem", "l_partkey", "l_suppkey", "l_shipdate", days
    )
    return [
        "daily_revenue",
        "orderkey_kmv",
        "supplier_cms",
        "order_hist",
        "zorder_lineitem",
    ]


def refresh_event_summaries(
    spark: SparkSession, sf_dir: str, days: list[str]
) -> list[str]:
    """Events-side daily close: refresh the maintained summaries keyed on
    the events table (the active-user sketch cube and the behavior-fact
    z-layout) for the ingested days."""
    from olap_sus_spark.queries.sketches import refresh_user_kmv
    from olap_sus_spark.sources.zorder import refresh_zorder_monthly

    refresh_user_kmv(spark, sf_dir, days)
    refresh_zorder_monthly(spark, sf_dir, "events", "user_id", "event_id", "ts", days)
    return ["user_kmv", "zorder_events"]
