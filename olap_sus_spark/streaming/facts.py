"""Streaming fact ingest: lineitem drops → exactly-once corpus append →
every maintained fact summary refreshed inside the micro-batch.

The TPC-H-side twin of :mod:`olap_sus_spark.streaming.corpus` (which
closes ingest→refresh→serve for the ANN/dedup indexes) and
:mod:`olap_sus_spark.streaming.ingest` (warehouse aggregates): a
file-watch stream appends landing drops to the corpus lineitem table,
then calls :func:`olap_sus_spark.maintenance.refresh_fact_summaries` so
the revenue rollup, KMV cube, CMS grid, and histogram are fresh — at
O(day) each — the moment the batch commits.

Appends are EXACTLY-ONCE via the shared
:func:`olap_sus_spark.sources.sinks.append_exactly_once` (batch-id-keyed
atomic rename; the corpus document/embedding streams use the same sink).

Requirements: ``corpus_dir`` is a full sf-dir layout (orders/supplier
present for the CMS/histogram candidates and stamps) and its
``lineitem.parquet`` is a DIRECTORY dataset (the shape appends grow).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from olap_sus_spark.sources.sinks import append_exactly_once, run_tag_of


def _fact_batch(corpus_dir: str, run_tag: str, refresh_summaries: bool = True):
    from olap_sus_spark.maintenance import refresh_fact_summaries

    table = posixpath.join(corpus_dir, "lineitem.parquet")

    def inner(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        days = sorted(
            str(r["d"])
            for r in batch.select(F.to_date("l_shipdate").alias("d")).distinct().collect()
        )
        append_exactly_once(batch, table, batch_id, run_tag)
        if refresh_summaries:
            refresh_fact_summaries(spark, corpus_dir, days)

    return inner


def stream_lineitem_ingest(
    spark: SparkSession,
    landing_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    refresh_summaries: bool = True,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain available lineitem drops into the corpus with every maintained
    fact summary refreshed per micro-batch (Trigger.AvailableNow,
    checkpointed file tracking — run on a schedule, or a processingTime
    trigger for continuous ingest).  The landing schema is read once from
    the landing files' own footers (one driver-side read, no sampling
    inference job)."""
    import os

    if not (
        os.path.isdir(landing_dir)
        and any(f.endswith(".parquet") for f in os.listdir(landing_dir))
    ):
        return  # scheduled drain with nothing pending — a no-op, not a crash
    schema = spark.read.parquet(landing_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(landing_dir)
        .writeStream.foreachBatch(
            _fact_batch(corpus_dir, run_tag_of(checkpoint_dir), refresh_summaries)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
