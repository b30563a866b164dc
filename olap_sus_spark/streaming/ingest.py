"""Streaming ingest: the batch ETL pipelines driven by a file-watch stream.

The reference's incrementality is an Airflow daily trigger; the streaming
equivalent watches the landing zone (`{landing}/{dataset}/dt=*/...csv`) and
processes new files as they arrive — same transforms, same fact builders,
same idempotent sinks, via ``foreachBatch``:

- the file source + checkpoint give exactly-once *file* processing;
- inside each micro-batch, facts are written with dynamic partition
  overwrite per ``dt``, so reprocessing a partition (or a crash between
  batch and checkpoint commit) converges to the same state;
- late files for an old ``dt`` simply rewrite that partition with the now-
  complete day (the reference's append model would double-count instead).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.operators import facts as facts_ops
from olap_sus_spark.operators.transforms import transform_sim, transform_sinasc
from olap_sus_spark.sources import sinks
from olap_sus_spark.sources.raw_csv import RAW_SCHEMAS
from olap_sus_spark import etl


def read_landing_stream(spark: SparkSession, landing_dir: str, dataset: str) -> DataFrame:
    """CSV file stream over the dataset's landing tree; the ``dt=`` directory
    component surfaces as a partition column (declared last in the schema).

    Contract difference vs the batch path: a file stream with a declared
    schema maps CSV columns *positionally* (no header-name addressing), so
    landing files must be in canonical column order — the batch path
    (sources/raw_csv.py) tolerates any order.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    base = posixpath.join(landing_dir, dataset)
    schema = StructType([*RAW_SCHEMAS[dataset].fields, StructField("dt", StringType())])
    return (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("sep", ";")
        .option("basePath", base)
        .csv(posixpath.join(base, "dt=*"))
    )


def _process_batch(dataset: str, warehouse_dir: str, refresh_aggregates: bool = True):
    fact_table = "fact_nascimentos" if dataset == "sinasc" else "fact_obitos"

    def inner(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        dims = etl.load_dims(spark, warehouse_dir)
        # One micro-batch can straddle days; write each dt partition
        # separately so the overwrite stays scoped.
        days = [str(r.dt) for r in batch.select("dt").distinct().collect()]
        for dt in sorted(days):
            day = batch.filter(F.col("dt") == dt).drop("dt")
            if dataset == "sinasc":
                fact = facts_ops.build_fact_nascimentos(transform_sinasc(day), dims)
                sinks.write_fact_partition(fact, warehouse_dir, "fact_nascimentos", dt)
            else:
                fact, bridge = facts_ops.build_fact_obitos(transform_sim(day), dims)
                sinks.append_bridge(bridge, warehouse_dir, etl.BRIDGE_TABLE)
                sinks.write_fact_partition(fact, warehouse_dir, "fact_obitos", dt)
        if refresh_aggregates:
            # Close the ingest→refresh→serve loop inside the stream: every
            # maintained aggregate over this fact re-aggregates ONLY the
            # micro-batch's dt partitions (dynamic partition overwrite —
            # idempotent with the fact sink, so a replayed batch converges).
            for name, (ft, _, _, _) in etl.AGGREGATES.items():
                if ft == fact_table:
                    etl.refresh_aggregate(spark, warehouse_dir, name, dates=sorted(days))

    return inner


def stream_ingest(
    spark: SparkSession,
    dataset: str,
    landing_dir: str,
    warehouse_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all currently-available landing files through the ETL
    (Trigger.AvailableNow) with checkpointed exactly-once file tracking.
    Run on a schedule — or with a processingTime trigger for continuous
    ingest; the pipeline is identical."""
    q = (
        read_landing_stream(spark, landing_dir, dataset)
        .writeStream.foreachBatch(_process_batch(dataset, warehouse_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
