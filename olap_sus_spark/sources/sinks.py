"""Warehouse sinks: idempotent Parquet writes (SURVEY.md §2.1 S4, §7 risks).

The reference appends facts and bridge rows to Postgres over JDBC with no
transaction around the read-check-assign-write sequence
(/root/reference/dags/spark_script_sim.py:239,402) — a retry double-writes.
Here:

- **facts** land as date-partitioned Parquet with *dynamic partition
  overwrite*: re-running a day replaces exactly that day's partition and
  nothing else.  Idempotent by construction, and the ``dt=`` layout gives
  partition pruning to every downstream query.
- **bridge rows** carry content-hash group ids (operators/bridge.py), so a
  re-run emits byte-identical rows; the sink anti-joins against the existing
  store and appends only genuinely new groups.
"""

from __future__ import annotations

import os
import posixpath

from pyspark.sql import DataFrame, SparkSession


def write_fact_partition(df: DataFrame, warehouse_dir: str, table: str, dt: str) -> str:
    """Overwrite the single ``dt=<date>`` partition of a fact table."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    path = posixpath.join(warehouse_dir, table)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.withColumn("dt", F.lit(dt))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )
    return path


def append_bridge(df: DataFrame, warehouse_dir: str, table: str = "ponte_grupo_causas") -> str:
    """Append only new (content-keyed) bridge rows; existing keys are skipped.

    Safe to re-run: identical input produces identical keys, which the
    anti-join removes.  At scale the existing-side scan prunes to the one
    join column (``chave_grupo_causa``) via Parquet column pruning.
    """
    spark = df.sparkSession
    path = posixpath.join(warehouse_dir, table)
    if _exists(spark, path):
        existing = spark.read.parquet(path).select("chave_grupo_causa").distinct()
        df = df.join(existing, "chave_grupo_causa", "left_anti")
    df.write.mode("append").parquet(path)
    return path


def write_dimension(df: DataFrame, warehouse_dir: str, name: str) -> str:
    """Full-overwrite a (small) dimension table."""
    path = posixpath.join(warehouse_dir, name)
    df.write.mode("overwrite").parquet(path)
    return path


def _exists(spark: SparkSession, path: str) -> bool:
    if "://" not in path:
        return os.path.exists(path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)  # pragma: no cover
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(jvm_path)
