"""Bucketed tables: shuffle-free fact-to-fact joins.

Star joins in this engine broadcast their dimension side, but fact-to-fact
joins (lineitem⋈orders, births⋈deaths drill-across) shuffle both inputs on
the join key every query.  Pre-bucketing both tables on that key writes each
bucket's rows into a fixed file slot, so Catalyst proves the sides
co-partitioned and plans the join with NO Exchange — at 100 TB this converts
the dominant repeated shuffle into a one-time layout cost.

Bucketing requires the session catalog (``saveAsTable``) because bucket
metadata lives in the metastore, not in the parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a bucketed (and bucket-sorted) catalog table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs the
    plan contains no Exchange on either side (verified by
    tests/test_plan_shapes.py::test_bucketed_join_has_no_shuffle)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
