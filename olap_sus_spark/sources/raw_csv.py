"""Raw-extract CSV source (SURVEY.md §2.1 S1/S2).

The reference reads `;`-separated, header-ful CSV drops from
``s3a://landing/source_sus/{dataset}/dt=YYYY-MM-DD/*.csv`` with
``inferSchema=false`` (/root/reference/dags/spark_script_sinasc.py:154-159,192)
and *loops per file in Python* (sinasc:188) — one job per file.  Here the
whole glob goes to one ``spark.read.csv`` call: Spark parallelizes the file
list across executors, so a 100 TB drop of many CSVs becomes one scan stage
instead of a driver-side loop.

Column addressing is **by header name, not position** (real SUS extracts
carry hundreds of columns in varying order; the ETL consumes a fixed subset
— sinasc:32-135).  ``inferSchema`` stays false, so the only pre-pass is
reading one header line per file — no sampling scan.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from olap_sus_spark import schemas

RAW_SCHEMAS: dict[str, StructType] = {
    "sinasc": schemas.SINASC_RAW,
    "sim": schemas.SIM_RAW,
    "sih": schemas.SIH_RAW,
}


def landing_glob(landing_dir: str, dataset: str, date: str) -> str:
    """`{landing}/{dataset}/dt={date}/*.csv` — the reference's layout
    (README.md:22-25).  Passing the glob straight to the reader replaces the
    reference's Hadoop ``globStatus`` helper (S2): partition pruning on the
    ``dt=`` directory is native to the datasource."""
    return posixpath.join(landing_dir, dataset, f"dt={date}", "*.csv")


def read_raw(spark: SparkSession, path: str, schema: StructType, sep: str = ";") -> DataFrame:
    """S1: header, `;` separator (seed CSVs use ','), all-string columns,
    no inference.

    The file is read with header-derived column names (all StringType —
    ``inferSchema`` is false, so no data-sampling pass), then aligned to the
    declared raw schema *by name*: extra file columns are dropped, declared
    columns missing from the file arrive as NULL.  This mirrors how the
    reference addresses raw columns strictly by header name.
    """
    df = spark.read.option("header", "true").option("sep", sep).csv(path)
    have = set(df.columns)
    return df.select(
        *[
            (F.col(f.name) if f.name in have else F.lit(None).cast("string")).alias(f.name)
            for f in schema.fields
        ]
    )


def read_dataset(spark: SparkSession, landing_dir: str, dataset: str, date: str) -> DataFrame:
    return read_raw(spark, landing_glob(landing_dir, dataset, date), RAW_SCHEMAS[dataset])
