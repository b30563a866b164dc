"""Uniform multi-format table IO (engine extension of SURVEY.md §2.1).

The reference's only raw format is `;`-CSV (S1) and its only sink is JDBC
append (S4).  A warehouse serving a 100 TB training-data pipeline meets more
drop formats, so the engine exposes one reader/writer pair over Spark's
built-in datasources:

- **parquet / orc** — columnar, self-describing, splittable; both get
  predicate pushdown + column pruning from Catalyst (the scan shows
  PushedFilters/ReadSchema).  Parquet is the warehouse-native format
  (catalog.py); ORC is the interchange twin.
- **json** — JSON-Lines drops; one object per line keeps files splittable
  (a multi-line JSON array would serialize a 100 TB read onto one task per
  file).  Schema is declared, never inferred — inference would be a full
  extra pass over the data.
- **csv** — delegated to raw_csv.read_raw semantics for landing drops;
  included here for symmetric round-trips.

No format ships a Python-side parser: every one is a JVM datasource, so the
scan stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")

# Lossless timestamp wire format for the text formats (micros precision,
# matching the engine's timestamp grain — catalog.py).
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """Write ``df`` at ``path`` in ``fmt``; returns the path."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true").option("timestampFormat", _TS_FMT)
    elif fmt == "json":
        writer = writer.option("timestampFormat", _TS_FMT)
    getattr(writer, fmt)(path)
    return path


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read ``path`` as ``fmt``.

    parquet/orc are self-describing; json/csv REQUIRE a declared schema —
    at scale, schema inference is a full extra pass over the input (and for
    CSV a sampling scan), which this engine never does on raw data
    (sources/raw_csv.py has the same rule).
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read
    if fmt in ("json", "csv"):
        if schema is None:
            raise ValueError(f"{fmt} reads need an explicit schema (no inference)")
        reader = reader.schema(schema).option("timestampFormat", _TS_FMT)
        if fmt == "csv":
            reader = reader.option("header", "true")
    elif schema is not None:
        reader = reader.schema(schema)
    return getattr(reader, fmt)(path)
