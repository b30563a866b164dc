"""Batch ingest orchestration — the engine's equivalent of the reference's
Airflow DAG + spark-submit scripts (/root/reference/dags/spark_dag.py:48-78).

One plain function per concern, no scheduler: incrementality stays
partition-based (``dt=YYYY-MM-DD`` landing folders in, ``dt=`` fact
partitions out).  Re-running a (dataset, date) pair is idempotent: facts use
dynamic partition overwrite, bridge rows are content-keyed and anti-joined
(sources/sinks.py).

Typical use::

    warehouse = bootstrap_warehouse(spark, seed_paths, warehouse_dir)
    run_ingest(spark, "sinasc", "2024-01-15", landing_dir, warehouse_dir)
    run_ingest(spark, "sim", "2024-01-15", landing_dir, warehouse_dir)
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.operators import facts as facts_ops
from olap_sus_spark.operators.dims import ALL_GENERATED
from olap_sus_spark.operators.transforms import (
    transform_sih,
    transform_sim,
    transform_sinasc,
)
from olap_sus_spark.sources import seeds, sinks
from olap_sus_spark.sources.raw_csv import read_dataset

DIM_TABLES = (
    "dim_data", "dim_horario", "dim_demografia", "dim_info_nascimento",
    "dim_municipio", "dim_ocupacao", "dim_causa",
)
FACT_TABLES = ("fact_nascimentos", "fact_obitos", "fact_internacoes")
BRIDGE_TABLE = "ponte_grupo_causas"


def bootstrap_warehouse(
    spark: SparkSession, seed_paths: dict[str, str], warehouse_dir: str
) -> dict[str, DataFrame]:
    """One-time dimension bootstrap (reference init.sql, SURVEY.md §3 EP3):
    generate the calendar/junk dimensions, load the three seed CSVs, write
    everything as Parquet.  ``seed_paths`` maps
    {'municipio','ocupacao','causa'} -> seed CSV path."""
    dims: dict[str, DataFrame] = {name: fn(spark) for name, fn in ALL_GENERATED.items()}
    dims["dim_municipio"] = seeds.load_dim_municipio(spark, seed_paths["municipio"])
    dims["dim_ocupacao"] = seeds.load_dim_ocupacao(spark, seed_paths["ocupacao"])
    dims["dim_causa"] = seeds.load_dim_causa(spark, seed_paths["causa"])
    for name, df in dims.items():
        sinks.write_dimension(df, warehouse_dir, name)
    # Bridge sentinel group: id '0' containing only the sentinel cause, so
    # star joins through the bridge keep cause-less deaths (init.sql:585-652
    # key-0 convention).
    sentinel = spark.createDataFrame(
        [(facts_ops.BRIDGE_SENTINEL, 1, 0)],
        "chave_grupo_causa string, ordem_causa int, chave_causa int",
    )
    sentinel.write.mode("overwrite").parquet(posixpath.join(warehouse_dir, BRIDGE_TABLE))
    return dims


def load_dims(spark: SparkSession, warehouse_dir: str) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(posixpath.join(warehouse_dir, t)) for t in DIM_TABLES}


def run_ingest(
    spark: SparkSession,
    dataset: str,
    date: str,
    landing_dir: str,
    warehouse_dir: str,
) -> DataFrame:
    """Ingest one (dataset, date) landing partition into the warehouse.

    Replaces one SparkSubmitOperator run.  Unlike the reference, which loops
    over files in Python (spark_script_sinasc.py:188) and re-reads the dims
    per file, this reads the whole partition in one scan and builds one plan.
    Returns the aggregated fact written (for logging/inspection).
    """
    raw = read_dataset(spark, landing_dir, dataset, date)
    dims = load_dims(spark, warehouse_dir)

    if dataset == "sinasc":
        fact = facts_ops.build_fact_nascimentos(transform_sinasc(raw), dims)
        sinks.write_fact_partition(fact, warehouse_dir, "fact_nascimentos", date)
        return fact
    if dataset == "sim":
        fact, bridge = facts_ops.build_fact_obitos(transform_sim(raw), dims)
        # Bridge first (reference order, sim:239 before :402): groups must
        # exist before facts referencing them are visible.
        sinks.append_bridge(bridge, warehouse_dir, BRIDGE_TABLE)
        sinks.write_fact_partition(fact, warehouse_dir, "fact_obitos", date)
        return fact
    if dataset == "sih":
        fact = facts_ops.build_fact_internacoes(transform_sih(raw), dims)
        sinks.write_fact_partition(fact, warehouse_dir, "fact_internacoes", date)
        return fact
    raise ValueError(f"unknown dataset {dataset!r} (expected 'sinasc', 'sim' or 'sih')")


def run_backfill(
    spark: SparkSession,
    dataset: str,
    start_date: str,
    end_date: str,
    landing_dir: str,
    warehouse_dir: str,
    refresh_aggregates: bool = True,
) -> list[str]:
    """Catch-up ingest over a date window — the engine's analogue of the
    reference DAG's ``catchup=True`` backfill (spark_dag.py:48-78: Airflow
    replays one ``@daily`` task per missed day).

    Walks ``[start_date, end_date]`` inclusive, ingesting every day whose
    landing partition exists (days with no drop are skipped, like an Airflow
    run over an empty source prefix).  The no-drop decision is an explicit
    glob of the day's landing path BEFORE the ingest — never inferred from
    ingest exception text, so a real failure inside run_ingest (missing
    warehouse dim, bad data) always propagates instead of silently skipping
    a day that had data.  Where Airflow pays one full
    aggregate-refresh per replayed day, the backfill refreshes each
    maintained aggregate ONCE over all ingested days at the end — by
    additive-partial idempotency (refresh_aggregate) the final warehouse
    state is identical to N single-day runs, pinned by
    tests/test_etl_e2e.py::test_backfill_matches_single_day_ingests.

    Returns the list of dates actually ingested.
    """
    import glob as _glob
    from datetime import date as _date, timedelta

    from olap_sus_spark.sources.raw_csv import landing_glob

    d0, d1 = _date.fromisoformat(start_date), _date.fromisoformat(end_date)
    if d1 < d0:
        raise ValueError(f"end_date {end_date} precedes start_date {start_date}")
    ingested: list[str] = []
    cur = d0
    while cur <= d1:
        day = cur.isoformat()
        if _glob.glob(landing_glob(landing_dir, dataset, day)):
            run_ingest(spark, dataset, day, landing_dir, warehouse_dir)
            ingested.append(day)
        cur += timedelta(days=1)
    if refresh_aggregates and ingested:
        fact_table = {
            "sinasc": "fact_nascimentos", "sim": "fact_obitos", "sih": "fact_internacoes",
        }[dataset]
        for name, (ft, _, _, _) in AGGREGATES.items():
            if ft == fact_table:
                refresh_aggregate(spark, warehouse_dir, name, dates=ingested)
    return ingested


def _agg_nascimentos_uf_ano(fact: DataFrame, dims: dict[str, DataFrame]) -> DataFrame:
    data = dims["dim_data"].select(F.col("chave_data"), "ano")
    mun = dims["dim_municipio"].select(
        F.col("chave_municipio").alias("chave_municipio_residencia"), "uf"
    )
    return (
        fact.join(F.broadcast(data), "chave_data")
        .join(F.broadcast(mun), "chave_municipio_residencia")
        .groupBy("dt", "uf", "ano")
        .agg(F.sum("quantidade_nascimentos").alias("quantidade_nascimentos"))
    )


def _agg_obitos_uf_ano(fact: DataFrame, dims: dict[str, DataFrame]) -> DataFrame:
    data = dims["dim_data"].select(F.col("chave_data").alias("chave_data_obito"), "ano")
    mun = dims["dim_municipio"].select(
        F.col("chave_municipio").alias("chave_municipio_residencia"), "uf"
    )
    return (
        fact.join(F.broadcast(data), "chave_data_obito")
        .join(F.broadcast(mun), "chave_municipio_residencia")
        .groupBy("dt", "uf", "ano")
        .agg(F.sum("quantidade_obitos").alias("quantidade_obitos"))
    )


# Maintained aggregate tables:
# name -> (source fact, partial-agg builder, grain keys, additive measure).
# Each measure is ADDITIVE (a sum), so per-dt partials compose: the stored
# table keeps the dt partition column and readers sum across it.
AGGREGATES = {
    "agg_nascimentos_uf_ano": (
        "fact_nascimentos", _agg_nascimentos_uf_ano, ("uf", "ano"), "quantidade_nascimentos",
    ),
    "agg_obitos_uf_ano": (
        "fact_obitos", _agg_obitos_uf_ano, ("uf", "ano"), "quantidade_obitos",
    ),
}


def refresh_aggregate(
    spark: SparkSession,
    warehouse_dir: str,
    name: str,
    dates: list[str] | None = None,
) -> DataFrame:
    """Maintain a pre-aggregated rollup table incrementally by ingest day.

    The scalable warehouse pattern the reference lacks: instead of
    recomputing a summary over the whole fact history after every daily
    ingest, only the ``dt`` partitions just ingested are re-aggregated and
    their partitions of the aggregate table replaced (dynamic partition
    overwrite — same idempotency contract as the fact sink).  ``dates=None``
    rebuilds everything.  At 100 TB the daily refresh therefore scans one
    day, not the decade: partition pruning makes refresh cost O(day), and
    the additive partials keep query-time work O(aggregate cardinality).
    """
    from olap_sus_spark.sources.sinks import _exists

    fact_table, build, _, _ = AGGREGATES[name]
    if dates is not None and not _exists(spark, posixpath.join(warehouse_dir, name)):
        # A dated refresh against a never-built aggregate would create a
        # partial table covering only these dt partitions, which
        # read_aggregate would then serve as if complete — first build must
        # cover the whole fact history (same guard as
        # refresh_daily_revenue's never-built fallback).
        dates = None
    fact = spark.read.parquet(posixpath.join(warehouse_dir, fact_table))
    if dates is not None:
        fact = fact.filter(F.col("dt").isin(dates))  # partition-pruned scan
    partial = build(fact, load_dims(spark, warehouse_dir))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        partial.write.mode("overwrite").partitionBy("dt").parquet(
            posixpath.join(warehouse_dir, name)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return partial


def read_aggregate(spark: SparkSession, warehouse_dir: str, name: str) -> DataFrame:
    """Serve a maintained aggregate: sum the per-dt partials."""
    _, _, keys, measure = AGGREGATES[name]
    df = spark.read.parquet(posixpath.join(warehouse_dir, name))
    return df.groupBy(*keys).agg(F.sum(measure).alias(measure))


def register_warehouse_views(spark: SparkSession, warehouse_dir: str) -> None:
    """Register every warehouse table as a temp view for spark.sql OLAP.

    A fact with no ingested partition yet (e.g. fact_internacoes before any
    'sih' drop) is registered as an empty frame with the declared schema, so
    queries against a fresh warehouse parse and return zero rows instead of
    failing on a missing path."""
    from olap_sus_spark import schemas
    from olap_sus_spark.sources.sinks import _exists

    empty_schemas = {
        "fact_nascimentos": schemas.FACT_NASCIMENTOS,
        "fact_obitos": schemas.FACT_OBITOS,
        "fact_internacoes": schemas.FACT_INTERNACOES,
    }
    for t in (*DIM_TABLES, *FACT_TABLES, BRIDGE_TABLE):
        path = posixpath.join(warehouse_dir, t)
        if _exists(spark, path):
            spark.read.parquet(path).createOrReplaceTempView(t)
        elif t in empty_schemas:
            # On-disk facts carry the dt= partition column; mirror it.
            empty = spark.createDataFrame([], empty_schemas[t]).withColumn(
                "dt", F.lit(None).cast("string")
            )
            empty.createOrReplaceTempView(t)


def register_reference_views(spark: SparkSession, warehouse_dir: str) -> None:
    """Compatibility views with the reference's table and column names
    (/root/reference/scripts/init.sql DDL), so SQL written against the
    reference warehouse runs on this engine unchanged: ``factObitos``,
    ``dimOcupacao``, ``ponteGrupoCausas``, … (Spark view names are
    case-insensitive).  Columns already share names except where the
    reference diverges: dimCausa exposes ``descricao_subcategoria`` /
    ``codigo_cid`` aliases, dimHorario exposes ``tempo``."""
    from olap_sus_spark import schemas
    from olap_sus_spark.sources.sinks import _exists

    def _load(t: str):
        path = posixpath.join(warehouse_dir, t)
        if _exists(spark, path):
            return spark.read.parquet(path)
        empty = {
            "fact_nascimentos": schemas.FACT_NASCIMENTOS,
            "fact_obitos": schemas.FACT_OBITOS,
            "fact_internacoes": schemas.FACT_INTERNACOES,
        }[t]
        return spark.createDataFrame([], empty).withColumn("dt", F.lit(None).cast("string"))

    from pyspark.sql import functions as F

    alias_map = {
        "factnascimentos": _load("fact_nascimentos"),
        "factobitos": _load("fact_obitos"),
        "factinternacoes": _load("fact_internacoes"),
        "dimdata": _load("dim_data"),
        "dimhorario": _load("dim_horario").withColumn("tempo", F.col("tempo_str")),
        "dimmunicipio": _load("dim_municipio"),
        "dimocupacao": _load("dim_ocupacao"),
        "dimdemografia": _load("dim_demografia"),
        "diminfonascimento": _load("dim_info_nascimento"),
        "dimcausa": _load("dim_causa")
        .withColumn("descricao_subcategoria", F.col("descricao_causa"))
        .withColumn("codigo_cid", F.col("codigo_cid10")),
        "pontegrupocausas": _load(BRIDGE_TABLE),
    }
    for name, df in alias_map.items():
        df.createOrReplaceTempView(name)
