"""Seed-CSV dimension loaders (SURVEY.md §2.1 S5).

The reference bulk-COPYs three seed CSVs into Postgres staging tables and
promotes them with ``TRIM``/``NULLIF``/``CASE`` cleanup plus
``ON CONFLICT DO NOTHING`` dedup (/root/reference/scripts/init.sql:268-440).
Here the same cleanup runs as a Spark select over a header-named CSV read,
dedup is ``dropDuplicates`` on the natural key, and the sentinel "Ignorado"
member (key 0, init.sql:585-652) is unioned in so fact FKs never need NULLs.

Surrogate keys are assigned with a ``row_number`` ordered by the natural key:
deterministic across runs (unlike SERIAL's load order) and a single-partition
window only over seed-sized inputs (≤ ~12k rows — BASELINE.md), never over
fact data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_sus_spark import schemas
from olap_sus_spark.sources.raw_csv import read_raw


def _clean(col: str):
    """TRIM + NULLIF('', …) — the staging-promotion idiom (init.sql:321)."""
    c = F.trim(F.col(col))
    return F.when(c == "", None).otherwise(c)


def load_dim_municipio(spark: SparkSession, csv_path: str) -> DataFrame:
    """Geography dimension from the municipality seed (init.sql:268-338).

    7-digit IBGE code is the natural key; ``is_capital`` decodes '1'/'0'.
    """
    raw = read_raw(spark, csv_path, schemas.MUNICIPIO_SEED, sep=",")
    body = (
        raw.select(
            _clean("id_municipio").try_cast("int").alias("codigo_ibge"),
            _clean("nome").alias("nome_municipio"),
            _clean("sigla_uf").alias("uf"),
            _clean("nome_uf").alias("estado"),
            _clean("nome_regiao").alias("regiao"),
            _clean("nome_regiao_saude").alias("regiao_saude"),
            _clean("nome_regiao_metropolitana").alias("regiao_metropolitana"),
            (_clean("capital_uf") == "1").alias("is_capital"),
        )
        .filter(F.col("codigo_ibge").isNotNull())
        .dropDuplicates(["codigo_ibge"])
        .withColumn("chave_municipio", F.row_number().over(Window.orderBy("codigo_ibge")))
    )
    sentinel = spark.createDataFrame(
        [(0, None, "Ignorado", "IG", "Ignorado", "Ignorado", "Ignorado", "Ignorado", False)],
        schemas.DIM_MUNICIPIO,
    )
    return sentinel.unionByName(body.select(*schemas.DIM_MUNICIPIO.fieldNames()))


def load_dim_ocupacao(spark: SparkSession, csv_path: str) -> DataFrame:
    """Occupation dimension — CBO-2002 4-level hierarchy (init.sql:340-392)."""
    raw = read_raw(spark, csv_path, schemas.CBO_SEED, sep=",")
    body = (
        raw.select(
            _clean("cbo_2002").alias("codigo_cbo"),
            _clean("descricao").alias("descricao_ocupacao"),
            _clean("descricao_familia").alias("descricao_familia"),
            _clean("descricao_subgrupo").alias("descricao_subgrupo"),
            _clean("descricao_subgrupo_principal").alias("descricao_subgrupo_principal"),
            _clean("descricao_grande_grupo").alias("descricao_grande_grupo"),
        )
        .filter(F.col("codigo_cbo").isNotNull())
        .dropDuplicates(["codigo_cbo"])
        .withColumn("chave_ocupacao", F.row_number().over(Window.orderBy("codigo_cbo")))
    )
    sentinel_cols = [
        "chave_ocupacao", "codigo_cbo", "descricao_ocupacao", "descricao_familia",
        "descricao_subgrupo", "descricao_subgrupo_principal", "descricao_grande_grupo",
    ]
    sentinel = spark.createDataFrame(
        [(0, None, "Ignorado", "Ignorado", "Ignorado", "Ignorado", "Ignorado")],
        "chave_ocupacao int, codigo_cbo string, descricao_ocupacao string, "
        "descricao_familia string, descricao_subgrupo string, "
        "descricao_subgrupo_principal string, descricao_grande_grupo string",
    )
    return sentinel.unionByName(body.select(*sentinel_cols))


def load_dim_causa(spark: SparkSession, csv_path: str) -> DataFrame:
    """Cause-of-death dimension — ICD-10 3-level hierarchy + violence/overdose
    flags (init.sql:394-440).  Natural key = subcategory code; the sentinel
    uses code '0000' (the value the reference's top-k query excludes,
    /root/reference/dashboard/app.py:58)."""
    raw = read_raw(spark, csv_path, schemas.CID10_SEED, sep=",")
    body = (
        raw.select(
            _clean("subcategoria").alias("codigo_cid10"),
            _clean("descricao_subcategoria").alias("descricao_causa"),
            _clean("categoria").alias("categoria"),
            _clean("descricao_categoria").alias("descricao_categoria"),
            _clean("capitulo").alias("capitulo"),
            _clean("descricao_capitulo").alias("descricao_capitulo"),
            (_clean("causa_violencia") == "1").alias("causa_violencia"),
            (_clean("causa_overdose") == "1").alias("causa_overdose"),
        )
        .filter(F.col("codigo_cid10").isNotNull())
        .dropDuplicates(["codigo_cid10"])
        .withColumn("chave_causa", F.row_number().over(Window.orderBy("codigo_cid10")))
    )
    sentinel_cols = [
        "chave_causa", "codigo_cid10", "descricao_causa", "categoria",
        "descricao_categoria", "capitulo", "descricao_capitulo",
        "causa_violencia", "causa_overdose",
    ]
    sentinel = spark.createDataFrame(
        [(0, "0000", "Ignorado", "Ignorado", "Ignorado", "Ignorado", "Ignorado", False, False)],
        "chave_causa int, codigo_cid10 string, descricao_causa string, categoria string, "
        "descricao_categoria string, capitulo string, descricao_capitulo string, "
        "causa_violencia boolean, causa_overdose boolean",
    )
    return sentinel.unionByName(body.select(*sentinel_cols))
