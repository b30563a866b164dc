"""Explicit StructTypes for raw inputs, dimensions and facts.

The reference reads raw CSVs all-string with no inference
(/root/reference/dags/spark_script_sinasc.py:192) and declares warehouse
tables in DDL (/root/reference/scripts/init.sql).  The rebuild pins every
schema here so scans never depend on sampling — mandatory at 100 TB where a
schema-inference pass is a full extra read.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _all_string(*names: str) -> StructType:
    return StructType([StructField(n, StringType(), True) for n in names])


# Raw extracts: exactly the columns the reference ETL consumes (FIXTURES.md
# B1/B2); real extracts carry more, which spark.read.csv ignores by name.
SINASC_RAW = _all_string(
    "DTNASC", "HORANASC", "CODMUNNASC", "CODMUNRES", "IDADEMAE", "RACACORMAE",
    "ESCMAE", "ESTCIVMAE", "SEXO", "RACACOR", "PESO", "PARTO", "GESTACAO", "GRAVIDEZ",
)

SIM_RAW = _all_string(
    "DTOBITO", "DTNASC", "HORAOBITO", "SEXO", "RACACOR", "ESTCIV", "ESC", "IDADE",
    "LINHAA", "LINHAB", "LINHAC", "LINHAD", "LINHAII", "CODMUNRES", "CODMUNOCOR", "OCUP",
)

# Seed CSVs (init.sql staging layouts :272-300, :342-354, :396-406) — only
# the consumed columns.
MUNICIPIO_SEED = _all_string(
    "id_municipio", "nome", "capital_uf", "nome_regiao_saude",
    "nome_regiao_metropolitana", "sigla_uf", "nome_uf", "nome_regiao",
)

CBO_SEED = _all_string(
    "cbo_2002", "descricao", "familia", "descricao_familia", "subgrupo",
    "descricao_subgrupo", "subgrupo_principal", "descricao_subgrupo_principal",
    "grande_grupo", "descricao_grande_grupo", "indicador_cbo_2002_ativa",
)

CID10_SEED = _all_string(
    "subcategoria", "descricao_subcategoria", "categoria", "descricao_categoria",
    "capitulo", "descricao_capitulo", "causa_violencia", "causa_overdose", "cid_datasus",
)

DIM_MUNICIPIO = StructType(
    [
        StructField("chave_municipio", IntegerType(), False),
        StructField("codigo_ibge", IntegerType(), True),
        StructField("nome_municipio", StringType(), True),
        StructField("uf", StringType(), True),
        StructField("estado", StringType(), True),
        StructField("regiao", StringType(), True),
        StructField("regiao_saude", StringType(), True),
        StructField("regiao_metropolitana", StringType(), True),
        StructField("is_capital", BooleanType(), True),
    ]
)

FACT_NASCIMENTOS = StructType(
    [
        StructField("chave_data", IntegerType(), True),
        StructField("chave_tempo", IntegerType(), True),
        StructField("chave_municipio_nascimento", IntegerType(), True),
        StructField("chave_municipio_residencia", IntegerType(), True),
        StructField("chave_demografia", IntegerType(), True),
        StructField("chave_info_nascimento", IntegerType(), True),
        StructField("quantidade_nascimentos", LongType(), False),
    ]
)

FACT_OBITOS = StructType(
    [
        StructField("chave_data_nascimento", IntegerType(), True),
        StructField("chave_data_obito", IntegerType(), True),
        StructField("chave_tempo_obito", IntegerType(), True),
        StructField("chave_municipio_residencia", IntegerType(), True),
        StructField("chave_municipio_obito", IntegerType(), True),
        StructField("chave_demografia", IntegerType(), True),
        StructField("chave_grupo_causa", StringType(), True),  # content-hash id
        StructField("chave_ocupacao", IntegerType(), True),
        StructField("quantidade_obitos", LongType(), False),
    ]
)

# Declared in the reference but never loaded (init.sql:252-262; the 'sih'
# dataset is commented out of the DAG at spark_dag.py:56).  This engine
# implements the load (operators/facts.py:build_fact_internacoes): the raw
# contract uses the public SIH-RD field names, dates arrive ddMMyyyy like
# the other landing datasets, and VAL_TOT maps to DecimalType(15,2) — money
# must aggregate exactly, never as double.
SIH_RAW = _all_string(
    "DT_INTER", "DT_SAIDA", "MUNIC_RES", "DIAG_PRINC", "DIAG_SECUN",
    "CBOR", "VAL_TOT", "QT_PROC",
)

FACT_INTERNACOES = StructType(
    [
        StructField("chave_data_entrada", IntegerType(), True),
        StructField("chave_data_saida", IntegerType(), True),
        StructField("chave_municipio", IntegerType(), True),
        StructField("chave_causa_primaria", IntegerType(), True),
        StructField("chave_causa_secundaria", IntegerType(), True),
        StructField("chave_ocupacao", IntegerType(), True),
        StructField("valor", DecimalType(15, 2), True),
        StructField("quantidade_procedimentos", LongType(), False),
    ]
)

DIM_DATA_COLUMNS = (
    "chave_data data DATE numero_dia_semana dia_semana numero_dia dia_ano "
    "numero_mes mes ano bimestre trimestre semestre"
)
