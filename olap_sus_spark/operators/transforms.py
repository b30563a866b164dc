"""Record-decode transforms (the reference ETL's cleaning layer).

Spark-native equivalents of ``transform_sinasc_raw`` / ``transform_sim_raw``
(/root/reference/dags/spark_script_sinasc.py:27-137,
/root/reference/dags/spark_script_sim.py:31-128): date parsing, HHmm time
normalization, null-normalizing casts, CASE-decode ladders for coded SUS
attributes, the 3-digit coded-age rule, and ICD-10 code cleanup.  All pure
Catalyst expressions (no UDFs — SURVEY.md §2.10: the reference surface is
100% built-ins, and so is this).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Decode tables (values byte-identical to the reference ladders).
# ---------------------------------------------------------------------------
RACA = {"1": "Branca", "2": "Preta", "3": "Amarela", "4": "Parda", "5": "Indígena"}
ESCOLARIDADE = {
    "1": "Nenhuma",
    "2": "1 a 3 anos",
    "3": "4 a 7 anos",
    "4": "8 a 11 anos",
    "5": "12 e mais",
}
ESTADO_CIVIL = {
    "1": "Solteiro",
    "2": "Casado",
    "3": "Viúvo",
    "4": "Separado judicialmente/divorciado",
    "5": "União estável",
}
PARTO = {"1": "Vaginal", "2": "Cesário"}
GESTACAO = {
    "1": "Menos de 22 semanas",
    "2": "22 a 27 semanas",
    "3": "28 a 31 semanas",
    "4": "32 a 36 semanas",
    "5": "37 a 41 semanas",
    "6": "42 semanas e mais",
}
GRAVIDEZ = {"1": "Única", "2": "Dupla", "3": "Tripla ou mais"}


def decode(col: Column | str, mapping: dict[str, str], default: str = "Ignorado") -> Column:
    """CASE-decode ladder (P1 family, spark_script_sinasc.py:62-135)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for k, v in mapping.items():
        expr = F.when(c == k, v) if expr is None else expr.when(c == k, v)
    return expr.otherwise(default)


def null_normalize(col: Column | str) -> Column:
    """Blank-or-null → NULL (P4, spark_script_sinasc.py:49-56)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (F.trim(c) == ""), None).otherwise(c)


def parse_ddmmyyyy(col: Column | str) -> Column:
    """ddMMyyyy string → date (spark_script_sinasc.py:32)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_date(c.cast("string"), "ddMMyyyy")


def normalize_hhmm(col: Column | str) -> Column:
    """HHmm string → 'HH:mm:00', invalid/blank/>2359 → '00:00:00'
    (spark_script_sinasc.py:35-46)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.lpad(c.cast("string"), 4, "0")
    return F.when(
        padded.isNull() | (padded == "0000") | (padded > "2359") | ~padded.rlike("^[0-9]{4}$"),
        F.lit("00:00:00"),
    ).otherwise(
        F.concat(F.substring(padded, 1, 2), F.lit(":"), F.substring(padded, 3, 2), F.lit(":00"))
    )


def municipality_key6(col: Column | str) -> Column:
    """First 6 digits of an IBGE municipality code as int; blank → NULL
    (spark_script_sinasc.py:49-56).  The dimension side derives its 6-digit
    key as floor(codigo_ibge / 10) (sinasc:178)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (F.trim(c) == ""), None).otherwise(
        F.substring(c.cast("string"), 1, 6).try_cast("int")
    )


def decode_coded_age(col: Column | str) -> Column:
    """SIM 3-digit coded age (spark_script_sim.py:90-102): first digit <4 →
    0 years; =4 → units value; =5 → units+100; else NULL."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.lpad(c, 3, "0")
    unit = F.substring(padded, 1, 1).try_cast("int")
    val = F.substring(padded, 2, 2).try_cast("int")
    return (
        F.when(unit < 4, 0)
        .when(unit == 4, val)
        .when(unit == 5, val + 100)
        .otherwise(F.lit(None).cast("int"))
    )


def clean_icd10(col: Column | str) -> Column:
    """ICD-10 cleanup: strip non-alphanumerics, drop trailing 'X'
    (spark_script_sim.py:106-108)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, "[^A-Z0-9]", ""), "X$", "")


def split_icd10_multi(col: Column | str) -> Column:
    """LINHAII-style multi-code field '*I48X*N40X' → array of clean codes
    (spark_script_sim.py:110-115)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.regexp_replace(c, "[^A-Z0-9*]", ""), "\\*")
    arr = F.filter(arr, lambda x: x != "")
    return F.transform(arr, lambda x: F.regexp_replace(x, "X$", ""))


# ---------------------------------------------------------------------------
# Full record transforms.
# ---------------------------------------------------------------------------

def transform_sinasc(df: DataFrame) -> DataFrame:
    """Decode a raw SINASC (live-birth) extract — all-string columns in,
    typed/labelled columns out (spark_script_sinasc.py:27-137)."""
    return df.select(
        "*",
        parse_ddmmyyyy("DTNASC").alias("data_nascimento"),
        normalize_hhmm("HORANASC").alias("tempo_nascimento"),
        municipality_key6("CODMUNNASC").alias("cod_mun_nasc"),
        municipality_key6("CODMUNRES").alias("cod_mun_res"),
        F.col("IDADEMAE").try_cast("int").alias("idade_mae"),
        decode("RACACORMAE", RACA).alias("raca_mae_desc"),
        decode("ESCMAE", ESCOLARIDADE).alias("esc_mae_desc"),
        decode("ESTCIVMAE", ESTADO_CIVIL).alias("estciv_mae_desc"),
        F.when(F.col("SEXO") == "1", "M").when(F.col("SEXO") == "2", "F").otherwise("I").alias("sexo_rn_desc"),
        decode("RACACOR", RACA).alias("raca_rn_desc"),
        F.col("PESO").try_cast("int").alias("peso_gramas"),
        decode("PARTO", PARTO).alias("parto_desc"),
        decode("GESTACAO", GESTACAO).alias("gestacao_desc"),
        decode("GRAVIDEZ", GRAVIDEZ).alias("gravidez_desc"),
    )


def transform_sim(df: DataFrame) -> DataFrame:
    """Decode a raw SIM (mortality) extract (spark_script_sim.py:31-128)."""
    sexo = (
        F.when((F.col("SEXO") == "1") | (F.col("SEXO") == "M"), "Masculino")
        .when((F.col("SEXO") == "2") | (F.col("SEXO") == "F"), "Feminino")
        .otherwise("Ignorado")
    )
    out = df.select(
        "*",
        parse_ddmmyyyy("DTOBITO").alias("data_obito"),
        parse_ddmmyyyy("DTNASC").alias("data_nascimento"),
        normalize_hhmm("HORAOBITO").alias("tempo_obito"),
        sexo.alias("sexo_desc"),
        decode("RACACOR", RACA).alias("raca_desc"),
        decode("ESTCIV", ESTADO_CIVIL).alias("estciv_desc"),
        decode("ESC", ESCOLARIDADE).alias("esc_desc"),
        decode_coded_age("IDADE").alias("idade_anos"),
        split_icd10_multi("LINHAII").alias("linhaii_arr"),
        municipality_key6("CODMUNRES").alias("cod_mun_res"),
        municipality_key6("CODMUNOCOR").alias("cod_mun_ocor"),
        F.trim(F.col("OCUP")).alias("ocupacao_cbo"),
    )
    for c in ("LINHAA", "LINHAB", "LINHAC", "LINHAD"):
        out = out.withColumn(f"{c.lower()}_clean", clean_icd10(c))
    return out


def transform_sih(df: DataFrame) -> DataFrame:
    """Decode a raw SIH (hospitalization) extract.

    The reference declares ``factInternacoes`` but never wrote its ETL
    (init.sql:252-262; 'sih' commented out at spark_dag.py:56), so the raw
    contract is defined here from the public SIH-RD layout: admission /
    discharge dates, residence municipality, primary / secondary ICD-10
    diagnoses, occupation CBO, total value, procedure count.  Same cleaning
    rules as the sibling datasets: ddMMyyyy dates, 6-digit municipality key,
    ICD-10 cleanup.  Money is ``DECIMAL(15,2)`` from the first cast —
    summing doubles would drift at 100 TB; blank → 0.00.  Blank QT_PROC → 1
    (a billed admission has at least one procedure)."""
    return df.select(
        "*",
        parse_ddmmyyyy("DT_INTER").alias("data_entrada"),
        parse_ddmmyyyy("DT_SAIDA").alias("data_saida"),
        municipality_key6("MUNIC_RES").alias("cod_mun_res"),
        clean_icd10(F.upper(F.trim(F.col("DIAG_PRINC")))).alias("causa_primaria_cid"),
        clean_icd10(F.upper(F.trim(F.col("DIAG_SECUN")))).alias("causa_secundaria_cid"),
        F.trim(F.col("CBOR")).alias("ocupacao_cbo"),
        F.coalesce(
            F.col("VAL_TOT").try_cast("decimal(15,2)"), F.lit(0).cast("decimal(15,2)")
        ).alias("valor"),
        F.coalesce(F.col("QT_PROC").try_cast("int"), F.lit(1)).alias("qt_procedimentos"),
    )
