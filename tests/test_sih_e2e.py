"""Golden test for the SIH (hospitalizations) pipeline — the fact the
reference declares but never loads (init.sql:252-262, 'sih' commented out of
the DAG at spark_dag.py:56).  This engine implements it; the fixtures
exercise grain aggregation of the DECIMAL(15,2) money measure, role-playing
date/cause joins, sentinel policy, and the admission-date event rule."""

from __future__ import annotations

import os
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from olap_sus_spark import etl
from olap_sus_spark.operators.facts import INTERN_KEYS
from tests.test_etl_e2e import DT, LANDING, SEEDS

pytestmark = pytest.mark.slow  # hour-scale chain/probe suite: opt-in via -m slow (driver verify window, r11)



@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse_sih"))
    etl.bootstrap_warehouse(spark, SEEDS, wh)
    etl.run_ingest(spark, "sih", DT, LANDING, wh)
    return wh


def _fact(spark, wh):
    return spark.read.parquet(os.path.join(wh, "fact_internacoes"))


def test_grain_and_money_aggregation(spark, warehouse):
    """Two admissions with identical keys collapse to one row; DECIMAL(15,2)
    sums exactly (1500.50 + 500.25 — a double would be fine here, but the
    type must be decimal so it stays exact at any magnitude)."""
    fact = _fact(spark, warehouse)
    assert fact.count() == 3  # 5 raw rows: 2 merge, 1 dropped (no DT_INTER)
    assert dict(fact.dtypes)["valor"] == "decimal(15,2)"
    merged = fact.filter(F.col("quantidade_procedimentos") == 5).collect()
    assert len(merged) == 1
    assert merged[0].valor == Decimal("2000.75")


def test_sentinels_and_role_playing(spark, warehouse):
    fact = _fact(spark, warehouse)
    # Row 3: open stay -> chave_data_saida sentinel 0; no secondary cause.
    open_stay = fact.filter(F.col("valor") == Decimal("320.10")).collect()[0]
    assert open_stay.chave_data_saida == 0
    assert open_stay.chave_causa_secundaria == 0
    assert open_stay.chave_causa_primaria != 0  # J189 resolves
    assert open_stay.quantidade_procedimentos == 1
    # Row 5: unknown municipality / cause / CBO -> all sentinels; blank
    # QT_PROC -> 1.
    junk = fact.filter(F.col("valor") == Decimal("89.90")).collect()[0]
    assert junk.chave_municipio == 0
    assert junk.chave_causa_primaria == 0
    assert junk.chave_ocupacao == 0
    assert junk.quantidade_procedimentos == 1
    # Entry and exit dates role-play the same dim: two distinct keys on the
    # fully-resolved row.
    full = fact.filter(F.col("valor") == Decimal("2000.75")).collect()[0]
    assert full.chave_data_entrada not in (0, None)
    assert full.chave_data_saida not in (0, None, full.chave_data_entrada)


def test_event_date_rule_drops_dateless_admission(spark, warehouse):
    """The 100.00 row has no admission date -> dropped, not sentinel'd."""
    fact = _fact(spark, warehouse)
    assert fact.filter(F.col("valor") == Decimal("100.00")).count() == 0
    total = fact.agg(F.sum("valor").alias("v")).collect()[0].v
    assert total == Decimal("2410.75")


def test_reingest_is_idempotent(spark, warehouse):
    before = sorted(map(tuple, _fact(spark, warehouse).collect()))
    etl.run_ingest(spark, "sih", DT, LANDING, warehouse)
    after = sorted(map(tuple, _fact(spark, warehouse).collect()))
    assert before == after


def test_empty_fact_registered_when_not_ingested(spark, tmp_path):
    """A fresh warehouse (no sih drop yet) still exposes fact_internacoes as
    an empty queryable view."""
    wh = str(tmp_path / "wh_empty")
    etl.bootstrap_warehouse(spark, SEEDS, wh)
    etl.register_warehouse_views(spark, wh)
    out = spark.sql(
        "SELECT COUNT(*) AS n, SUM(valor) AS v FROM fact_internacoes"
    ).collect()[0]
    assert out.n == 0 and out.v is None
    etl.register_reference_views(spark, wh)
    assert spark.sql("SELECT COUNT(*) AS n FROM factInternacoes").collect()[0].n == 0


def test_fact_keys_match_reference_ddl(spark, warehouse):
    """Column set mirrors init.sql:252-262 (plus the dt partition)."""
    cols = set(_fact(spark, warehouse).columns)
    assert set(INTERN_KEYS) | {"valor", "quantidade_procedimentos", "dt"} == cols
