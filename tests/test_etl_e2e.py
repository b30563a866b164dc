"""End-to-end golden test for the batch ETL (SURVEY.md §5.4).

Runs bootstrap + both ingest pipelines on tiny hand-written fixtures
(tests/fixtures/, per FIXTURES.md §B) and asserts hand-computed fact-table
contents: grain collapse, sentinel FK policy, band assignment, invalid-date
drops, bridge-group identity, and idempotent re-runs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from olap_sus_spark import etl
from olap_sus_spark.operators.facts import NASC_KEYS, OBITO_KEYS

pytestmark = pytest.mark.slow  # hour-scale chain/probe suite: opt-in via -m slow (driver verify window, r11)


FIX = os.path.join(os.path.dirname(__file__), "fixtures")
SEEDS = {
    "municipio": os.path.join(FIX, "seeds", "municipio.csv"),
    "ocupacao": os.path.join(FIX, "seeds", "cbo.csv"),
    "causa": os.path.join(FIX, "seeds", "cid10.csv"),
}
LANDING = os.path.join(FIX, "landing")
DT = "2024-01-15"

# 'HH:mm:00' = second-of-day + 1 (1-based keys);
# '00:00:00' (the blank/invalid-hour fallback) -> chave 1.
CHAVE_1030 = 10 * 3600 + 30 * 60 + 1
CHAVE_1430 = 14 * 3600 + 30 * 60 + 1
CHAVE_MIDNIGHT = 1


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    etl.bootstrap_warehouse(spark, SEEDS, wh)
    etl.run_ingest(spark, "sinasc", DT, LANDING, wh)
    etl.run_ingest(spark, "sim", DT, LANDING, wh)
    return wh


def _read(spark, wh, table):
    return spark.read.parquet(os.path.join(wh, table))


def test_dimensions_bootstrapped(spark, warehouse):
    mun = _read(spark, warehouse, "dim_municipio")
    assert mun.count() == 9  # 8 seed rows + sentinel
    assert mun.filter("chave_municipio = 0").count() == 1
    causa = _read(spark, warehouse, "dim_causa")
    assert causa.filter("codigo_cid10 = '0000' AND chave_causa = 0").count() == 1
    assert _read(spark, warehouse, "dim_horario").count() == 86401
    data = _read(spark, warehouse, "dim_data")
    assert data.filter("chave_data = 0").count() == 1


def test_fact_nascimentos_golden(spark, warehouse):
    fact = _read(spark, warehouse, "fact_nascimentos")
    rows = fact.collect()
    # 6 raw rows: 1 invalid date (31 Feb) dropped, 2 identical rows collapse.
    assert len(rows) == 4
    assert sum(r.quantidade_nascimentos for r in rows) == 5
    # no NULL keys anywhere (sentinel policy)
    for r in rows:
        for k in NASC_KEYS:
            assert r[k] is not None

    dup = [r for r in rows if r.quantidade_nascimentos == 2]
    assert len(dup) == 1
    assert dup[0].chave_tempo == CHAVE_1030
    assert dup[0].chave_municipio_nascimento != 0
    assert dup[0].chave_municipio_residencia != 0
    assert dup[0].chave_demografia != 0
    assert dup[0].chave_info_nascimento != 0

    # blank residence code -> sentinel 0; invalid hour 2360 -> 00:00:00.
    missing_res = [r for r in rows if r.chave_municipio_residencia == 0]
    assert len(missing_res) == 1
    assert missing_res[0].chave_tempo == CHAVE_MIDNIGHT
    # unknown birth municipality 9999999 -> sentinel 0.
    assert len([r for r in rows if r.chave_municipio_nascimento == 0]) == 1


def test_fact_nascimentos_demografia_bands(spark, warehouse):
    """NULL mother age matches the 'Ignorado' band member, not the sentinel."""
    fact = _read(spark, warehouse, "fact_nascimentos")
    demog = _read(spark, warehouse, "dim_demografia")
    joined = fact.join(demog, "chave_demografia").select("faixa_etaria", "quantidade_nascimentos")
    bands = {r.faixa_etaria: r.quantidade_nascimentos for r in joined.collect()}
    assert bands["21 a 25 anos"] == 2  # age 25 twice
    assert bands["16 a 20 anos"] == 1  # age 17
    assert bands["41 a 45 anos"] == 1  # age 42
    assert bands["Ignorado"] == 1      # blank age -> Ignorado band (not key 0)


def test_fact_obitos_golden(spark, warehouse):
    fact = _read(spark, warehouse, "fact_obitos")
    rows = fact.collect()
    # 5 raw rows: 1 invalid DTOBITO (32 Jan) dropped, 2 identical collapse.
    assert len(rows) == 3
    assert sum(r.quantidade_obitos for r in rows) == 4

    for r in rows:
        for k in OBITO_KEYS:
            assert r[k] is not None

    dup = [r for r in rows if r.quantidade_obitos == 2]
    assert len(dup) == 1
    assert dup[0].chave_tempo_obito == CHAVE_1430
    assert dup[0].chave_ocupacao != 0
    assert dup[0].chave_grupo_causa not in (None, "0")
    assert dup[0].chave_data_nascimento != 0

    # unknown CBO + blank birth date + blank hour -> sentinels.
    r2 = [r for r in rows if r.chave_ocupacao == 0 and r.chave_grupo_causa != "0"]
    assert len(r2) == 1
    assert r2[0].chave_data_nascimento == 0
    assert r2[0].chave_tempo_obito == CHAVE_MIDNIGHT

    # cause-less death -> sentinel group '0'.
    r3 = [r for r in rows if r.chave_grupo_causa == "0"]
    assert len(r3) == 1
    assert r3[0].chave_municipio_residencia == 0


def test_bridge_contents(spark, warehouse):
    bridge = _read(spark, warehouse, "ponte_grupo_causas")
    causa = _read(spark, warehouse, "dim_causa")
    # sentinel group + 3-cause group (I219,I48,E149) + 1-cause group (X999).
    assert bridge.select("chave_grupo_causa").distinct().count() == 3
    assert bridge.count() == 5

    named = (
        bridge.join(causa, "chave_causa")
        .groupBy("chave_grupo_causa")
        .agg(F.sort_array(F.collect_list(F.struct("ordem_causa", "codigo_cid10"))).alias("causas"))
        .collect()
    )
    sigs = {tuple((c.ordem_causa, c.codigo_cid10) for c in r.causas) for r in named}
    assert ((1, "I219"), (2, "I48"), (5, "E149")) in sigs  # trailing X stripped, part II at 5
    assert ((1, "X999"),) in sigs
    assert ((1, "0000"),) in sigs  # sentinel group


def test_reingest_is_idempotent(spark, warehouse):
    etl.run_ingest(spark, "sim", DT, LANDING, warehouse)
    etl.run_ingest(spark, "sinasc", DT, LANDING, warehouse)
    assert _read(spark, warehouse, "fact_obitos").count() == 3
    assert sum(r.quantidade_obitos for r in _read(spark, warehouse, "fact_obitos").collect()) == 4
    assert _read(spark, warehouse, "fact_nascimentos").count() == 4
    assert _read(spark, warehouse, "ponte_grupo_causas").count() == 5  # no duplicate groups


def test_warehouse_views_round_trip(spark, warehouse):
    etl.register_warehouse_views(spark, warehouse)
    out = spark.sql(
        """
        SELECT d.ano, SUM(f.quantidade_nascimentos) AS nascimentos
        FROM fact_nascimentos f JOIN dim_data d ON f.chave_data = d.chave_data
        GROUP BY d.ano
        """
    ).collect()
    assert [(r.ano, r.nascimentos) for r in out] == [(2024, 5)]


def test_backfill_matches_single_day_ingests(spark, tmp_path):
    """VERDICT r4 #7: Airflow-catchup analogue.  A windowed run_backfill over
    a 4-day window (one day with no landing drop) must produce the identical
    warehouse — facts, bridge, and maintained aggregate — as per-day
    run_ingest + per-day refresh, and skip the empty day like a catchup run
    over an empty source prefix."""
    import shutil

    landing = tmp_path / "landing"
    days = ["2024-01-15", "2024-01-17", "2024-01-18"]  # 16th deliberately absent
    for d in days:
        dst = landing / "sinasc" / f"dt={d}"
        dst.mkdir(parents=True)
        shutil.copy(
            os.path.join(LANDING, "sinasc", f"dt={DT}", "part-0.csv"),
            dst / "part-0.csv",
        )

    wh_backfill = str(tmp_path / "wh_backfill")
    wh_manual = str(tmp_path / "wh_manual")
    etl.bootstrap_warehouse(spark, SEEDS, wh_backfill)
    etl.bootstrap_warehouse(spark, SEEDS, wh_manual)

    ingested = etl.run_backfill(
        spark, "sinasc", "2024-01-15", "2024-01-18", str(landing), wh_backfill
    )
    assert ingested == days  # the gap day was skipped, not an error

    for d in days:  # the Airflow-shaped equivalent: one task per day
        etl.run_ingest(spark, "sinasc", d, str(landing), wh_manual)
        etl.refresh_aggregate(spark, wh_manual, "agg_nascimentos_uf_ano", dates=[d])

    fact_cols = sorted(_read(spark, wh_backfill, "fact_nascimentos").columns)
    a = sorted(map(tuple, _read(spark, wh_backfill, "fact_nascimentos").select(*fact_cols).collect()))
    b = sorted(map(tuple, _read(spark, wh_manual, "fact_nascimentos").select(*fact_cols).collect()))
    assert a == b and len(a) == 12  # 4 collapsed rows x 3 days

    agg_a = sorted(map(tuple, etl.read_aggregate(spark, wh_backfill, "agg_nascimentos_uf_ano").collect()))
    agg_b = sorted(map(tuple, etl.read_aggregate(spark, wh_manual, "agg_nascimentos_uf_ano").collect()))
    assert agg_a == agg_b and agg_a  # same served totals (15 births across 3 days)

    # Re-backfilling the same window is idempotent (dynamic partition overwrite).
    again = etl.run_backfill(
        spark, "sinasc", "2024-01-15", "2024-01-18", str(landing), wh_backfill
    )
    assert again == days
    a2 = sorted(map(tuple, _read(spark, wh_backfill, "fact_nascimentos").select(*fact_cols).collect()))
    assert a2 == a
