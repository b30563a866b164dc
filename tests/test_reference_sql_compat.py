"""SQL written for the reference warehouse runs unchanged on this engine.

The reference's OLAP queries (queries/queries-scripts.py, dashboard/app.py)
address tables/columns by the init.sql names; register_reference_views
exposes those names over the engine's Parquet warehouse.  The SQL below is
written in the reference's dialect/naming (independently authored, same
shapes) and must agree with the engine's own query layer.
"""

from __future__ import annotations

import pytest

from olap_sus_spark import etl
from olap_sus_spark.queries import warehouse as W
from tests.test_etl_e2e import DT, LANDING, SEEDS


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wh_refsql"))
    etl.bootstrap_warehouse(spark, SEEDS, d)
    etl.run_ingest(spark, "sinasc", DT, LANDING, d)
    etl.run_ingest(spark, "sim", DT, LANDING, d)
    etl.register_reference_views(spark, d)
    return d


def test_first_rollup_sql(spark, wh):
    got = spark.sql(
        """
        SELECT d_ocp.descricao_familia AS familia,
               d_dem.escolaridade AS escolaridade,
               SUM(f_obt.quantidade_obitos) AS quantidade_obitos
        FROM factObitos f_obt
        JOIN dimOcupacao d_ocp ON d_ocp.chave_ocupacao = f_obt.chave_ocupacao
        JOIN dimDemografia d_dem ON d_dem.chave_demografia = f_obt.chave_demografia
        GROUP BY d_ocp.descricao_familia, d_dem.escolaridade
        """
    ).collect()
    want = {
        (r.descricao_familia, r.escolaridade): r.quantidade_obitos
        for r in W.rollup_deaths_by_occupation_schooling(spark, wh).collect()
    }
    assert {(r.familia, r.escolaridade): r.quantidade_obitos for r in got} == want


def test_second_rollup_sql(spark, wh):
    got = spark.sql(
        """
        SELECT d_mun.estado AS estado,
               d_mae.faixa_etaria AS faixa_etaria_mae,
               SUM(f_nas.quantidade_nascimentos) AS quantidade_nascimentos
        FROM factNascimentos f_nas
        JOIN dimMunicipio d_mun
          ON d_mun.chave_municipio = f_nas.chave_municipio_nascimento
        JOIN dimDemografia d_mae
          ON d_mae.chave_demografia = f_nas.chave_demografia
        GROUP BY d_mun.estado, d_mae.faixa_etaria
        """
    ).collect()
    want = {
        (r.estado, r.faixa_etaria): r.quantidade_nascimentos
        for r in W.rollup_births_by_state_age(spark, wh).collect()
    }
    assert {(r.estado, r.faixa_etaria_mae): r.quantidade_nascimentos for r in got} == want


def test_topk_causes_sql(spark, wh):
    got = spark.sql(
        """
        WITH ranked AS (
            SELECT d2.descricao_familia,
                   d.descricao_subcategoria,
                   SUM(f.quantidade_obitos) AS total_obitos,
                   ROW_NUMBER() OVER (
                       PARTITION BY d2.descricao_familia
                       ORDER BY SUM(f.quantidade_obitos) DESC, d.descricao_subcategoria
                   ) AS ranking
            FROM factObitos f
            JOIN ponteGrupoCausas p ON p.chave_grupo_causa = f.chave_grupo_causa
            JOIN dimCausa d ON d.chave_causa = p.chave_causa
            JOIN dimOcupacao d2 ON d2.chave_ocupacao = f.chave_ocupacao
            WHERE p.ordem_causa = 1 AND d.codigo_cid != '0000'
            GROUP BY 1, 2
        )
        SELECT descricao_familia, descricao_subcategoria, total_obitos
        FROM ranked WHERE ranking <= 10
        """
    ).collect()
    want = {
        (r.descricao_familia, r.descricao_causa): r.quantidade_obitos
        for r in W.topk_causes_per_family(spark, wh, k=10).collect()
    }
    assert {
        (r.descricao_familia, r.descricao_subcategoria): r.total_obitos for r in got
    } == want


def test_time_alias(spark, wh):
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM dimHorario WHERE tempo = '14:30:00'"
    ).first().n == 1
