"""Static dashboard report (tools/dashboard_report.py): the six reference
dashboard queries rendered to one self-contained HTML file from a real
warehouse — the batch counterpart of the reference's Dash app."""

from __future__ import annotations

import pytest

from tests.test_etl_e2e import DT, LANDING, SEEDS

pytestmark = pytest.mark.slow  # hour-scale chain/probe suite: opt-in via -m slow (driver verify window, r11)



@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    from olap_sus_spark import etl

    d = str(tmp_path_factory.mktemp("wh_report"))
    etl.bootstrap_warehouse(spark, SEEDS, d)
    etl.run_ingest(spark, "sinasc", DT, LANDING, d)
    etl.run_ingest(spark, "sim", DT, LANDING, d)
    etl.run_ingest(spark, "sih", DT, LANDING, d)
    return d


def test_report_renders_all_six_sections(spark, wh, tmp_path):
    from tools.dashboard_report import build_report

    text = build_report(spark, wh)
    assert text.startswith("<!doctype html>")
    for frag in (
        "Top-10 causas",
        "Nascimentos por estado",
        "Slice &amp; dice",
        "Pivot",
        "Drill-across",
        "Roll-up",
    ):
        assert frag in text, frag
    # real data reached the tables and at least one chart rendered
    assert text.count("<table") == 6
    assert "<svg" in text and "<rect" in text
    assert "quantidade_obitos" in text
    out = tmp_path / "report.html"
    out.write_text(text)
    assert out.stat().st_size > 2000
