"""Incremental aggregate maintenance: refreshing only the ingested dt
partitions must yield exactly the same served aggregate as a full rebuild,
and re-refreshing a day must be a no-op (idempotent)."""

from __future__ import annotations

import shutil

import pytest

from olap_sus_spark import etl
from tests.test_etl_e2e import DT, LANDING, SEEDS
from tests.test_streaming_ingest import DT2, _add_day2


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("inc_agg")
    landing = str(tmp / "landing")
    shutil.copytree(LANDING, landing)
    _add_day2(landing)
    wh = str(tmp / "wh")
    etl.bootstrap_warehouse(spark, SEEDS, wh)
    return landing, wh


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_refresh_equals_full_rebuild(spark, env):
    landing, wh = env
    # day 1 ingest -> refresh only day 1
    etl.run_ingest(spark, "sinasc", DT, landing, wh)
    etl.refresh_aggregate(spark, wh, "agg_nascimentos_uf_ano", dates=[DT])
    served_d1 = _rows(etl.read_aggregate(spark, wh, "agg_nascimentos_uf_ano"))
    assert served_d1  # non-empty after first day

    # day 2 ingest -> refresh only day 2 (day 1 partials untouched)
    etl.run_ingest(spark, "sinasc", DT2, landing, wh)
    etl.refresh_aggregate(spark, wh, "agg_nascimentos_uf_ano", dates=[DT2])
    served = _rows(etl.read_aggregate(spark, wh, "agg_nascimentos_uf_ano"))

    # oracle: full rebuild over the complete fact history
    etl.refresh_aggregate(spark, wh, "agg_nascimentos_uf_ano", dates=None)
    full = _rows(etl.read_aggregate(spark, wh, "agg_nascimentos_uf_ano"))
    assert served == full
    assert served != served_d1  # day 2 actually contributed


def test_refresh_is_idempotent(spark, env):
    landing, wh = env
    before = _rows(etl.read_aggregate(spark, wh, "agg_nascimentos_uf_ano"))
    etl.refresh_aggregate(spark, wh, "agg_nascimentos_uf_ano", dates=[DT])
    assert _rows(etl.read_aggregate(spark, wh, "agg_nascimentos_uf_ano")) == before


def test_obitos_aggregate_round_trip(spark, env):
    landing, wh = env
    etl.run_ingest(spark, "sim", DT, landing, wh)
    etl.refresh_aggregate(spark, wh, "agg_obitos_uf_ano", dates=[DT])
    got = etl.read_aggregate(spark, wh, "agg_obitos_uf_ano")
    assert got.count() > 0
    total = got.agg({"quantidade_obitos": "sum"}).collect()[0][0]
    import os
    from pyspark.sql import functions as F
    fact = spark.read.parquet(os.path.join(wh, "fact_obitos"))
    want = fact.agg(F.sum("quantidade_obitos")).collect()[0][0]
    assert total == want


# ---------------------------------------------------------------------------
# Driver-table twin (queries/incremental.py): maintained day-grain revenue
# partials over lineitem, served as the oracle'd incremental_revenue_by_month
# registered query.


def test_daily_revenue_refresh_is_idempotent_and_complete(spark, tmp_path, monkeypatch):
    from olap_sus_spark.queries import incremental as inc
    from tests.conftest import SF_DIR

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    served = inc.incremental_revenue_by_month(spark, SF_DIR)
    full = sorted(tuple(r) for r in served.collect())
    assert full

    # pick one real day and re-refresh it: the partial table must be
    # bit-identical afterwards (idempotent maintenance), and serving must
    # still equal the full recompute
    partials = inc.load_or_build_daily_revenue(spark, SF_DIR)
    day = str(partials.select("dia").orderBy("dia").first()[0])
    inc.refresh_daily_revenue(spark, SF_DIR, [day])
    again = sorted(
        tuple(r) for r in inc.incremental_revenue_by_month(spark, SF_DIR).collect()
    )
    assert again == full

    # refresh must have rewritten ONLY the one month partition it targeted
    import os

    root = inc.daily_revenue_path(SF_DIR)
    assert sorted(d for d in os.listdir(root) if d.startswith("mes_dt="))
    # month dirs other than the refreshed one keep their original files
    # (dynamic overwrite touches only matching partitions) — spot-check via
    # the served equality above plus partition count stability
    n_months = len([d for d in os.listdir(root) if d.startswith("mes_dt=")])
    inc.refresh_daily_revenue(spark, SF_DIR, [day])
    assert len([d for d in os.listdir(root) if d.startswith("mes_dt=")]) == n_months


def test_refresh_before_build_falls_back_to_full_build(spark, tmp_path, monkeypatch):
    """Refreshing a never-built partial table must produce the COMPLETE
    table (a months-only write would be silently mistaken for the full
    table by every later serve)."""
    from olap_sus_spark.queries import incremental as inc
    from tests.conftest import SF_DIR

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx2"))
    inc.refresh_daily_revenue(spark, SF_DIR, ["1995-03-15"])  # no table yet
    served = sorted(
        tuple(r) for r in inc.incremental_revenue_by_month(spark, SF_DIR).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx3"))
    full = sorted(
        tuple(r) for r in inc.incremental_revenue_by_month(spark, SF_DIR).collect()
    )
    assert served == full


def test_refresh_scan_filter_pushes_down(spark, tmp_path, monkeypatch):
    """The month-restricted rebuild scan must reach the parquet reader as
    plain range predicates on l_shipdate (row-group pruning; partition
    pruning on a date-partitioned lake) — an expression-wrapped filter
    (date_format IN ...) would scan the full history every refresh."""
    import io
    from contextlib import redirect_stdout

    from olap_sus_spark.queries import incremental as inc
    from tests.conftest import SF_DIR

    df = inc._partials(spark, SF_DIR, months=["1995-03"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln and "GreaterThanOrEqual" in ln for ln in pushed), pushed


def test_refresh_on_changed_facts_is_incremental_and_correct(spark, tmp_path, monkeypatch):
    """The real maintenance loop: facts CHANGE, the caller refreshes only
    the ingested day, and the served aggregate equals a recompute over the
    new facts — while an ingest WITHOUT refresh triggers the safe full
    rebuild instead of serving stale partials."""
    import os
    import shutil

    def _replace(dst, src):
        shutil.rmtree(dst) if os.path.isdir(dst) else os.remove(dst)
        shutil.move(src, dst)

    from pyspark.sql import functions as F

    from olap_sus_spark.catalog import load_table
    from olap_sus_spark.queries import incremental as inc
    from tests.conftest import SF_DIR

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    for t in ("lineitem",):
        src = os.path.join(SF_DIR, f"{t}.parquet")
        (shutil.copytree if os.path.isdir(src) else shutil.copy)(
            src, os.path.join(sf, f"{t}.parquet")
        )

    base = sorted(
        tuple(r) for r in inc.incremental_revenue_by_month(spark, sf).collect()
    )
    assert base

    # "ingest": duplicate one existing day's rows (append-style change)
    li = load_table(spark, sf, "lineitem")
    day = str(li.select(F.to_date("l_shipdate").alias("d")).orderBy("d").first()[0])
    extra = li.filter(F.to_date("l_shipdate") == day)
    new_li = li.unionByName(extra)
    tmp_out = str(tmp_path / "li_new.parquet")
    new_li.write.mode("overwrite").parquet(tmp_out)
    _replace(os.path.join(sf, "lineitem.parquet"), tmp_out)

    # refresh ONLY the changed day -> served == recompute over new facts
    inc.refresh_daily_revenue(spark, sf, [day])
    served = sorted(
        tuple(r) for r in inc.incremental_revenue_by_month(spark, sf).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx_fresh"))
    recomputed = sorted(
        tuple(r) for r in inc.incremental_revenue_by_month(spark, sf).collect()
    )
    assert served == recomputed
    assert served != base  # the change is visible

    # stale-marker path: mutate facts again WITHOUT refresh -> serve must
    # detect the mismatch and full-rebuild, never serve the old partials
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    li2 = load_table(spark, sf, "lineitem")
    extra2 = li2.filter(F.to_date("l_shipdate") == day)
    tmp_out2 = str(tmp_path / "li_new2.parquet")
    li2.unionByName(extra2).write.mode("overwrite").parquet(tmp_out2)
    _replace(os.path.join(sf, "lineitem.parquet"), tmp_out2)
    served2 = sorted(
        tuple(r) for r in inc.incremental_revenue_by_month(spark, sf).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx_fresh2"))
    recomputed2 = sorted(
        tuple(r) for r in inc.incremental_revenue_by_month(spark, sf).collect()
    )
    assert served2 == recomputed2
