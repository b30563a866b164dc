"""Count-Min sketch: estimator guarantees (never under, exact when alone
in its slots), additivity of the maintained day grids, the refresh
contract, and the serving plan pin (oracle value parity runs in the
generic registry suite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators.cms import CMS_DEPTH, cms_build, cms_estimate
from olap_sus_spark.queries import cms as q
from tests.conftest import SF_DIR
import pytest


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_estimate_never_underestimates_and_absent_key_is_zero(spark):
    """Forced collisions (width 4, 50 keys): every estimate ≥ its true
    count — the one-sided CMS error — and a key never inserted estimates
    0 via the left-join/coalesce path (its slots may collide with real
    mass, so assert ≥ 0 and exactness only for the empty grid)."""
    data = [(f"k{i}", 1) for i in range(50) for _ in range(i + 1)]
    df = spark.createDataFrame(data, "k string, w int")
    sketch = cms_build(df, [], "k", "w", CMS_DEPTH, 4)
    cand = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    est = {r["k"]: r["est"] for r in cms_estimate(sketch, cand, "k", CMS_DEPTH, 4).collect()}
    exact = {f"k{i}": i + 1 for i in range(50)}
    assert all(est[k] >= exact[k] for k in exact)
    # width 4 << 50 keys → the grid is saturated; some estimate must exceed
    # its true count, i.e. the collision path is genuinely exercised
    assert any(est[k] > exact[k] for k in exact)
    # an empty sketch estimates 0 for everything (absent slots count 0)
    empty = cms_build(df.limit(0), [], "k", "w", CMS_DEPTH, 4)
    zeros = cms_estimate(empty, cand, "k", CMS_DEPTH, 4).collect()
    assert all(r["est"] == 0 for r in zeros)


def test_null_keys_never_pollute_real_slots(spark):
    """A NULL key must behave as SQL `||` does in the oracle: NULL slot,
    so its weight lands in no real slot and every real key's estimate is
    identical to a build over the null-filtered input."""
    data = [(f"k{i}", 2) for i in range(10)]
    with_null = spark.createDataFrame(data + [(None, 99)], "k string, w int")
    clean = spark.createDataFrame(data, "k string, w int")
    cand = clean.select("k").distinct()
    a = _rows(cms_estimate(cms_build(with_null, [], "k", "w", CMS_DEPTH, 8), cand, "k", CMS_DEPTH, 8))
    b = _rows(cms_estimate(cms_build(clean, [], "k", "w", CMS_DEPTH, 8), cand, "k", CMS_DEPTH, 8))
    assert a == b


def test_wide_grid_is_exact_for_isolated_keys(spark):
    """With width >> keys every key sits alone in at least one row's slot
    whp; for THIS fixed hash family and key set the estimates are exactly
    the true counts (deterministic — md5 hashes don't change)."""
    data = [(f"k{i}", 1) for i in range(20) for _ in range(3 * i + 1)]
    df = spark.createDataFrame(data, "k string, w int")
    sketch = cms_build(df, [], "k", "w", CMS_DEPTH, 4096)
    cand = df.select("k").distinct()
    est = {r["k"]: r["est"] for r in cms_estimate(sketch, cand, "k", CMS_DEPTH, 4096).collect()}
    assert est == {f"k{i}": 3 * i + 1 for i in range(20)}


def test_supplier_estimates_dominate_exact(spark):
    exact = {
        r["l_suppkey"]: r["cnt"]
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    est = {
        r["s_suppkey"]: r["est_items"]
        for r in q.cms_supplier_item_counts(spark, SF_DIR).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)


def test_day_grids_sum_to_single_pass_grid(spark, tmp_path, monkeypatch):
    """CMS additivity: the maintained day partials folded by (j, slot)
    must be bit-identical to the grid built in one pass over the facts."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    li = load_table(spark, SF_DIR, "lineitem").filter(F.col("l_suppkey").isNotNull())
    direct = _rows(cms_build(li, [], "l_suppkey", None, CMS_DEPTH, q.WIDTH))
    folded = _rows(
        q.load_or_build_supplier_cms(spark, SF_DIR)
        .groupBy("j", "slot")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert folded == direct


def test_refresh_equals_rebuild_and_is_idempotent(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx2"))
    full = _rows(q.cms_supplier_counts_served(spark, SF_DIR))
    partials = _rows(q.load_or_build_supplier_cms(spark, SF_DIR))
    day = str(
        q.load_or_build_supplier_cms(spark, SF_DIR).agg(F.min("dia")).first()[0]
    )
    q.refresh_supplier_cms(spark, SF_DIR, [day])
    assert _rows(q.cms_supplier_counts_served(spark, SF_DIR)) == full
    assert _rows(q.load_or_build_supplier_cms(spark, SF_DIR)) == partials


@pytest.mark.slow  # heavy probe: opt-in via -m slow (r11)
def test_refresh_before_build_falls_back_to_full_build(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx3"))
    q.refresh_supplier_cms(spark, SF_DIR, ["1995-03-15"])  # no table yet
    served = _rows(q.cms_supplier_counts_served(spark, SF_DIR))
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx4"))
    assert _rows(q.cms_supplier_counts_served(spark, SF_DIR)) == served


def test_day_grids_bounded_by_depth_width(spark, tmp_path, monkeypatch):
    """≤ depth·width rows per day — the state bound that makes serving
    O(days·depth·width) regardless of fact volume."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx5"))
    per_day = (
        q.load_or_build_supplier_cms(spark, SF_DIR)
        .groupBy("dia")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_day <= CMS_DEPTH * q.WIDTH


def test_serving_plan_never_scans_lineitem(spark, tmp_path, monkeypatch):
    """Serving folds the maintained grids and probes the supplier DIM —
    lineitem must not appear in the plan (the 100 TB point)."""
    from tests.test_plan_shapes import plan_of

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx6"))
    q.load_or_build_supplier_cms(spark, SF_DIR)  # build outside the plan
    for df in (
        q.cms_supplier_counts_served(spark, SF_DIR),
        q.cms_heavy_hitter_suppliers(spark, SF_DIR),
    ):
        assert "lineitem" not in plan_of(df)


def test_refresh_scan_filter_pushes_down(spark):
    from tests.test_plan_shapes import plan_of

    plan = plan_of(q._day_partials(spark, SF_DIR, months=["1995-03"]))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(
        "l_shipdate" in ln and "GreaterThanOrEqual" in ln for ln in pushed
    ), pushed


def test_trailing_heavy_hitters_plan_never_scans_lineitem(
    spark, tmp_path, monkeypatch
):
    from tests.test_plan_shapes import plan_of

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx9"))
    q.load_or_build_supplier_cms(spark, SF_DIR)  # build outside the plan
    plan = plan_of(q.cms_trailing_quarter_heavy_hitters(spark, SF_DIR))
    assert "lineitem" not in plan


def test_selfjoin_estimate_dominates_exact(spark):
    """The inner-product estimate must be >= the exact self-join size
    (sum of per-key frequency squares) — the AMS one-sided guarantee."""
    exact = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")))
        .first()[0]
    )
    est = q.cms_selfjoin_size_estimate(spark, SF_DIR).first()[0]
    assert est >= exact
    assert est <= 2 * exact  # 1024 slots vs 10 keys: collisions are rare
