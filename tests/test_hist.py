"""Maintained order-value histogram: day-partial additivity, the shared
refresh contract, percentile semantics vs an exact sort, and the serving
plan pin (oracle value parity runs in the generic registry suite)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.queries import hist as q
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_day_partials_sum_to_single_pass_histogram(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    od = load_table(spark, SF_DIR, "orders").filter(F.col("o_totalprice").isNotNull())
    direct = _rows(
        od.select(
            F.floor(F.col("o_totalprice") / q.BUCKET_WIDTH).cast("int").alias("balde")
        )
        .groupBy("balde")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    folded = _rows(
        q.load_or_build_order_hist(spark, SF_DIR)
        .groupBy("balde")
        .agg(F.sum("n").alias("n"))
    )
    assert folded == direct


def test_refresh_equals_rebuild_and_is_idempotent(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx2"))
    full = _rows(q.hist_order_value_served(spark, SF_DIR))
    partials = _rows(q.load_or_build_order_hist(spark, SF_DIR))
    day = str(q.load_or_build_order_hist(spark, SF_DIR).agg(F.min("dia")).first()[0])
    q.refresh_order_hist(spark, SF_DIR, [day])
    assert _rows(q.hist_order_value_served(spark, SF_DIR)) == full
    assert _rows(q.load_or_build_order_hist(spark, SF_DIR)) == partials


def test_quantiles_bracket_the_exact_percentiles(spark, tmp_path, monkeypatch):
    """The served bucket lower bound must bracket the EXACT percentile:
    lower bound ≤ exact p-th value < lower bound + width.  Proves the
    cumulative-count rule picks the bucket the true order statistic
    lives in, not merely a bucket the oracle agrees on."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx3"))
    vals = sorted(
        r[0]
        for r in load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select("o_totalprice")
        .collect()
    )
    n = len(vals)
    for r in q.hist_quantiles_served(spark, SF_DIR).collect():
        exact = vals[math.ceil(n * r["pct"] / 100) - 1]  # p-th order statistic
        assert r["limite_inferior"] <= exact < r["limite_inferior"] + q.BUCKET_WIDTH, (
            r,
            exact,
        )


def test_serving_plan_never_scans_orders(spark, tmp_path, monkeypatch):
    from tests.test_plan_shapes import plan_of

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx4"))
    q.load_or_build_order_hist(spark, SF_DIR)  # build outside the plan
    for df in (
        q.hist_order_value_served(spark, SF_DIR),
        q.hist_quantiles_served(spark, SF_DIR),
    ):
        assert "orders" not in plan_of(df)


def test_refresh_scan_filter_pushes_down(spark):
    from tests.test_plan_shapes import plan_of

    plan = plan_of(q._day_partials(spark, SF_DIR, months=["1995-03"]))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(
        "o_orderdate" in ln and "GreaterThanOrEqual" in ln for ln in pushed
    ), pushed
