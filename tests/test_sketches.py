"""KMV distinct-count sketch: fold invariance, estimator accuracy, the
maintained per-day partial table's refresh contract, and the serving plan
pin (oracle value parity runs in the generic registry suite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators.sketches import hash48, kmv_estimate, kmv_fold
from olap_sus_spark.queries import sketches as sk
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fold_result_independent_of_salt_buckets(spark):
    """The global k smallest hashes survive ANY disjoint bucketing, so the
    two-phase fold must be bit-identical across S — the property that
    makes S a pure memory knob at scale, never a correctness knob."""
    h = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", hash48("l_orderkey").alias("h")
    )
    a = _rows(kmv_fold(h, ["l_returnflag"], 64, salt_buckets=4))
    b = _rows(kmv_fold(h, ["l_returnflag"], 64, salt_buckets=64))
    assert a == b


def test_estimate_exact_below_k(spark):
    """Fewer distinct values than k → the sketch IS the set and the
    estimator must return the exact count (nation has 25 rows << k)."""
    h = load_table(spark, SF_DIR, "nation").select(hash48("n_nationkey").alias("h"))
    got = kmv_fold(h, [], 256).select(kmv_estimate(256, "est")).first()[0]
    assert got == 25


def test_estimate_accuracy_vs_exact(spark):
    """k=256 → RSE ≈ 1/sqrt(254) ≈ 6.3%; 25% is a ~4σ bound."""
    li = load_table(spark, SF_DIR, "lineitem")
    exact = li.select("l_orderkey").distinct().count()
    est = sk.kmv_distinct_orders_served(spark, SF_DIR).first()[0]
    assert exact > 256  # the estimator branch is actually live
    assert abs(est - exact) / exact < 0.25


def test_refresh_equals_rebuild_and_is_idempotent(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    full = _rows(sk.kmv_distinct_orders_served(spark, SF_DIR))
    # snapshot BEFORE the refresh: the overwrite replaces partition files,
    # so a pre-refresh DataFrame's captured listing goes stale by design
    partials = _rows(sk.load_or_build_orderkey_kmv(spark, SF_DIR))
    day = str(
        sk.load_or_build_orderkey_kmv(spark, SF_DIR).agg(F.min("dia")).first()[0]
    )
    sk.refresh_orderkey_kmv(spark, SF_DIR, [day])
    assert _rows(sk.kmv_distinct_orders_served(spark, SF_DIR)) == full
    # partial table row content unchanged by the idempotent re-refresh
    assert _rows(sk.load_or_build_orderkey_kmv(spark, SF_DIR)) == partials


def test_refresh_before_build_falls_back_to_full_build(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx2"))
    sk.refresh_orderkey_kmv(spark, SF_DIR, ["1995-03-15"])  # no table yet
    served = _rows(sk.kmv_distinct_orders_served(spark, SF_DIR))
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx3"))
    assert _rows(sk.kmv_distinct_orders_served(spark, SF_DIR)) == served


def test_day_partials_are_bounded_by_k(spark, tmp_path, monkeypatch):
    """≤ k rows per (day, flag) CELL — the state bound that makes serving
    O(days·|flags|·k)."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx4"))
    per_cell = (
        sk.load_or_build_orderkey_kmv(spark, SF_DIR)
        .groupBy("dia", "l_returnflag")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_cell <= sk.K


def test_serving_plan_never_scans_lineitem(spark, tmp_path, monkeypatch):
    """Serving folds the maintained partials only — at 100 TB the estimate
    must cost O(days·k), not a fact scan."""
    from tests.test_plan_shapes import plan_of

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx5"))
    sk.load_or_build_orderkey_kmv(spark, SF_DIR)  # build outside the plan
    plan = plan_of(sk.kmv_distinct_orders_served(spark, SF_DIR))
    assert "lineitem" not in plan


def test_pair_overlap_underfull_exact(spark):
    """Two under-full sketches ARE their sets, so every overlap output —
    |A|, |B|, |A∪B|, |A∩B| — must be the exact count (segments A: 0..99,
    B: 50..149 → 100/100/150/50)."""
    from olap_sus_spark.operators.sketches import kmv_pair_overlap

    rows = [("A", v) for v in range(100)] + [("B", v) for v in range(50, 150)]
    h = spark.createDataFrame(rows, "seg string, v int").select(
        "seg", hash48("v").alias("h")
    )
    got = kmv_pair_overlap(kmv_fold(h, ["seg"], 256), "seg", 256).first()
    assert tuple(got) == ("A", "B", 100, 100, 150, 50)


def test_segment_overlap_accuracy_vs_exact(spark):
    """Every estimate within 25% of its exact counterpart at sf0.001 —
    deterministic (fixed md5 hashes), ~4σ for the union and a generous
    band for the higher-variance ρ·est∪ intersection."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_returnflag").alias("f"), F.col("l_orderkey").alias("o")
    )
    exact = {}
    segs = [r[0] for r in li.select("f").distinct().collect()]
    for a in segs:
        for b in segs:
            if a < b:
                sa = li.filter(F.col("f") == a).select("o").distinct()
                sb = li.filter(F.col("f") == b).select("o").distinct()
                exact[(a, b)] = (
                    sa.count(),
                    sb.count(),
                    sa.union(sb).distinct().count(),
                    sa.intersect(sb).count(),
                )
    for r in sk.kmv_segment_overlap(spark, SF_DIR).collect():
        for est, ex in zip(r[2:], exact[(r[0], r[1])]):
            assert abs(est - ex) / ex < 0.25, (r, exact[(r[0], r[1])])


def test_monthly_served_equals_direct_fold(spark, tmp_path, monkeypatch):
    """Month-grain fold over the maintained DAY partials must equal the
    month sketch folded straight from the facts — the mergeability
    property that lets one partial table serve every coarser grain."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx6"))
    li = load_table(spark, SF_DIR, "lineitem").filter(F.col("l_orderkey").isNotNull())
    h = li.select(
        F.date_format("l_shipdate", "yyyy-MM").alias("mes_dt"),
        hash48("l_orderkey").alias("h"),
    )
    direct = _rows(
        kmv_fold(h, ["mes_dt"], sk.K).select(
            "mes_dt", kmv_estimate(sk.K, "est_orders")
        )
    )
    assert _rows(sk.kmv_monthly_distinct_served(spark, SF_DIR)) == direct


def test_flag_served_equals_direct_fold(spark, tmp_path, monkeypatch):
    """Flag-grain fold over the maintained (day, flag) cube must equal the
    per-flag sketch folded straight from the facts — the cube rolls up
    along the day axis exactly as the month query rolls up the flag axis."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx7"))
    li = load_table(spark, SF_DIR, "lineitem").filter(F.col("l_orderkey").isNotNull())
    h = li.select("l_returnflag", hash48("l_orderkey").alias("h"))
    direct = _rows(
        kmv_fold(h, ["l_returnflag"], sk.K).select(
            "l_returnflag", kmv_estimate(sk.K, "est_orders")
        )
    )
    assert _rows(sk.kmv_flag_distinct_served(spark, SF_DIR)) == direct


def test_overlap_served_matches_fact_pass_and_skips_lineitem(
    spark, tmp_path, monkeypatch
):
    """The served pair algebra must be bit-identical to the fact-pass
    variant AND its plan must never touch lineitem once the cube exists."""
    from tests.test_plan_shapes import plan_of

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx8"))
    sk.load_or_build_orderkey_kmv(spark, SF_DIR)  # build outside the plan
    served = sk.kmv_segment_overlap_served(spark, SF_DIR)
    assert "lineitem" not in plan_of(served)
    assert _rows(served) == _rows(sk.kmv_segment_overlap(spark, SF_DIR))


def test_refresh_scan_filter_pushes_down(spark):
    """Month-restricted refresh must reach the parquet scan as range
    predicates on l_shipdate (row-group pruning / lake partition pruning)."""
    from tests.test_plan_shapes import plan_of

    plan = plan_of(sk._day_partials(spark, SF_DIR, months=["1995-03"]))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(
        "l_shipdate" in ln and "GreaterThanOrEqual" in ln for ln in pushed
    ), pushed


def test_trailing_quarter_plan_never_scans_lineitem(spark, tmp_path, monkeypatch):
    from tests.test_plan_shapes import plan_of

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx9"))
    sk.load_or_build_orderkey_kmv(spark, SF_DIR)  # build outside the plan
    plan = plan_of(sk.kmv_trailing_quarter_distinct_served(spark, SF_DIR))
    assert "lineitem" not in plan


def test_active_users_plan_never_scans_events(spark, tmp_path, monkeypatch):
    from tests.test_plan_shapes import plan_of

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx10"))
    sk.load_or_build_user_kmv(spark, SF_DIR)  # build outside the plan
    plan = plan_of(sk.kmv_active_users_served(spark, SF_DIR))
    assert "events" not in plan


def test_user_kmv_refresh_equals_rebuild(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx11"))
    full = _rows(sk.kmv_active_users_served(spark, SF_DIR))
    day = str(sk.load_or_build_user_kmv(spark, SF_DIR).agg(F.min("dia")).first()[0])
    from olap_sus_spark.maintenance import refresh_event_summaries

    assert refresh_event_summaries(spark, SF_DIR, [day]) == [
        "user_kmv",
        "zorder_events",
    ]
    assert _rows(sk.kmv_active_users_served(spark, SF_DIR)) == full
