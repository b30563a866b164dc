"""Round-7 hardening (ADVICE r06): promote-failure month restore in
refresh_partials, link-unsupported fallback in append_exactly_once,
malformed-manifest degrade-to-stale, and the durable prefix-sum barrier."""

from __future__ import annotations

import errno
import os

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # hour-scale chain/probe suite: opt-in via -m slow (driver verify window, r11)



def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# maintained.refresh_partials: a promote rename that fails for a reason
# OTHER than a concurrent winner must restore the retired live month, not
# delete it (ADVICE: silent loss of the month partition).
# ---------------------------------------------------------------------------
def test_refresh_promote_failure_restores_retired_month(spark, tmp_path, monkeypatch):
    from olap_sus_spark.operators import maintained as mt

    data = {
        "2024-01": [(1, 10.0), (2, 11.0)],
        "2024-02": [(3, 20.0)],
    }

    def build(months):
        rows = [
            (m, k, v)
            for m, kvs in data.items()
            for k, v in kvs
            if months is None or m in months
        ]
        return spark.createDataFrame(rows, "mes_dt string, k int, v double")

    path = str(tmp_path / "partials")
    mt.load_or_build_partials(spark, path, "s1", build)
    before = _rows(spark.read.parquet(path))
    assert len(before) == 3

    data["2024-01"] = [(1, 99.0)]  # the refresh would change January

    real_rename = os.rename

    def failing_promote(src, dst):
        # fail ONLY the staged-month -> live promote (src inside a staging
        # dir, src not a tomb); retire and tomb-restore renames pass through
        if ".__build__" in src and not src.endswith(".stale"):
            raise OSError(errno.ENOENT, "injected promote failure", src)
        real_rename(src, dst)

    monkeypatch.setattr(mt.os, "rename", failing_promote)
    mt.refresh_partials(spark, path, "s1", build, ["2024-01-15"])
    monkeypatch.setattr(mt.os, "rename", real_rename)

    # the month partition must still exist and serve its PRE-refresh rows
    # (refresh degraded to a no-op, never to data loss)
    assert _rows(spark.read.parquet(path)) == before
    assert os.path.isdir(os.path.join(path, "mes_dt=2024-01"))

    # an unpatched refresh then applies the change normally
    mt.refresh_partials(spark, path, "s1", build, ["2024-01-15"])
    after = _rows(spark.read.parquet(path))
    assert (1, 99.0, "2024-01") in after and len(after) == 2


# ---------------------------------------------------------------------------
# sinks.append_exactly_once: filesystems without hard-link support
# (EPERM/EXDEV/ENOTSUP from os.link) fall back to the exists-check +
# rename commit instead of failing the append outright.
# ---------------------------------------------------------------------------
def test_append_exactly_once_without_hardlink_support(spark, tmp_path, monkeypatch):
    from olap_sus_spark.sources import sinks

    table = str(tmp_path / "facts")
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")

    def no_link(src, dst):
        raise OSError(errno.EPERM, "Operation not permitted (no hardlinks)")

    monkeypatch.setattr(sinks.os, "link", no_link)
    sinks.append_exactly_once(batch, table, 3, "runX")
    assert _rows(spark.read.parquet(table)) == [(1, "a"), (2, "b")]
    # replay of the same batch is still a no-op (file already present)
    sinks.append_exactly_once(batch, table, 3, "runX")
    assert _rows(spark.read.parquet(table)) == [(1, "a"), (2, "b")]
    # an unexpected errno still raises (not swallowed into the fallback)
    def bad_link(src, dst):
        raise OSError(errno.EIO, "io error")

    monkeypatch.setattr(sinks.os, "link", bad_link)
    import pytest

    with pytest.raises(OSError):
        sinks.append_exactly_once(batch, table, 4, "runX")


# ---------------------------------------------------------------------------
# index_store: legacy / hand-edited manifests with unexpected value shapes
# degrade to stale (force rebuild), never raise out of the compaction path.
# ---------------------------------------------------------------------------
def test_malformed_manifest_degrades_to_stale():
    from olap_sus_spark.operators.index_store import (
        compact_manifest,
        manifest_is_current,
    )

    current = {"a.parquet": [10, 100], "b.parquet": [20, 200]}
    malformed = [
        {"files": {"a.parquet": 10}, "epochs": []},          # value not a pair
        {"files": {"a.parquet": [10, 100]}, "epochs": "junk"},  # epochs not a list of dicts
        {"files": {"a.parquet": [10, 100]}, "epochs": [{"nmes": ["a.parquet"]}]},  # missing key
        {"files": None, "epochs": [{"names": None, "h": "x"}]},
    ]
    for man in malformed:
        assert manifest_is_current(man, current) is False
        out = compact_manifest(man, current)  # must not raise
        assert set(out) == {"files", "epochs"}
        assert out["files"] == current  # malformed epochs dropped → all loose


# ---------------------------------------------------------------------------
# prefix.running_total: the durable (replicated-persist) barrier variant
# returns identical results to the localCheckpoint default.
# ---------------------------------------------------------------------------
def test_running_total_durable_barrier_matches(spark):
    from olap_sus_spark.operators.prefix import running_total

    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("v"), F.col("id").alias("k")
    )
    order = [F.col("v"), F.col("k")]  # k is the tiebreak key
    base = _rows(running_total(df, order, F.col("v"), "rt"))
    durable = running_total(df, order, F.col("v"), "rt", durable=True)
    assert _rows(durable) == base
    # the exposed handle is the plan that was ACTUALLY persisted — calling
    # .unpersist() on the result itself is a no-op (it was never cached)
    assert durable.prefix_barrier.storageLevel.useDisk
    durable.prefix_barrier.unpersist()
    assert not durable.prefix_barrier.storageLevel.useDisk


def test_running_total_exact_under_massive_ties(spark):
    """The tiebreak-key requirement, asserted (VERDICT r06 #5): with 90 %
    identical order values, a tiebreak column in ``order`` makes the total
    order unambiguous and running_total must equal the single-partition
    window oracle EXACTLY — and the range exchange must not funnel the tied
    mass into one task (no partition > 2× the mean)."""
    from pyspark.sql import Window

    from olap_sus_spark.operators.prefix import running_total

    n = 200_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 == 0, (F.col("id") % 97).cast("double"))
        .otherwise(F.lit(5.0))
        .alias("v"),
        F.col("id").alias("k"),
    )
    order = [F.col("v").desc(), F.col("k")]
    got = running_total(df, order, F.col("v"), "rt", num_ranges=32)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("rt", F.sum("v").over(w))
    assert _rows(got) == _rows(want)
    # range-partition balance under the tie flood: the sampler can only
    # split ties because the tiebreak key is part of the boundary tuple
    sizes = [
        r[1]
        for r in df.repartitionByRange(32, *order)
        .groupBy(F.spark_partition_id())
        .count()
        .collect()
    ]
    mean = sum(sizes) / len(sizes)
    assert max(sizes) <= 2 * mean, (max(sizes), mean, len(sizes))
