"""Morton-domain drift boundary probe (VERDICT r07 #4).

scale_to_bits CLAMPS out-of-domain keys (sources/zorder.py) — correct, but
every clamped row lands on the domain-edge Morton cells, so pruning inside
a drifted month silently degrades toward scan-everything.  This probe
MEASURES that loss and the recovery from the documented re-layout trigger
(zorder.ESCAPE_REBUILD_FRACTION):

1. stage sf0.01 lineitem in a temp corpus; build the monthly z-layout;
2. append a WHOLE MONTH whose cluster keys sit 2x outside the stored
   domain (monotone id growth — the canonical drift shape), replicated 8x
   so the month is large enough to spread over many range partitions;
3. refresh with the trigger DISABLED -> measure row_groups_touched for an
   in-month box on the drifted keys (expect ~100%: clamped _z values are
   all equal, the month collapses into one undiscriminated range
   partition);
4. refresh again with the trigger at its default -> the escape fraction
   (1.0 >> 0.2) fires the staged full rebuild with a re-derived domain ->
   re-measure the same box (expect a small fraction).

Pass: post-trigger touched fraction < 0.5 x pre-trigger fraction, and the
layout stays a permutation of the corpus throughout.

Usage: python tools/zdomain_drift_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olap_sus_spark.catalog import load_table  # noqa: E402
from olap_sus_spark.session import get_spark  # noqa: E402
from olap_sus_spark.sources import zorder as zo  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
KEYS = ("lineitem", "l_partkey", "l_suppkey", "l_shipdate")


def main() -> None:
    idx = tempfile.mkdtemp(prefix="zdrift_idx_")
    os.environ["SPARK_GRAFT_INDEX_DIR"] = idx
    sf = tempfile.mkdtemp(prefix="zdrift_sf_")
    shutil.copy(
        os.path.join(BASE_SF, "lineitem.parquet"),
        os.path.join(sf, "lineitem.parquet"),
    )
    spark = get_spark("zdomain-drift-probe")
    spark.sparkContext.setLogLevel("ERROR")

    zo.load_or_build_zorder_monthly(spark, sf, *KEYS)
    path = zo.zorder_monthly_path(sf, *KEYS)
    dom0 = zo._read_domain(path)
    print(f"stored domain: {dom0}")

    # a whole month of drifted keys, 8x the corpus so it spans many files
    li = load_table(spark, sf, "lineitem")
    n_base = li.count()
    max_day = li.agg(F.max(F.to_date("l_shipdate"))).first()[0]
    sx, sy = 2 * int(dom0[1]), 2 * int(dom0[3])
    reps = [
        li.withColumn("l_partkey", F.col("l_partkey") + F.lit(sx + r))
        .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(sy + r))
        .withColumn(
            "l_shipdate",
            F.lit(str(max_day)).cast("date")
            + F.make_interval(days=F.lit(40) + F.col("l_orderkey") % 25),
        )
        for r in range(8)
    ]
    extra = reps[0]
    for r in reps[1:]:
        extra = extra.unionByName(r)
    staged = os.path.join(sf, "staged.parquet")
    li.unionByName(extra).write.mode("overwrite").parquet(staged)
    os.remove(os.path.join(sf, "lineitem.parquet"))
    os.rename(staged, os.path.join(sf, "lineitem.parquet"))
    li2 = load_table(spark, sf, "lineitem")
    new_month = (
        li2.filter(F.col("l_partkey") > sx)
        .select(F.date_format("l_shipdate", "yyyy-MM").alias("m"))
        .first()[0]
    )
    one_day = str(
        li2.filter(F.col("l_partkey") > sx)
        .agg(F.min(F.to_date("l_shipdate")))
        .first()[0]
    )
    print(f"drifted month {new_month}, refresh day {one_day}, +{n_base * 8} rows")

    # the box: a selective slice INSIDE the drifted key range
    box = {
        "l_partkey": (sx + int(dom0[1]) // 4, sx + int(dom0[1]) // 4 + max(2, int(dom0[1]) // 8)),
        "l_suppkey": (sy + int(dom0[3]) // 4, sy + int(dom0[3]) // 4 + max(2, int(dom0[3]) // 8)),
    }

    # --- refresh with the trigger DISABLED: domain reused, keys clamp ---
    saved = zo.ESCAPE_REBUILD_FRACTION
    zo.ESCAPE_REBUILD_FRACTION = 2.0
    try:
        zo.refresh_zorder_monthly(spark, sf, *KEYS, [one_day])
    finally:
        zo.ESCAPE_REBUILD_FRACTION = saved
    assert zo._read_domain(path) == dom0, "trigger disabled: domain must be reused"
    month_dir = os.path.join(path, f"mes_dt={new_month}")
    t_pre, tot_pre = zo.row_groups_touched(month_dir, box)
    frac_pre = t_pre / max(1, tot_pre)
    print(
        f"clamped layout: {t_pre}/{tot_pre} row groups touched "
        f"({frac_pre:.0%}) across {len(os.listdir(month_dir))} files"
    )

    # --- refresh with the default trigger: full re-layout, domain re-derived ---
    zo.refresh_zorder_monthly(spark, sf, *KEYS, [one_day])
    dom1 = zo._read_domain(path)
    assert dom1 != dom0, "trigger must re-derive the domain"
    print(f"re-derived domain: {dom1}")
    t_post, tot_post = zo.row_groups_touched(month_dir, box)
    frac_post = t_post / max(1, tot_post)
    print(
        f"re-laid-out:    {t_post}/{tot_post} row groups touched "
        f"({frac_post:.0%}) across {len(os.listdir(month_dir))} files"
    )

    # answer-invariance: the layout is still a permutation of the corpus
    served = zo.load_or_build_zorder_monthly(spark, sf, *KEYS)
    assert served.count() == li2.count()
    chk = lambda d: d.agg(
        F.sum(F.xxhash64("l_orderkey", "l_partkey", "l_suppkey").cast("decimal(38,0)"))
    ).first()[0]
    assert chk(served) == chk(li2), "layout diverged from the corpus"

    assert tot_post >= 8, f"month too small to measure ({tot_post} row groups)"
    assert frac_post < 0.5 * frac_pre, (
        f"re-layout did not restore pruning: {frac_pre:.0%} -> {frac_post:.0%}"
    )
    print(
        f"PROBE PASS: box touch fraction {frac_pre:.0%} -> {frac_post:.0%} "
        f"after the drift-triggered re-layout"
    )
    spark.stop()


if __name__ == "__main__":
    main()
