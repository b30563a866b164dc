"""sf10 probe of the maintained-summary families (VERDICT r05 #5).

Stages ×N replicas of sf0.1 (reusing tools/sf1_sweep.stage — N=10 ≈ sf1,
N=100 ≈ sf10) and times, per maintained family, the three costs that must
scale differently:

- full partial-table build        -> O(history) by design (grows with N)
- one-day refresh                 -> O(day): must stay ~flat vs N
- the served query                -> O(summary): must stay ~flat vs N

Usage: python tools/sf10_maintained_probe.py [N ...]   (default: 10 100)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olap_sus_spark.session import get_spark  # noqa: E402


def probe(spark, sf_dir: str, tag: str) -> dict[str, float]:
    import olap_sus_spark.queries  # noqa: F401
    from olap_sus_spark.queries import cms as qcms
    from olap_sus_spark.queries import hist as qhist
    from olap_sus_spark.queries import incremental as qinc
    from olap_sus_spark.queries import sketches as qsk
    from olap_sus_spark.registry import QUERIES

    out: dict[str, float] = {}

    def t(name, fn):
        t0 = time.perf_counter()
        fn()
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"  {tag} {name}: {out[name]}s", flush=True)

    families = [
        (
            "daily_revenue",
            qinc.daily_revenue_path,
            lambda: qinc.load_or_build_daily_revenue(spark, sf_dir),
            lambda d: qinc.refresh_daily_revenue(spark, sf_dir, [d]),
            "incremental_revenue_by_month",
        ),
        (
            "kmv",
            qsk.orderkey_kmv_path,
            lambda: qsk.load_or_build_orderkey_kmv(spark, sf_dir),
            lambda d: qsk.refresh_orderkey_kmv(spark, sf_dir, [d]),
            "kmv_distinct_orders_served",
        ),
        (
            "cms",
            qcms.supplier_cms_path,
            lambda: qcms.load_or_build_supplier_cms(spark, sf_dir),
            lambda d: qcms.refresh_supplier_cms(spark, sf_dir, [d]),
            "cms_supplier_counts_served",
        ),
        (
            "hist",
            qhist.order_hist_path,
            lambda: qhist.load_or_build_order_hist(spark, sf_dir),
            lambda d: qhist.refresh_order_hist(spark, sf_dir, [d]),
            "hist_quantiles_served",
        ),
        (
            "user_kmv",
            qsk.user_kmv_path,
            lambda: qsk.load_or_build_user_kmv(spark, sf_dir),
            lambda d: qsk.refresh_user_kmv(spark, sf_dir, [d]),
            "kmv_active_users_served",
        ),
    ]
    for fam, path_fn, build, refresh, served in families:
        shutil.rmtree(path_fn(sf_dir), ignore_errors=True)
        t(f"{fam}_build", build)
        partials = build()
        day_col = "dia" if "dia" in partials.columns else partials.columns[0]
        one_day = str(partials.select(day_col).orderBy(day_col).first()[0])
        t(f"{fam}_refresh_1d", lambda: refresh(one_day))
        t(f"{fam}_serve", lambda: QUERIES[served](spark, sf_dir).collect())
        # second serve: steady state (codegen warm)
        t(f"{fam}_serve2", lambda: QUERIES[served](spark, sf_dir).collect())
    # extra served readouts off already-built summaries
    for served in (
        "kmv_trailing_quarter_distinct_served",
        "cms_heavy_hitter_suppliers",
        "trailing_28d_revenue_served",
    ):
        t(f"{served}", lambda: QUERIES[served](spark, sf_dir).collect())

    # fact-lake z-layout (round 7): build is O(history) BY DESIGN (it is a
    # full re-layout of the facts), the dated refresh must stay O(month)
    # and the served box aggregate O(selectivity) — the separation the
    # monthly maintenance exists to buy.
    from pyspark.sql import functions as F

    from olap_sus_spark.sources import zorder as zo

    zargs = (sf_dir, "lineitem", "l_partkey", "l_suppkey", "l_shipdate")
    shutil.rmtree(zo.zorder_monthly_path(*zargs), ignore_errors=True)
    t("zorder_build", lambda: zo.load_or_build_zorder_monthly(spark, *zargs))
    zl = zo.load_or_build_zorder_monthly(spark, *zargs)
    zday = str(
        zl.select(F.to_date("l_shipdate").alias("d")).orderBy("d").first()[0]
    )
    t("zorder_refresh_1d", lambda: zo.refresh_zorder_monthly(spark, *zargs, [zday]))
    t("zorder_serve", lambda: QUERIES["zorder_box_revenue"](spark, sf_dir).collect())
    t("zorder_serve2", lambda: QUERIES["zorder_box_revenue"](spark, sf_dir).collect())
    return out


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [10, 100]
    os.environ.setdefault("SPARK_GRAFT_MAX_RESULT", "8g")
    spark = get_spark("sf10-maintained-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from tools.sf1_sweep import stage

    results = {}
    for n in ns:
        out_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_sf1_x{n}")
        if not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
            t0 = time.perf_counter()
            stage(spark, n, out_dir)
            print(f"staged x{n} in {time.perf_counter() - t0:.1f}s", flush=True)
        results[n] = probe(spark, out_dir, f"x{n}")
    keys = sorted({k for r in results.values() for k in r})
    print("\n| metric | " + " | ".join(f"x{n}" for n in ns) + " |")
    for k in keys:
        print(
            f"| {k} | "
            + " | ".join(str(results[n].get(k, "-")) for n in ns)
            + " |"
        )


if __name__ == "__main__":
    main()
