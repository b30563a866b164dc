"""Optimization-round probe: time individual registered queries in
isolation and dump their formatted plans.

Usage:
    python tools/opt_probe.py <query> [<query> ...] [--runs N] [--plans TAG]
                              [--action collect|noop] [--sf DIR]

- Timing methodology matches bench.py (collect(), min of N after the same
  catalog warm-up) unless --action noop is given (guide §1.4: noop sink
  computes every column and discards, isolating computation from the
  collect round trip).
- --plans before|after writes plans/<round>/<query>_<TAG>.txt (--plandir,
  default r11) with the explain("formatted") output.
- Index-backed queries are served from whatever index currently exists on
  disk (build once via bench.py or the loaders before probing a *_served /
  *_indexed entry).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olap_sus_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="tag: write plans/<plandir>/<q>_<tag>.txt")
    ap.add_argument("--plandir", default="r11")
    ap.add_argument("--action", choices=["collect", "noop"], default="collect")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import olap_sus_spark.queries  # noqa: F401
    from olap_sus_spark.catalog import TABLES, load_table
    from olap_sus_spark.registry import QUERIES

    for t in TABLES:
        load_table(spark, args.sf, t).count()

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.plandir)
    os.makedirs(plan_dir, exist_ok=True)

    for name in args.queries:
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        if args.plans:
            import io
            from contextlib import redirect_stdout

            df = QUERIES[name](spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(buf.getvalue())
        times = []
        constr = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt-probe: {name}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf)
            constr.append(time.perf_counter() - t0)
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(times):.3f}s runs={[round(t, 3) for t in times]} "
            f"construct={[round(t, 3) for t in constr]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
