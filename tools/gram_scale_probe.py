"""Scale probe for the exact-substring (gram) family at ×N corpus
(VERDICT r08 #2/#3): stages documents ×N with the standard shifted-key /
interleaved-salt recipe (tools/scale_probe.replicate), then

1. times the COLD builds of all three maintained levels (partials →
   rollup/cut → scrub output),
2. times the >=2-cut serve both ways — the r8 fold-the-partials path
   (shared_grams) vs the r9 maintained-rollup path (shared_grams_cut) —
   the "served delta" VERDICT r08 #2 asked to measure,
3. times the family's registered queries min-of-2 with FULL
   materialization via the decimal-xxhash checksum (the `.count()` trap:
   Catalyst drops the scrub's reassembly branch through the unique-keyed
   left join — documented in CLAUDE.md), and
4. cross-checks checksums: from-scratch scrub == served scrub ==
   maintained (ingested) scrub at scale.

Usage: python tools/gram_scale_probe.py [N]   (default 100)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olap_sus_spark.session import get_spark  # noqa: E402
from tools.scale_probe import replicate  # noqa: E402

QUERIES_TO_PROBE = [
    "dedup_cross_doc_ngrams",
    "dedup_cross_doc_ngrams_served",
    "dedup_duplication_profile",
    "dedup_cross_doc_scrub",
    "dedup_cross_doc_scrub_served",
    "dedup_cross_doc_scrub_ingested",
]

CHECK_EQUAL = [  # these must produce identical result checksums
    "dedup_cross_doc_scrub",
    "dedup_cross_doc_scrub_served",
    "dedup_cross_doc_scrub_ingested",
]


def checksum(df) -> int:
    """Full-result materialization: decimal-cast xxhash over every column
    (ANSI-safe against bigint sum overflow)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    return df.agg(F.sum(h)).first()[0]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("gram-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import olap_sus_spark.queries  # noqa: F401
    from olap_sus_spark.operators import gramfreq as gf
    from olap_sus_spark.registry import QUERIES

    out_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_probe_x{n}")
    if not os.path.exists(os.path.join(out_dir, "embeddings.parquet")):
        t0 = time.perf_counter()
        replicate(spark, n, out_dir)
        print(f"replicated x{n} in {time.perf_counter() - t0:.1f}s -> {out_dir}")

    # cold builds (fresh index dirs so nothing is amortized away)
    import shutil

    for name, path_fn, build in [
        ("gramfreq_build", gf.gram_freq_path, gf.load_or_build_gram_freq),
        ("gramrollup_build", gf.rollup_path, gf.load_or_build_gram_rollup),
        ("gramscrub_build", gf.scrub_path, gf.load_or_build_gram_scrub),
    ]:
        shutil.rmtree(path_fn(out_dir), ignore_errors=True)
        t0 = time.perf_counter()
        build(spark, out_dir)
        print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)

    # served delta: fold-the-partials vs maintained-cut (min-of-2 each)
    for name, fn in [
        ("shared_grams_FOLD", lambda: gf.shared_grams(spark, out_dir)),
        ("shared_grams_CUT", lambda: gf.shared_grams_cut(spark, out_dir)),
    ]:
        best, rows = float("inf"), -1
        for _ in range(2):
            t0 = time.perf_counter()
            rows = fn().count()  # cut/fold are gram-id sets: count is honest
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.2f}s rows={rows}", flush=True)

    sums: dict[str, int] = {}
    for name in QUERIES_TO_PROBE:
        best, s = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            s = checksum(QUERIES[name](spark, out_dir))
            best = min(best, time.perf_counter() - t0)
        sums[name] = s
        print(f"{name}: {best:.2f}s checksum={s}", flush=True)
    vals = {sums[k] for k in CHECK_EQUAL}
    print(f"scrub==served==ingested: {'PASS' if len(vals) == 1 else 'FAIL ' + str(vals)}")
    spark.stop()


if __name__ == "__main__":
    main()
