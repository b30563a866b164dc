"""Refresh-chain probe at ×N for the 3-level gram family (the PLANS.md
r9 §7 recipe, promoted to a tool): append one no-flip 600-doc file to the
staged ×N corpus, run the chained refresh (partials → rollup → scrub)
with per-level timing, and verify checksum equality with a full rebuild.

r10 measures the LSM rollup (VERDICT r09 #4): the per-ingest sorted
rollup/cut rewrite (~2 s I/O floor at 100×, inside the 6.6 s rollup-merge
step of the 14.5 s no-flip chain) is replaced by one bounded delta level;
the full rewrite runs 1-in-_ROLLUP_MAX_LEVELS refreshes.  The probe
appends SEVERAL files in sequence so both the leveled refreshes and the
fold are measured.

Usage: python tools/gram_chain_probe.py [N] [n_appends]   (default 100 4)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olap_sus_spark.session import get_spark  # noqa: E402
from tools.scale_probe import replicate  # noqa: E402


def checksum(df) -> int:
    h = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    return df.agg(F.sum(h)).first()[0] or 0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("gram-chain-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from olap_sus_spark.operators import gramfreq as gf
    from olap_sus_spark.operators import index_store as ix
    from olap_sus_spark.streaming.corpus import corpus_docs_of

    src_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_probe_x{n}")
    if not os.path.exists(os.path.join(src_dir, "documents.parquet")):
        t0 = time.perf_counter()
        replicate(spark, n, src_dir)
        print(f"replicated x{n} in {time.perf_counter() - t0:.1f}s")
    # work on a COPY staged as a directory dataset (appends grow it)
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_chain_x{n}")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(os.path.join(base, "documents.parquet"))
    for i, f in enumerate(
        sorted(os.listdir(os.path.join(src_dir, "documents.parquet")))
    ):
        if f.endswith(".parquet"):
            shutil.copy(
                os.path.join(src_dir, "documents.parquet", f),
                os.path.join(base, "documents.parquet", f"part-{i:03d}.parquet"),
            )
    idx = tempfile.mkdtemp(prefix="gram_chain_idx_")
    os.environ["SPARK_GRAFT_INDEX_DIR"] = idx
    docs_of = corpus_docs_of(base)

    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1

    t0 = time.perf_counter()
    gf.load_or_build_gram_scrub(spark, base, docs_of=docs_of)
    t_build = time.perf_counter() - t0
    print(f"cold chain build: {t_build:.1f}s", flush=True)

    rpath = gf.rollup_path(base, view="plain")
    for i in range(1, n_appends + 1):
        # no-flip append: 600 docs of per-ingest salted (genuinely new) text
        batch = (
            docs.limit(600)
            .withColumn("doc_id", F.col("doc_id") + F.lit(i * max_id).cast("bigint"))
            .withColumn(
                "text",
                F.expr(
                    f"array_join(transform(split(text, ' '),"
                    f" w -> concat('ch{i}', w)), ' ')"
                ),
            )
        )
        staging = os.path.join(base, "documents.parquet", f"append-{i:03d}.parquet")
        tmp = staging + ".__stage__"
        batch.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), staging)
        shutil.rmtree(tmp)

        t1 = time.perf_counter()
        gf.refresh_gram_freq(spark, base, docs_of=docs_of)
        t_p = time.perf_counter() - t1
        t1 = time.perf_counter()
        gf.refresh_gram_rollup(spark, base, docs_of=docs_of)
        t_r = time.perf_counter() - t1
        t1 = time.perf_counter()
        gf.refresh_gram_scrub(spark, base, docs_of=docs_of)
        t_s = time.perf_counter() - t1
        levels = len(gf._levels_of(ix.read_manifest(rpath)))
        print(
            f"append {i}: partials={t_p:.1f}s rollup={t_r:.1f}s "
            f"scrub={t_s:.1f}s total={t_p + t_r + t_s:.1f}s levels={levels}",
            flush=True,
        )

    # serve cost with levels present (the overlay's price at read time)
    for name, fn in [
        ("cut_served", lambda: gf.shared_grams_cut(spark, base, docs_of=docs_of)),
        ("scrub_served", lambda: gf.load_or_build_gram_scrub(spark, base, docs_of=docs_of)),
    ]:
        best = float("inf")
        for _ in range(2):
            t1 = time.perf_counter()
            s = checksum(fn())
            best = min(best, time.perf_counter() - t1)
        print(f"{name}: {best:.2f}s checksum={s}", flush=True)

    # equality with a full rebuild on the final corpus
    maint = {
        "rollup": checksum(gf.load_or_build_gram_rollup(spark, base, docs_of=docs_of)),
        "cut": checksum(gf.shared_grams_cut(spark, base, docs_of=docs_of)),
        "scrub": checksum(gf.load_or_build_gram_scrub(spark, base, docs_of=docs_of)),
    }
    os.environ["SPARK_GRAFT_INDEX_DIR"] = idx + "_fresh"
    t1 = time.perf_counter()
    fresh = {
        "rollup": checksum(gf.load_or_build_gram_rollup(spark, base, docs_of=docs_of)),
        "cut": checksum(gf.shared_grams_cut(spark, base, docs_of=docs_of)),
        "scrub": checksum(gf.load_or_build_gram_scrub(spark, base, docs_of=docs_of)),
    }
    t_rebuild = time.perf_counter() - t1
    ok = maint == fresh
    print(f"rebuild: {t_rebuild:.1f}s  equality: {'PASS' if ok else 'FAIL ' + str((maint, fresh))}")
    shutil.rmtree(idx + "_fresh", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
