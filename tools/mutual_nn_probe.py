"""×N scale probe for corpus-scale mutual-NN (VERDICT r09 #2): stages
embeddings ×N (tools/scale_probe.replicate — near-but-not-identical
perturbed replicas, cluster density preserved) and shows the SRP
bucket-collision CANDIDATE volume scales with bucket occupancy, not n²:

- auto_bits(n, target_bucket=64) widens signatures as n grows, so
  candidates-per-vector stays ~occupancy·tables at every N while a fixed
  bit count would grow it linearly (the n² trap, measured side by side),
- the full query is timed with real materialization (decimal-xxhash
  checksum — the .count() Catalyst trap, CLAUDE.md), and its plan is
  checked free of CartesianProduct / BroadcastNestedLoopJoin.

Usage: python tools/mutual_nn_probe.py [N ...]   (default: 10 100)
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


def candidates(spark, sf_dir: str, bits: int) -> int:
    from olap_sus_spark.catalog import load_table
    from olap_sus_spark.operators.similarity import srp_buckets
    from olap_sus_spark.queries.vector import _DIM, _LSH_T

    emb = load_table(spark, sf_dir, "embeddings")
    b = srp_buckets(emb, dim=_DIM, n_tables=_LSH_T, n_bits=bits)
    ids = b.select("vec_id", "t", "bucket")
    a = ids.select(F.col("vec_id").alias("ida"), "t", "bucket")
    c = ids.select(F.col("vec_id").alias("idb"), "t", "bucket")
    return (
        a.join(c, ["t", "bucket"])
        .filter(F.col("ida") < F.col("idb"))
        .select("ida", "idb")
        .distinct()
        .count()
    )


def probe(spark, n: int) -> None:
    import io
    from contextlib import redirect_stdout

    from olap_sus_spark.operators.index_store import corpus_rows
    from olap_sus_spark.operators.similarity import auto_bits
    from olap_sus_spark.queries.vector import mutual_nn_pairs_bucketed

    out_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_probe_x{n}")
    if not os.path.exists(os.path.join(out_dir, "embeddings.parquet")):
        t0 = time.perf_counter()
        replicate(spark, n, out_dir)
        print(f"replicated x{n} in {time.perf_counter() - t0:.1f}s")
    rows = corpus_rows(out_dir)
    auto = auto_bits(rows, target_bucket=64)
    n_auto = candidates(spark, out_dir, auto)
    msg = (
        f"x{n}: rows={rows} auto_bits={auto} "
        f"cand(auto)={n_auto} ({n_auto / rows:.1f}/vec)"
    )
    if n < 50:
        # the fixed-bit contrast (the n² trap) is only SAFE to materialize
        # at small N — at ×100 the 4-bit distinct spills >70 GB (PLANS.md
        # round-4); the ×10 side-by-side plus the flat auto
        # candidates-per-vector across N carry the argument
        n_fixed = candidates(spark, out_dir, 4)
        msg += f"  cand(4-bit fixed)={n_fixed} ({n_fixed / rows:.1f}/vec)"
    print(msg, flush=True)

    best, s = float("inf"), None
    for _ in range(2):
        t0 = time.perf_counter()
        s = checksum(mutual_nn_pairs_bucketed(spark, out_dir))
        best = min(best, time.perf_counter() - t0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        mutual_nn_pairs_bucketed(spark, out_dir).explain("formatted")
    plan = buf.getvalue()
    bad = [op for op in ("CartesianProduct", "BroadcastNestedLoopJoin") if op in plan]
    print(
        f"x{n}: mutual_nn_pairs_bucketed {best:.2f}s checksum={s} "
        f"plan={'CLEAN' if not bad else 'BAD:' + ','.join(bad)}",
        flush=True,
    )


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("mutual-nn-probe")
    spark.sparkContext.setLogLevel("ERROR")
    idx = tempfile.mkdtemp(prefix="mnn_probe_idx_")
    os.environ["SPARK_GRAFT_INDEX_DIR"] = idx
    try:
        for n in ns:
            probe(spark, n)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
