"""Engine-side scale probe for the SemDeDup family (dedup_semantic_clusters
/ the maintained semantic index) at xN staged corpora.

The DuckDB oracle can't follow past ~x10: the k-means assignment replay is
an n x k crossjoin (x100: 200k vectors x 3125 centroids = 625M 64-dim
cosines single-node), so — like the gram family before its join-free
rewrite, but irreducibly — the harness, not the engine, is the limit.
This probe carries the scale evidence instead:

1. Run the registered from-scratch query on the staged xN corpus and
   materialize it fully (decimal-md5 checksum — the CLAUDE.md lesson:
   .count() lets Catalyst drop the left-join branch).
2. Invariant checks, derived from the raw vectors (oracle-independent):
   row count == corpus size; sentinel consistency; every dropped vector
   re-verified cosine >= tau against its recorded dup_of in the same cell.
3. Volume counters: within-cell pair candidates vs the n*cell_target
   bound (the SemDeDup scale lever — candidates must scale linearly, with
   only occupancy skew above the mean).
4. Build the maintained index at xN and time the serve twin (pure scan).

Usage: python tools/semantic_scale_probe.py [staged_dir] (default
/tmp/spark_graft_sf1_x100 — stage with tools/sf1_sweep.py first).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from olap_sus_spark.catalog import load_table  # noqa: E402
from olap_sus_spark.operators import similarity as sim  # noqa: E402
from olap_sus_spark.session import get_spark  # noqa: E402

TAU, CELL = 0.3, 64


def checksum(df):
    cols = sorted(df.columns)
    canon = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("∅")) for c in cols]
        )
    )
    h = F.conv(F.substring(canon, 1, 15), 16, 10).cast("decimal(38,0)")
    r = df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("h").alias("s")
    ).first()
    return int(r["n"]), int(r["s"])


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1_x100"
    spark = get_spark("semantic-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf, "embeddings")
    n = emb.count()
    print(f"corpus: {sf}  n={n}", flush=True)

    t0 = time.perf_counter()
    cells = sim.semantic_cells(emb, cell_target=CELL)
    out = sim.semantic_dedup(cells, threshold=TAU)
    cnt, chk = checksum(out)
    t_scratch = time.perf_counter() - t0
    print(f"from-scratch: {t_scratch:.1f}s rows={cnt} checksum={chk}", flush=True)
    assert cnt == n, (cnt, n)

    # volume counters: within-cell candidate pairs vs the linear bound
    occ = cells.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("c"))
    vol = occ.agg(
        F.count(F.lit(1)).alias("k_live"),
        F.max("c").alias("max_cell"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
    ).first()
    bound = n * CELL
    print(
        f"cells: k_live={vol['k_live']} max_cell={vol['max_cell']} "
        f"candidate_pairs={int(vol['pairs'])} linear_bound(n*cell)={bound} "
        f"ratio={vol['pairs'] / bound:.3f}",
        flush=True,
    )

    # invariant: dropped vectors re-verify against their dup_of
    dropped = out.filter(F.col("is_kept") == 0).select(
        "vec_id", "dup_of", "dup_cosine", F.col("centroid_id").alias("b_cell")
    )
    va = cells.select(
        F.col("vec_id").alias("dup_of"),
        F.col("v").alias("av"),
        F.col("centroid_id").alias("a_cell"),
    )
    vb = cells.select("vec_id", F.col("v").alias("bv"))
    bad = (
        dropped.join(va, "dup_of")
        .join(vb, "vec_id")
        .select(
            "a_cell", "b_cell", "dup_of", "vec_id", "dup_cosine",
            sim.cosine(F.col("av"), F.col("bv")).alias("re_cos"),
        )
        .filter(
            (F.col("a_cell") != F.col("b_cell"))
            | (F.col("dup_of") >= F.col("vec_id"))
            | (F.col("re_cos") < TAU)
            | (F.col("re_cos") != F.col("dup_cosine"))
        )
        .count()
    )
    n_drop = dropped.count()
    print(f"invariants: dropped={n_drop} bad={bad}", flush=True)
    assert bad == 0

    # sentinel consistency on kept rows
    kept_bad = out.filter(
        (F.col("is_kept") == 1)
        & ((F.col("dup_of") != -1) | (F.col("dup_cosine") != -2.0))
    ).count()
    assert kept_bad == 0, kept_bad

    # maintained index: build + serve timing + equality with from-scratch
    t0 = time.perf_counter()
    sim.load_or_build_semantic_index(spark, sf, cell_target=CELL, threshold=TAU)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    served = sim.load_or_build_semantic_index(
        spark, sf, cell_target=CELL, threshold=TAU
    )
    s_cnt, s_chk = checksum(served)
    t_serve = time.perf_counter() - t0
    print(
        f"index: build={t_build:.1f}s serve(materialized)={t_serve:.1f}s "
        f"serve_checksum={'EQUAL' if (s_cnt, s_chk) == (cnt, chk) else 'DIFFERS'}",
        flush=True,
    )
    assert (s_cnt, s_chk) == (cnt, chk)
    print("PROBE PASS", flush=True)


if __name__ == "__main__":
    main()
