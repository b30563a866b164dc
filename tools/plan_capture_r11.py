"""Capture plans/r11/<query>_<tag>.txt for the round-11 evidence set.

Usage: python tools/plan_capture_r11.py <before|after> [--sf DIR] [--out REPO]

- Run inside the tree whose plans you want (a worktree of the r10 seal for
  `before`, the working tree for `after`); --out points at the repo whose
  plans/r11 directory receives the files (default: this script's repo).
- For queries whose final plan is truncated at a localCheckpoint barrier
  (the plan starts at `Scan ExistingRDD`), ALSO captures the upstream
  stage's plan above the barrier (VERDICT r10 #8) under
  `<query>__above_checkpoint_<tag>.txt`.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olap_sus_spark.session import get_spark  # noqa: E402

QUERIES_TO_CAPTURE = [
    # batch 2: duplicated-subtree removal
    "pagerank_parts",
    "top_copurchases_per_part",
    "triangle_counts_parts",
    "khop_reachable_parts",
    "open_orders_timeline",
    "open_orders_time_weighted_avg",
    "dedup_near_clusters",
    "dedup_minhash_lsh",
    # batch 3: keep_ge threshold single-evaluation
    "dedup_jaccard_pairs",
    "dedup_embedding_pairs",
    "dedup_embedding_lsh",
    "dedup_near_clusters_star",
    "corpus_clean_neardup",
    # batch 1 ride-alongs (plan expected IDENTICAL — the change is
    # construction cost, invisible in the plan; captured to prove that)
    "dedup_semantic_clusters",
    "mutual_nn_pairs_bucketed",
    "ann_lsh_auto_topk",
    "dedup_simhash",
    "text_quality_features",
    "bloom_pruned_brand_revenue",
]


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _above_checkpoint_frames(spark, sf):
    """Frames ABOVE the localCheckpoint barriers of the truncated plans:
    the signature/edge pipelines the final plan hides behind ExistingRDD."""
    from olap_sus_spark.catalog import load_table
    from olap_sus_spark.operators import similarity as sim
    from olap_sus_spark.operators.dedup import jaccard_pairs
    from olap_sus_spark.operators.index_store import corpus_rows
    from olap_sus_spark.queries.text_pipeline import augmented_docs
    from olap_sus_spark.queries.vector import _DIM, _LSH_T

    emb = load_table(spark, sf, "embeddings")
    nb = sim.auto_bits(corpus_rows(sf), target_bucket=8)
    out = {
        # dedup_embedding_lsh: the (id, t, bucket) signature pass that is
        # localCheckpointed before the collision self-join
        "dedup_embedding_lsh": sim.srp_buckets(
            emb, _DIM, _LSH_T, nb
        ).select("vec_id", "t", "bucket"),
        # dedup_near_clusters: the symmetrized edge list (jaccard pairs +
        # explode orientations) checkpointed before the CC loop
        "dedup_near_clusters": jaccard_pairs(
            augmented_docs(spark, sf), threshold=0.5
        ),
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=["before", "after"])
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    repo = args.out or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(repo, "plans", "r11")
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark("plan-capture-r11")
    spark.sparkContext.setLogLevel("ERROR")
    import olap_sus_spark.queries  # noqa: F401
    from olap_sus_spark.registry import QUERIES

    for name in QUERIES_TO_CAPTURE:
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        try:
            txt = _explain(QUERIES[name](spark, args.sf))
        except Exception as e:  # noqa: BLE001
            txt = f"CAPTURE ERROR: {e!r}\n"
        if "Scan ExistingRDD" in "\n".join(txt.splitlines()[:6]):
            txt = (
                "NOTE: plan starts below a localCheckpoint barrier "
                "(ExistingRDD) — see the __above_checkpoint capture.\n" + txt
            )
        with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(txt)
        print(f"captured {name}", flush=True)

    for name, df in _above_checkpoint_frames(spark, args.sf).items():
        try:
            txt = (
                "Upstream pipeline ABOVE the localCheckpoint barrier of "
                f"{name} (the final plan shows it only as ExistingRDD).\n\n"
                + _explain(df)
            )
        except Exception as e:  # noqa: BLE001
            txt = f"CAPTURE ERROR: {e!r}\n"
        with open(
            os.path.join(plan_dir, f"{name}__above_checkpoint_{args.tag}.txt"), "w"
        ) as f:
            f.write(txt)
        print(f"captured {name} (above checkpoint)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
