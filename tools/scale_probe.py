"""100× scale probe for the dedup / ANN / text-pipeline family.

Replicates documents + embeddings ×N with shifted ids (duplicate-cluster
*density* preserved: each replica keeps its internal duplicate structure;
texts get word-dependent salt words INTERLEAVED between the original
tokens — see replicate() for why the simpler salting variants are wrong —
and vectors a small deterministic per-replica perturbation, so clusters do
not merge across replicas), stages the result as a synthetic sf_dir, and
times the registered queries against it — the same recipe as the events
probes recorded in PLANS.md.

Usage: python tools/scale_probe.py [N] [query ...]
Defaults: N=100, the dedup/ANN/text headline family.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from olap_sus_spark.catalog import load_table  # noqa: E402
from olap_sus_spark.session import get_spark  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_near_clusters",
    "dedup_near_clusters_star",
    "dedup_keep_best",
    "dedup_simhash",
    "ann_ivf_probe_topk",
    "ann_lsh_probe_topk",
    "text_quality_features",
    "document_chunking",
    "corpus_clean_pipeline",
    "corpus_source_mixing",
    "decontaminate_train",
    "sequence_packing",
    "text_pii_scrub",
    "text_repetition_ratio",
    "embedding_quantize_int8",
    "multimodal_binary_dedup",
]


def replicate(spark, n: int, out_dir: str) -> None:
    docs = load_table(spark, BASE_SF, "documents")
    emb = load_table(spark, BASE_SF, "embeddings")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    max_vec = emb.agg(F.max("vec_id")).first()[0] + 1

    rep = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    # Documents: shift ids and INTERLEAVE a salt word after every original
    # word, tagged with (replica, preceding word).  Original tokens survive,
    # so stopword counts (langid), punct/length quality features, and
    # exact-dup structure are preserved per replica; every token n-gram
    # picks up a salt, so cross-replica shingle overlap is zero — duplicate
    # clusters keep their size and multiply in count ("density preserved").
    # Recipe archaeology, each variant probed: a mere suffix token keeps
    # cross-replica Jaccard ≈ 1 and merges clusters ×N (39M pairs + OOM);
    # per-word rewriting kills the stopwords and zeroes the language-gated
    # pipelines; a CONSTANT interleaved salt manufactures shared
    # (salt, w, salt) trigrams between any two docs sharing vocabulary and
    # inflates within-replica pair counts ~20×.  Word-dependent salts make
    # shingle overlap require shared original word *bigrams* — closest to
    # the original trigram similarity structure.
    d = (
        docs.select("*", rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * max_doc)
        .withColumn(
            "text",
            F.expr(
                "array_join(flatten(transform(split(text, ' '),"
                " w -> array(w, concat('qq', rep, w)))), ' ')"
            ),
        )
        .drop("rep")
    )
    # Embeddings: shift ids, deterministically perturb each component so
    # replicas are near but not identical vectors (cluster density kept).
    e = (
        emb.select("*", rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * max_vec)
        .withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, i) -> cast(x + sin(rep * 97 + i) * 0.05 as float))"
            ),
        )
        .drop("rep")
    )
    d.repartition(32).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    e.repartition(32).write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))


FACTS_QUERIES = [
    "pricing_summary",
    "rollup_state_ageband",
    "slice_dice_city_years",
    "topk_parts_per_nation",
    "drill_across_growth",
    "pivot_year_by_region",
]


def replicate_facts(spark, n: int, out_dir: str) -> None:
    """Fact-growth replication: lineitem + orders ×N with shifted order
    keys; dimensions (customer/supplier/part/nation/region) written through
    unchanged — at 100 TB facts grow, dimension cardinality doesn't.
    Foreign keys into the dims stay in range, so star joins keep their
    selectivity; per-order basket structure is preserved per replica."""
    from olap_sus_spark.catalog import TABLES

    orders = load_table(spark, BASE_SF, "orders")
    li = load_table(spark, BASE_SF, "lineitem")
    shift = orders.agg(F.max("o_orderkey")).first()[0] + 1

    rep = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    o = (
        orders.select("*", rep)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * shift)
        .drop("rep")
    )
    l_ = (
        li.select("*", rep)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * shift)
        .drop("rep")
    )
    o.repartition(32).write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
    l_.repartition(64).write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    for t in TABLES:
        if t in ("orders", "lineitem"):
            continue
        load_table(spark, BASE_SF, t).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--facts"]
    facts_mode = "--facts" in sys.argv[1:]
    n = int(args[0]) if args else 100
    names = args[1:] or (FACTS_QUERIES if facts_mode else DEFAULT_QUERIES)

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import olap_sus_spark.queries  # noqa: F401

    from olap_sus_spark.registry import QUERIES

    tag = "facts_" if facts_mode else ""
    out_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_probe_{tag}x{n}")
    sentinel = "orders.parquet" if facts_mode else "embeddings.parquet"
    if not os.path.exists(os.path.join(out_dir, sentinel)):
        t0 = time.perf_counter()
        (replicate_facts if facts_mode else replicate)(spark, n, out_dir)
        print(f"replicated x{n} in {time.perf_counter() - t0:.1f}s -> {out_dir}")

    for name in names:
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED")
            continue
        best, rows = float("inf"), -1
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                rows = QUERIES[name](spark, out_dir).count()
                best = min(best, time.perf_counter() - t0)
            print(f"{name}: {best:.2f}s  rows={rows}")
        except Exception as exc:  # noqa: BLE001 — probe keeps going
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
