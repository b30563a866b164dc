"""Focused tests for the round-10 optimization rewrites.

Each rewrite in this round is output-identical BY ARGUMENT (selection
commutes, evaluation counts change, values don't); these tests pin the
arguments on adversarial inputs the sf-corpora may not exercise:
score ties, negative ids... anything where the (score DESC, id ASC)
tie-break chain could diverge between the window form and the aggregate
form.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_DIR


def _rank1_window(df, keys, score_col, id_col):
    w = Window.partitionBy(*keys).orderBy(F.col(score_col).desc(), F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*keys, id_col, score_col)
    )


def test_best_by_equals_rank1_window_on_ties(spark):
    """best_by (max-struct aggregate) must pick the exact row the
    row_number window picked: max score, ties -> smallest id — including
    exact duplicate scores, negative scores, and a key whose best score
    appears three times."""
    from olap_sus_spark.operators.similarity import best_by

    rows = [
        # key, id, score
        (1, 10, 0.5), (1, 3, 0.5), (1, 7, 0.5),        # three-way tie
        (2, 5, -0.25), (2, 4, -0.5),                    # negatives
        (3, 100, 1.0), (3, 1, 0.9999999999999999),      # 1 ulp apart
        (4, 8, 0.0), (4, 9, -0.0),                      # signed zero tie
        (5, 42, 2.5),                                   # singleton
    ]
    df = spark.createDataFrame(rows, "k int, i bigint, s double")
    got = {tuple(r) for r in best_by(df, ["k"], "s", "i").collect()}
    want = {tuple(r) for r in _rank1_window(df, ["k"], "s", "i").collect()}
    assert got == want
    # and the documented selection directly: ties -> smallest id
    by_key = {r["k"]: (r["i"], r["s"]) for r in best_by(df, ["k"], "s", "i").collect()}
    assert by_key[1] == (3, 0.5)
    assert by_key[2] == (5, -0.25)
    assert by_key[3] == (100, 1.0)


def test_semantic_threshold_commutes_with_best(spark):
    """semantic_dedup moved its threshold ABOVE the best_by aggregate.
    Pin the argument: filtering the per-key argmax equals argmax over the
    pre-filtered pairs, on data where a key's best is below the cut and
    another key's above-cut rows tie."""
    from olap_sus_spark.operators.similarity import best_by

    rows = [
        (1, 10, 0.2), (1, 11, 0.25),     # best 0.25 < threshold -> no row
        (2, 7, 0.31), (2, 3, 0.31),      # tie above threshold -> id 3
        (3, 9, 0.95), (3, 2, 0.4),       # clear winner
    ]
    t = 0.3
    df = spark.createDataFrame(rows, "k int, i bigint, s double")
    post = {
        tuple(r)
        for r in best_by(df, ["k"], "s", "i").filter(F.col("s") >= t).collect()
    }
    pre = {
        tuple(r)
        for r in best_by(df.filter(F.col("s") >= t), ["k"], "s", "i").collect()
    }
    assert post == pre
    assert {r[0] for r in post} == {2, 3}
    assert dict((r[0], r[1]) for r in post)[2] == 3


def test_quantize_argument_position_scale(spark):
    """quantized_vecs must round exactly like the scalar definition
    q_i = floor(x_i / (max|x|/127) + 0.5) — incl. the all-zero vector
    (scale 0 -> all-zero q) after the array_repeat rewrite."""
    from olap_sus_spark.operators.similarity import quantized_vecs

    vecs = [
        (1, [1.0, -1.0, 0.5, 0.25]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [-0.3, 0.7, 0.699999999, -0.7]),
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    got = {r["vec_id"]: list(r["qv"]) for r in quantized_vecs(df).collect()}

    def ref(xs):
        s = max(abs(x) for x in xs) / 127.0
        return [0 if s == 0.0 else math.floor(x / s + 0.5) for x in xs]

    for vid, xs in vecs:
        assert got[vid] == ref(xs), (vid, got[vid], ref(xs))


def test_cross_doc_ngrams_join_free_identity(spark):
    """The join-free stats must equal the OLD join-back formulation —
    recomputed here from scratch (explode distinct grams, gram -> n_docs
    fold, join back onto every occurrence, sum(n_docs >= 2)), so a shared
    bug in the n_grams − n_unique identity cannot hide behind the rewritten
    query comparing against itself (ADVICE r10)."""
    import olap_sus_spark.queries  # noqa: F401
    from olap_sus_spark.operators import text as tx
    from olap_sus_spark.queries.text_pipeline import _CROSS_NGRAM_N, augmented_docs
    from olap_sus_spark.registry import QUERIES

    out = {r["doc_id"]: r for r in QUERIES["dedup_cross_doc_ngrams"](spark, SF_DIR).collect()}
    assert out, "no rows at test sf"
    for r in out.values():
        assert 0 <= r["n_shared"] <= r["n_grams"]
        assert r["shared_frac"] == (float(r["n_shared"]) / float(r["n_grams"]))

    # the pre-r10 join-back shape, inline: per-doc distinct gram hashes,
    # corpus-wide document frequency per gram, joined back onto every
    # occurrence, n_shared = count of occurrences with n_docs >= 2
    occ = augmented_docs(spark, SF_DIR).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    tx.token_ngrams(F.col("text"), _CROSS_NGRAM_N), tx.md5_int
                )
            )
        ).alias("gram"),
    )
    freq = occ.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    old = (
        occ.join(freq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
    )
    old_map = {
        r["doc_id"]: (
            r["n_grams"],
            r["n_shared"],
            float(r["n_shared"]) / float(r["n_grams"]),
        )
        for r in old.collect()
    }
    new_map = {
        k: (v["n_grams"], v["n_shared"], v["shared_frac"]) for k, v in out.items()
    }
    assert new_map == old_map

    served = {
        r["doc_id"]: r
        for r in QUERIES["dedup_cross_doc_ngrams_served"](spark, SF_DIR).collect()
    }
    assert {k: (v["n_grams"], v["n_shared"]) for k, v in out.items()} == {
        k: (v["n_grams"], v["n_shared"]) for k, v in served.items()
    }
