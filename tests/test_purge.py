"""Tombstone propagation (operators/purge.py): targeted part-file rewrite
+ partition-scoped index refresh == fresh rebuild over the purged corpus."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators import purge as pg
from tests.conftest import SF_DIR

import pytest

pytestmark = pytest.mark.slow  # hour-scale chain/probe suite: opt-in via -m slow (driver verify window, r11)


_PURGE = [3, 17, 42, 250, 499]


def _stage_corpus(spark, root) -> str:
    corpus = str(root / "corpus")
    for t, col in (("documents", "doc_id"), ("embeddings", "vec_id")):
        # range layout: ingest batches hold id ranges, so tombstones hit a
        # strict subset of part files (the realistic purge shape)
        load_table(spark, SF_DIR, t).repartitionByRange(4, col).write.parquet(
            os.path.join(corpus, f"{t}.parquet")
        )
    return corpus


def test_purge_rewrites_only_affected_files(spark, tmp_path):
    corpus = _stage_corpus(spark, tmp_path)
    emb_dir = os.path.join(corpus, "embeddings.parquet")
    parts = sorted(f for f in os.listdir(emb_dir) if f.endswith(".parquet"))
    before = {f: os.stat(os.path.join(emb_dir, f)).st_mtime_ns for f in parts}
    hit = {os.path.basename(p) for p in pg.affected_files(
        spark, corpus, "embeddings", "vec_id", _PURGE
    )}
    assert hit and hit < set(parts)  # tombstones live in a strict subset

    removed = pg.purge_table_ids(spark, corpus, "embeddings", "vec_id", _PURGE)
    assert removed == len(_PURGE)
    after = {f: os.stat(os.path.join(emb_dir, f)).st_mtime_ns for f in parts}
    assert set(after) == set(parts)  # names preserved (changed, not removed)
    for f in parts:
        assert (after[f] != before[f]) == (f in hit), f

    left = spark.read.parquet(emb_dir)
    assert left.filter(F.col("vec_id").isin(_PURGE)).count() == 0
    assert left.count() == 500 - len(_PURGE)
    # idempotent: a re-run finds nothing to do
    assert pg.purge_table_ids(spark, corpus, "embeddings", "vec_id", _PURGE) == 0


def test_purge_propagates_to_srp_and_ivf(spark, tmp_path, monkeypatch):
    """After purge + refresh: no tombstoned id anywhere, the refreshed
    index equals a fresh build over the purged corpus, and UNAFFECTED src
    partitions were not rewritten (the O(affected-files) claim)."""
    from olap_sus_spark.operators import similarity as sim

    corpus = _stage_corpus(spark, tmp_path)
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    sim.load_or_build_srp_index(spark, corpus, dim=64, n_tables=4, n_bits=4)
    sim.load_or_build_ivf_index(spark, corpus, num_centroids=8)
    srp_dir = sim.srp_index_path(corpus, 64, 4, 4)
    part_mtime = {
        d: os.stat(os.path.join(srp_dir, d)).st_mtime_ns
        for d in os.listdir(srp_dir)
        if d.startswith("src=")
    }
    hit = {os.path.basename(p) for p in pg.affected_files(
        spark, corpus, "embeddings", "vec_id", _PURGE
    )}

    for t, col in (("embeddings", "vec_id"), ("documents", "doc_id")):
        assert pg.purge_table_ids(spark, corpus, t, col, _PURGE) == len(_PURGE)

    srp = sim.refresh_srp_index(spark, corpus, dim=64, n_tables=4, n_bits=4)
    assert srp.filter(F.col("vec_id").isin(_PURGE)).count() == 0
    for d, m in part_mtime.items():
        touched = d.removeprefix("src=") in hit
        assert (os.stat(os.path.join(srp_dir, d)).st_mtime_ns != m) == touched, d

    assigned, cents = sim.refresh_ivf_index(spark, corpus, num_centroids=8)
    assert assigned.filter(F.col("vec_id").isin(_PURGE)).count() == 0

    # refresh == fresh full build over the purged corpus (bit-identical)
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx2"))
    fresh = sim.load_or_build_srp_index(spark, corpus, dim=64, n_tables=4, n_bits=4)
    assert sorted(map(tuple, srp.collect())) == sorted(map(tuple, fresh.collect()))
    fresh_a, _ = sim.load_or_build_ivf_index(spark, corpus, num_centroids=8)
    assert sorted(map(tuple, assigned.collect())) == sorted(
        map(tuple, fresh_a.collect())
    )


def test_purge_propagates_to_inverted_and_clusters(spark, tmp_path, monkeypatch):
    from olap_sus_spark.operators import dedup as dd
    from olap_sus_spark.operators import inverted as iv

    corpus = _stage_corpus(spark, tmp_path)
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    iv.load_or_build_inverted_index(spark, corpus, "documents")
    docs = load_table(spark, corpus, "documents")
    dd.load_or_build_cluster_index(spark, corpus, docs)

    assert pg.purge_table_ids(
        spark, corpus, "documents", "doc_id", _PURGE
    ) == len(_PURGE)

    postings, stats = iv.refresh_inverted_index(spark, corpus, "documents")
    assert postings.filter(F.col("doc_id").isin(_PURGE)).count() == 0
    # per-src stat partials re-aggregated over the purged corpus
    assert stats.agg(F.sum("n_docs")).first()[0] == 500 - len(_PURGE)

    # cluster labels are global (a purged doc can be a hub): the manifest
    # mismatch routes the next load through the safe full rebuild
    clusters = dd.load_or_build_cluster_index(
        spark, corpus, load_table(spark, corpus, "documents")
    )
    assert clusters.filter(F.col("doc_id").isin(_PURGE)).count() == 0
    assert clusters.filter(F.col("cluster_id").isin(_PURGE)).count() == 0


def test_purge_large_batch_uses_join_path(spark, tmp_path):
    """A tombstone batch past the isin limit routes through the broadcast
    anti-join and produces the identical result."""
    from olap_sus_spark.operators.purge import _ISIN_LIMIT

    corpus = _stage_corpus(spark, tmp_path)
    big = list(range(0, _ISIN_LIMIT + 50))  # 306 ids > the isin cutover
    removed = pg.purge_table_ids(spark, corpus, "embeddings", "vec_id", big)
    assert removed == len([i for i in big if i < 500])
    left = spark.read.parquet(os.path.join(corpus, "embeddings.parquet"))
    assert left.count() == 500 - removed
    assert left.filter(F.col("vec_id").isin(big[:100])).count() == 0
    assert left.columns == ["vec_id", "embedding", "label"]


def test_purge_propagates_to_gram_freq(spark, tmp_path, monkeypatch):
    """RTBF → exact-substring index: after purging docs + a partition-
    scoped refresh, the gram partials equal a fresh rebuild over the
    purged corpus, unaffected src partitions keep their bytes, and a
    purged doc's shared grams drop out of the >=2 serving cut."""
    from olap_sus_spark.operators import gramfreq as gf
    from olap_sus_spark.streaming.corpus import corpus_docs_of

    corpus = _stage_corpus(spark, tmp_path)
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    docs_of = corpus_docs_of(corpus)
    gf.load_or_build_gram_freq(spark, corpus, docs_of=docs_of)

    # a doc pair sharing grams ONLY with each other: duplicate doc 3's
    # text onto a fresh id, rebuild the index, then purge the original
    dup_src = (
        load_table(spark, corpus, "documents").filter(F.col("doc_id") == 3)
    )
    doc_dir = os.path.join(corpus, "documents.parquet")
    extra = dup_src.withColumn("doc_id", F.lit(777_777).cast("bigint"))
    staging = str(tmp_path / "extra")
    extra.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(os.path.join(staging, part), os.path.join(doc_dir, "part-extra.parquet"))
    gf.refresh_gram_freq(spark, corpus, docs_of=docs_of)
    shared_before = {r[0] for r in gf.shared_grams(spark, corpus, docs_of=docs_of).collect()}

    doc_parts = sorted(f for f in os.listdir(doc_dir) if f.endswith(".parquet"))
    before = {f: os.stat(os.path.join(doc_dir, f)).st_mtime_ns for f in doc_parts}
    assert pg.purge_table_ids(spark, corpus, "documents", "doc_id", _PURGE) == len(_PURGE)
    served = sorted(tuple(r) for r in gf.refresh_gram_freq(spark, corpus, docs_of=docs_of).collect())

    # equals a fresh rebuild over the purged corpus
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx_fresh"))
    fresh = sorted(
        tuple(r) for r in gf.load_or_build_gram_freq(spark, corpus, docs_of=docs_of).collect()
    )
    assert served == fresh

    # unaffected doc part files (incl. the duplicate's) kept their bytes
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    hit = {
        os.path.basename(p)
        for p in pg.affected_files(spark, corpus, "documents", "doc_id", _PURGE)
    }
    # note: affected_files is computed post-purge here, so derive from mtimes
    after = {f: os.stat(os.path.join(doc_dir, f)).st_mtime_ns for f in doc_parts}
    changed = {f for f in doc_parts if after[f] != before[f]}
    assert "part-extra.parquet" not in changed and changed < set(doc_parts)

    # doc 3 purged -> grams it shared ONLY with its 777777 duplicate fall
    # out of the >=2 cut (777777's text now appears once corpus-wide)
    shared_after = {r[0] for r in gf.shared_grams(spark, corpus, docs_of=docs_of).collect()}
    assert shared_after < shared_before
