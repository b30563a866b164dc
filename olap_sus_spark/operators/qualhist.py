"""Maintained per-source quality-score histogram — the corpus statistic
behind the calibrated quality cut (queries/text_pipeline.py:
quality_calibrated_cut), kept fresh O(ingested files).

The histogram is ADDITIVE over corpus part files: each ``src=`` partition
holds that file's (source, q_bin, cnt) rows, so every maintenance case is
partition-local — appends write their own partitions, in-place rewrites
(purge_table_ids) recompute exactly the changed partitions, removals drop
partitions.  No maintenance case needs a full rebuild; this family is the
simplest point on the maintained-index spectrum (vs the gram chain's
flip handling or the semantic index's epoch-pinned codebook) precisely
because the statistic is a per-row map + additive count.

Serving folds the index-sized partials (|files| × |sources| × ≤1000 bins)
instead of re-aggregating the corpus — the cutoff side of the calibrated
cut stops scanning documents entirely; the per-doc verdict pass remains
the narrow map it always was.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.operators import text as tx
from olap_sus_spark.operators.index_store import (
    compact_manifest,
    corpus_file_paths,
    corpus_files,
    drop_src_partitions,
    index_root,
    manifest_diff,
    manifest_is_current,
    read_manifest,
    staging_path,
    sweep_stale_staging,
    write_manifest,
)

_SRC = "src"
_BINS = 1000
_ALGO_VERSION = "v1"


def quality_hist_path(sf_dir: str) -> str:
    import hashlib

    key = hashlib.md5(
        f"{_ALGO_VERSION}|{os.path.abspath(sf_dir)}|qualhist|{_BINS}".encode()
    ).hexdigest()[:16]
    return os.path.join(index_root(), f"qhist_{key}")


def _with_src(df: DataFrame) -> DataFrame:
    return df.withColumn(_SRC, F.element_at(F.split(F.input_file_name(), "/"), -1))


def q_bin(text_col) -> F.Column:
    """The calibrated cut's score bin — MUST stay expression-identical to
    quality_calibrated_cut's so the served twin shares its oracle."""
    ratio = tx.stopword_ratio(text_col)
    return F.least(F.floor(ratio * _BINS), F.lit(_BINS - 1)).cast("int")


def _partials(docs: DataFrame) -> DataFrame:
    """(src, source, q_bin, cnt) — one narrow map + one grouped count."""
    return (
        docs.select(_SRC, "source", q_bin(F.col("text")).alias("q_bin"))
        .groupBy(_SRC, "source", "q_bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _write_partials(frame: DataFrame, root: str, dynamic: bool) -> None:
    from olap_sus_spark.sources.sinks import write_sorted_partitioned

    write_sorted_partitioned(
        frame, root, _SRC, ["source", "q_bin"], files=1, dynamic=dynamic
    )


def load_or_build_quality_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve the per-source histogram partials, building on first use.
    Staleness via the corpus manifest (the caller ingested without
    :func:`refresh_quality_hist`) triggers the safe full rebuild."""
    from olap_sus_spark.catalog import load_table
    from olap_sus_spark.operators.similarity import (
        _retire_and_promote,
        _serve_retry,
    )

    path = quality_hist_path(sf_dir)
    current = corpus_files(sf_dir, table="documents")
    man = read_manifest(path)
    if not manifest_is_current(man, current):
        sweep_stale_staging()
        docs = _with_src(load_table(spark, sf_dir, "documents"))
        os.makedirs(index_root(), exist_ok=True)
        staging = staging_path(path)
        _write_partials(_partials(docs), staging, dynamic=False)
        write_manifest(staging, compact_manifest(man, current))
        _retire_and_promote(staging, path, current)
    return _serve_retry(spark, path).select(_SRC, "source", "q_bin", "cnt")


def refresh_quality_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorb ANY corpus change partition-locally: appended and rewritten
    part files recompute exactly their own partials partitions; removed
    files drop theirs.  Additivity means there is no cross-file state and
    therefore no full-rebuild case at all — idempotent by construction."""
    from olap_sus_spark.operators.similarity import _serve_retry

    path = quality_hist_path(sf_dir)
    man = read_manifest(path)
    current = corpus_files(sf_dir, table="documents")
    if man is None:
        return load_or_build_quality_hist(spark, sf_dir)
    added, changed, removed = manifest_diff(man, current)
    if removed:
        drop_src_partitions(path, set(removed))
    touched = added + changed
    if touched:
        paths = corpus_file_paths(sf_dir, "documents", touched)
        docs = _with_src(spark.read.parquet(*paths))
        _write_partials(_partials(docs), path, dynamic=True)
    if touched or removed:
        write_manifest(path, compact_manifest(man, current))
    return _serve_retry(spark, path).select(_SRC, "source", "q_bin", "cnt")
