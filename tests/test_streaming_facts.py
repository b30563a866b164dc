"""Streaming fact ingest: drops drain into the corpus exactly once and
every maintained summary serves, after the stream, exactly what a fresh
rebuild over the final corpus computes (stream == rebuild)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.sources.sinks import append_exactly_once
from olap_sus_spark.streaming.facts import stream_lineitem_ingest
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _stage(spark, tmp_path):
    """Corpus with the FIRST YEAR of lineitem pre-loaded (directory
    dataset) + two landing drops covering the rest, split mid-range so the
    stream sees two files."""
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    for t in ("orders", "supplier"):
        src = os.path.join(SF_DIR, f"{t}.parquet")
        (shutil.copytree if os.path.isdir(src) else shutil.copy)(
            src, os.path.join(corpus, f"{t}.parquet")
        )
    li = load_table(spark, SF_DIR, "lineitem")
    li.filter(F.year("l_shipdate") <= 1995).coalesce(1).write.parquet(
        os.path.join(corpus, "lineitem.parquet")
    )
    landing = str(tmp_path / "landing")
    rest = li.filter(F.year("l_shipdate") > 1995)
    rest.filter(F.year("l_shipdate") <= 1998).coalesce(1).write.parquet(
        os.path.join(landing, "drop_a")
    )
    rest.filter(F.year("l_shipdate") > 1998).coalesce(1).write.parquet(
        os.path.join(landing, "drop_b")
    )
    # flatten the two drops into bare files so the file stream sees them
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, d in enumerate(sorted(os.listdir(landing))):
        for f in os.listdir(os.path.join(landing, d)):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(landing, d, f), os.path.join(flat, f"drop_{i}.parquet")
                )
    return corpus, flat


def test_stream_equals_rebuild_for_every_summary(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    corpus, landing = _stage(spark, tmp_path)
    stream_lineitem_ingest(
        spark, landing, corpus, str(tmp_path / "ck"), max_files_per_trigger=1
    )  # two drops → two REAL micro-batches, two refresh rounds

    # corpus content == the full original lineitem, no dupes, no losses
    got = _rows(load_table(spark, corpus, "lineitem"))
    want = _rows(load_table(spark, SF_DIR, "lineitem"))
    assert got == want

    from olap_sus_spark.queries import cms as qcms
    from olap_sus_spark.queries import hist as qhist
    from olap_sus_spark.queries import incremental as qinc
    from olap_sus_spark.queries import sketches as qsk

    serves = [
        qinc.incremental_revenue_by_month,
        qsk.kmv_monthly_distinct_served,
        qcms.cms_supplier_counts_served,
        qhist.hist_order_value_served,
    ]
    streamed = [_rows(s(spark, corpus)) for s in serves]
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx_fresh"))
    rebuilt = [_rows(s(spark, corpus)) for s in serves]
    assert streamed == rebuilt

    # draining again with the same checkpoint is a no-op (no new files)
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    stream_lineitem_ingest(spark, landing, corpus, str(tmp_path / "ck"))
    assert _rows(load_table(spark, corpus, "lineitem")) == want


def test_replayed_batch_appends_nothing(spark, tmp_path):
    """A crash between append and checkpoint commit re-delivers the batch;
    the (run_tag, batch_id)-keyed rename must make the second delivery a
    no-op — while a DIFFERENT stream's batch 0 (fresh checkpoint, ids
    restart) must still append, never be mistaken for a replay."""
    table = str(tmp_path / "t.parquet")
    batch = load_table(spark, SF_DIR, "lineitem").limit(100)
    append_exactly_once(batch, table, 7, "runA")
    once = _rows(spark.read.parquet(table))
    append_exactly_once(batch, table, 7, "runA")  # replay, same stream
    assert _rows(spark.read.parquet(table)) == once
    append_exactly_once(batch, table, 8, "runA")  # a NEW batch does append
    assert spark.read.parquet(table).count() == 200
    append_exactly_once(batch, table, 7, "runB")  # new STREAM, colliding id
    assert spark.read.parquet(table).count() == 300
