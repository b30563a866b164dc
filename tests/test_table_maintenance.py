"""Table-maintenance operators (sources/sinks.py): keyed MERGE/upsert,
small-file compaction, and sorted (layout-optimized) writes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.sources.sinks import (
    compact_partition,
    merge_upsert,
    write_sorted,
)
from tests.conftest import SF_DIR


def test_merge_upsert_applies_cdc(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = load_table(spark, SF_DIR, "orders").limit(100).cache()
    base.write.parquet(path)
    keys = [r.o_orderkey for r in base.select("o_orderkey").orderBy("o_orderkey").limit(3).collect()]
    upd_key, del_key, keep_key = keys
    new_key = 999_999_999

    changes = (
        base.filter(F.col("o_orderkey") == upd_key)
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn("_op", F.lit("upsert"))
        .unionByName(
            base.filter(F.col("o_orderkey") == del_key).withColumn("_op", F.lit("delete"))
        )
        .unionByName(
            base.filter(F.col("o_orderkey") == keep_key)
            .withColumn("o_orderkey", F.lit(new_key))
            .withColumn("_op", F.lit("upsert"))
        )
    )
    merge_upsert(spark, path, changes, ["o_orderkey"])
    got = spark.read.parquet(path)

    assert got.count() == 100  # -1 delete +1 insert
    assert got.filter(F.col("o_orderkey") == del_key).count() == 0
    assert (
        got.filter(F.col("o_orderkey") == upd_key).select("o_orderstatus").first()[0]
        == "X"
    )
    assert got.filter(F.col("o_orderkey") == new_key).count() == 1
    # untouched rows identical
    rest = got.filter(~F.col("o_orderkey").isin(upd_key, del_key, new_key))
    want = base.filter(~F.col("o_orderkey").isin(upd_key, del_key))
    assert sorted(map(tuple, rest.collect())) == sorted(map(tuple, want.collect()))


def test_merge_upsert_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = load_table(spark, SF_DIR, "orders").limit(50)
    base.write.parquet(path)
    changes = base.limit(5).withColumn("o_orderstatus", F.lit("Z")).withColumn(
        "_op", F.lit("upsert")
    )
    merge_upsert(spark, path, changes, ["o_orderkey"])
    once = sorted(map(tuple, spark.read.parquet(path).collect()))
    merge_upsert(spark, path, changes, ["o_orderkey"])
    twice = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert once == twice


def test_compact_partition(spark, tmp_path):
    path = str(tmp_path / "many")
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(8).write.parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert sum(1 for f in os.listdir(path) if f.endswith(".parquet")) == 8
    n = compact_partition(spark, path, target_files=2)
    assert n == 2
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before


def test_write_sorted_produces_tight_disjoint_stats(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "sorted")
    li = load_table(spark, SF_DIR, "lineitem")
    write_sorted(li, path, ["l_shipdate"], files=4)

    spans = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index("l_shipdate")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append((lo, hi))
    assert len(spans) == 4
    # range partitioning => files cover near-disjoint, ordered value ranges
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"
    # and data survives byte-identical
    assert spark.read.parquet(path).count() == li.count()


def _file_spans(path, col):
    """Per-parquet-file (min, max) footer stats for ``col``."""
    import pyarrow.parquet as pq

    spans = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append((lo, hi))
    return spans


def test_write_zordered_tightens_stats_on_every_dimension(spark, tmp_path):
    """Z-order clustering: per-file min/max spans shrink for BOTH clustered
    columns, where a lead-column sort leaves the second column's spans at
    (nearly) the full value range — i.e. only Z-order lets footer stats
    prune selective filters on either column."""
    from olap_sus_spark.sources.sinks import write_zordered

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )

    def global_span(col):
        lo, hi = li.agg(F.min(col), F.max(col)).first()
        return lo, hi, float(hi - lo)

    z_path = str(tmp_path / "zord")
    write_zordered(li, z_path, ["l_partkey", "l_suppkey"], files=4)
    s_path = str(tmp_path / "lead")
    write_sorted(li, s_path, ["l_partkey", "l_suppkey"], files=4)

    def files_hit(path, col, q_lo, q_hi):
        """How many files footer stats CANNOT skip for col BETWEEN q_lo/q_hi."""
        return sum(1 for lo, hi in _file_spans(path, col) if hi >= q_lo and lo <= q_hi)

    # a 5%-of-range band predicate must be prunable on BOTH dimensions
    # (range-partition split points aren't exact quadrant boundaries, so one
    # straddling file is tolerated — hence <= 3 of 4, not <= 2)
    for col in ("l_partkey", "l_suppkey"):
        lo, _, g = global_span(col)
        q_lo, q_hi = lo + 0.10 * g, lo + 0.15 * g
        hit = files_hit(z_path, col, q_lo, q_hi)
        assert hit <= 3, f"{col}: z-order layout cannot skip any file"

    # the lead-sorted layout cannot prune the SECOND column at all: every
    # file spans (essentially) the whole l_suppkey range
    lo, _, g = global_span("l_suppkey")
    assert files_hit(s_path, "l_suppkey", lo + 0.10 * g, lo + 0.15 * g) == 4

    # layout machinery only: data round-trips, no extra column
    out = spark.read.parquet(z_path)
    assert out.columns == li.columns
    assert out.count() == li.count()


def test_zorder_key_guards_bit_budget(spark):
    import pytest

    from olap_sus_spark.sources.sinks import zorder_key

    li = load_table(spark, SF_DIR, "lineitem")
    with pytest.raises(ValueError):
        zorder_key(li, ["l_orderkey"] * 6, bits=12)
