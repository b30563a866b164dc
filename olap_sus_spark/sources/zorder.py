"""Z-order (Morton-curve) data layout — multi-dimensional row-group
pruning for the lake.

A parquet scan skips a row group when the pushed predicate can't match its
footer min/max.  Sorting on ONE column makes that work for one dimension
only; a range-sort on the interleaved-bit Morton value of TWO columns
clusters BOTH, so a 2-D box predicate (part × supplier, user × day, …)
touches only the row groups whose rectangles intersect the box — the same
technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.  At 100 TB the
layout is written once per partition at ingest/compaction; every
subsequent selective scan pays for it.

Everything is Catalyst-only: the z-value is a fixed chain of shift/mask/or
expressions (whole-stage codegen, no UDF), the layout write is
``repartitionByRange`` on z (globally ordered files) + ``sortWithinPartitions``
(ordered row groups inside each file).

The maintained z-layout copy follows the index-store contract
(location-keyed path + corpus-stamp marker, staged build + atomic
promotion, loser-discards race rule) so serving never rebuilds and a
changed corpus never serves stale bytes.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    ints: x in even bit positions, y in odd.  A fixed expression chain —
    stays inside whole-stage codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftleft(
            F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        yb = F.shiftleft(
            F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        z = z.bitwiseOR(xb).bitwiseOR(yb)
    return z


def scale_to_bits(col: Column, mn: int, mx: int, bits: int) -> Column:
    """Map an integer column from [mn, mx] onto [0, 2^bits) by pure bit
    shifts — exact at any magnitude (a multiply-divide scaling would lose
    precision past 2^53 through the double division).  Wide ranges keep
    their top ``bits`` bits; narrow ranges shift UP so both dimensions
    spend the full bit budget (that is what keeps the Morton bands sharp
    when one column has a small domain)."""
    span = max(1, mx - mn)
    sb = span.bit_length()
    base = col.cast("long") - F.lit(mn)
    if sb >= bits:
        return F.shiftright(base, sb - bits)
    return F.shiftleft(base, bits - sb)


def zorder_frame(
    df: DataFrame, colx: str, coly: str, bits: int = 16, files: int | None = None
) -> DataFrame:
    """Return ``df`` ordered for a z-layout write: one exact min/max pass
    over the two cluster columns, then range-partition + in-partition sort
    on the Morton value.  The helper column is dropped — the layout IS the
    output.  ``files`` pins the range-partition count (default: the
    session's shuffle parallelism)."""
    stats = df.agg(
        F.min(colx).cast("long"),
        F.max(colx).cast("long"),
        F.min(coly).cast("long"),
        F.max(coly).cast("long"),
    ).first()
    if stats[0] is None:
        return df
    z = z_value(
        scale_to_bits(F.col(colx), stats[0], stats[1], bits),
        scale_to_bits(F.col(coly), stats[2], stats[3], bits),
        bits,
    )
    out = df.withColumn("_z", z)
    out = (
        out.repartitionByRange(files, "_z")
        if files
        else out.repartitionByRange("_z")
    )
    return out.sortWithinPartitions("_z").drop("_z")


def zorder_layout_path(sf_dir: str, table: str, colx: str, coly: str) -> str:
    from olap_sus_spark.operators.index_store import index_path

    return index_path(
        "zorder", f"v1|{os.path.abspath(sf_dir)}|{table}|{colx}|{coly}"
    )


def load_or_build_zorder(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    colx: str,
    coly: str,
    bits: int = 16,
) -> DataFrame:
    """Serve the z-ordered copy of ``table`` clustered on (colx, coly),
    building + promoting it on first use (stamp-marker staleness, staged
    build, retire-then-promote with the component-aware pre-retire
    freshness re-check — the race rules every maintained table follows)."""
    import shutil
    import time

    from olap_sus_spark.catalog import load_table
    from olap_sus_spark.operators.index_store import (
        corpus_stamp,
        index_root,
        promote,
        staging_path,
        sweep_stale_staging,
    )
    from olap_sus_spark.operators.maintained import read_marker, write_marker

    path = zorder_layout_path(sf_dir, table, colx, coly)
    stamp = corpus_stamp(sf_dir, table)
    if not os.path.exists(path) or read_marker(path) != stamp:
        sweep_stale_staging()
        os.makedirs(index_root(), exist_ok=True)
        staging = staging_path(path)
        zorder_frame(load_table(spark, sf_dir, table), colx, coly, bits).write.mode(
            "overwrite"
        ).parquet(staging)
        write_marker(staging, stamp)
        if os.path.exists(path) and read_marker(path) == stamp:
            # concurrent builder landed a FRESH copy mid-build: retiring it
            # would yank files under its readers — ours is equivalent
            shutil.rmtree(staging, ignore_errors=True)
        elif os.path.exists(path):
            tomb = staging_path(path) + ".stale"
            try:
                os.rename(path, tomb)
            except OSError:
                tomb = None
            promote(staging, path)
            if tomb is not None:
                shutil.rmtree(tomb, ignore_errors=True)
        else:
            promote(staging, path)
    for _ in range(100):
        try:
            return spark.read.parquet(path)
        except Exception:
            if os.path.exists(path):
                raise
            time.sleep(0.05)
    return spark.read.parquet(path)


def row_groups_touched(path: str, boxes: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(intersecting, total) parquet row groups for a conjunctive box
    predicate, judged from footer min/max — exactly the statistics the
    reader's predicate pushdown skips by.  Probe-only measurement tool."""
    import pyarrow.parquet as pq

    files = (
        [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
        if os.path.isdir(path)
        else [path]
    )
    touched = total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            hit = True
            for col, (lo, hi) in boxes.items():
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats: reader must touch it
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            touched += hit
    return touched, total
