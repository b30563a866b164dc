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
    when one column has a small domain).  Values outside [mn, mx] CLAMP
    to the edges: the monthly maintained layout reuses the full-build
    domain on refresh (that is what keeps refresh O(month)), so a drifted
    key must degrade pruning for its own rows only, never corrupt the
    interleave with a negative shift."""
    span = max(1, mx - mn)
    sb = span.bit_length()
    base = F.greatest(
        F.lit(0).cast("long"),
        F.least(col.cast("long") - F.lit(mn), F.lit(span).cast("long")),
    )
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


# ---------------------------------------------------------------------------
# Monthly-maintained z-layout — the fact-lake default (round 7).
#
# The global layout above rebuilds the WHOLE copy when the corpus changes;
# commit d60a0d3 proved month-scoped Morton layouts compose, prune, and
# answer identically, so the maintained fact layout is now month-
# partitioned under the shared maintained-partials contract: a dated
# ingest refreshes ONLY the touched months (O(month), staged + atomically
# swapped), exactly how production lakehouses run OPTIMIZE ZORDER BY per
# partition.  Two deliberate deviations from the tiny-partials default:
#
# - the pre-write shaping is a range exchange on (mes_dt, _z), NOT
#   _one_file_per_month: a fact month is data-sized, so each month must be
#   written by many tasks as contiguous z-runs (the partitioned write then
#   emits per-month files that are disjoint z-ranges with ordered row
#   groups inside — the same footer-stats geometry as the global layout);
# - the Morton domain (per-column min/max) is computed ONCE at the first
#   full build and persisted in the layout dir (`_zdomain.json`), then
#   REUSED on refresh — re-deriving it would scan history and silently
#   turn refresh O(corpus).  Key domains are stable dimensions; a key
#   outside the stored domain clamps (scale_to_bits), degrading pruning
#   for its own rows only.  Dropping the layout dir re-derives everything.
# ---------------------------------------------------------------------------
_DOMAIN_FILE = "_zdomain.json"  # leading "_": invisible to Spark's FileIndex


def _read_domain(path: str) -> list[int] | None:
    import json

    try:
        with open(os.path.join(path, _DOMAIN_FILE)) as f:
            d = json.load(f)
        return [int(v) for v in d["bounds"]]
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _write_domain(path: str, bounds: list[int]) -> None:
    import json

    try:
        with open(os.path.join(path, _DOMAIN_FILE), "w") as f:
            json.dump({"bounds": bounds}, f)
    except OSError:
        pass  # absent file ⇒ next refresh re-derives (full scan, correct)


def _month_z_layout(df: DataFrame) -> DataFrame:
    """Pre-write shaping for the partitioned z-layout: range exchange on
    (month, morton) so every output task owns a contiguous z-run of one
    (or a few) months, in-partition sort for ordered row groups, helper
    column dropped (the layout IS the output)."""
    return (
        df.repartitionByRange("mes_dt", "_z")
        .sortWithinPartitions("mes_dt", "_z")
        .drop("_z")
    )


def zorder_monthly_path(
    sf_dir: str, table: str, colx: str, coly: str, date_col: str
) -> str:
    from olap_sus_spark.operators.index_store import index_path

    return index_path(
        "zorderm",
        f"v1|{os.path.abspath(sf_dir)}|{table}|{colx}|{coly}|{date_col}",
    )


def _monthly_build_fn(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    colx: str,
    coly: str,
    date_col: str,
    bits: int,
    bounds: list[int],
):
    from olap_sus_spark.catalog import load_table
    from olap_sus_spark.operators.maintained import month_range_cond

    def build(months: list[str] | None) -> DataFrame:
        df = load_table(spark, sf_dir, table)
        if months is not None:
            df = df.filter(month_range_cond(date_col, months))
        z = z_value(
            scale_to_bits(F.col(colx), bounds[0], bounds[1], bits),
            scale_to_bits(F.col(coly), bounds[2], bounds[3], bits),
            bits,
        )
        return df.withColumn(
            "mes_dt", F.date_format(date_col, "yyyy-MM")
        ).withColumn("_z", z)

    return build


def _monthly_domain(
    spark: SparkSession, sf_dir: str, table: str, colx: str, coly: str, path: str
) -> list[int]:
    bounds = _read_domain(path)
    if bounds is not None:
        return bounds
    from olap_sus_spark.catalog import load_table

    stats = (
        load_table(spark, sf_dir, table)
        .agg(
            F.min(colx).cast("long"),
            F.max(colx).cast("long"),
            F.min(coly).cast("long"),
            F.max(coly).cast("long"),
        )
        .first()
    )
    if stats[0] is None:
        # Empty table: a degenerate [0,0,0,0] domain keeps scale_to_bits
        # well-defined (every later key clamps to 0 until a real full
        # build re-derives the domain) instead of int(None) blowing up.
        return [0, 0, 0, 0]
    return [int(v) for v in stats]


def load_or_build_zorder_monthly(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    colx: str,
    coly: str,
    date_col: str,
    bits: int = 16,
) -> DataFrame:
    """Serve the month-partitioned maintained z-layout of ``table``
    clustered on (colx, coly) — full staged build on first use / stale
    stamp, O(month) dated refresh via :func:`refresh_zorder_monthly`."""
    from olap_sus_spark.operators.maintained import load_or_build_partials
    from olap_sus_spark.operators.index_store import corpus_stamp

    path = zorder_monthly_path(sf_dir, table, colx, coly, date_col)
    stamp = corpus_stamp(sf_dir, table)
    bounds = _monthly_domain(spark, sf_dir, table, colx, coly, path)
    out = load_or_build_partials(
        spark,
        path,
        stamp,
        _monthly_build_fn(spark, sf_dir, table, colx, coly, date_col, bits, bounds),
        layout=_month_z_layout,
    )
    if _read_domain(path) is None:
        _write_domain(path, bounds)
    return out


# Domain-drift re-layout trigger: when more than this fraction of the rows
# in the months being refreshed fall OUTSIDE the stored Morton domain,
# scale_to_bits clamps them all onto the domain-edge cells — their _z
# values stop discriminating and box pruning inside those months degrades
# toward scan-everything (measured in tools/zdomain_drift_probe.py: a month
# 2x outside the domain touches ~every row group for an in-month box; after
# the triggered rebuild the box prunes normally again).  Below the
# threshold the clamped rows only bloat the two edge cells; in-domain boxes
# keep their pruning, so the O(month) refresh stays the right trade.
ESCAPE_REBUILD_FRACTION = 0.2


def _escape_fraction(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    colx: str,
    coly: str,
    date_col: str,
    days: list[str],
    bounds: list[int],
) -> float:
    """Fraction of rows in the months containing ``days`` whose cluster
    keys fall outside ``bounds`` — one O(touched-month) aggregate over the
    slice the refresh is about to re-layout anyway."""
    from olap_sus_spark.catalog import load_table
    from olap_sus_spark.operators.maintained import month_range_cond

    months = sorted({d[:7] for d in days})
    out = (
        load_table(spark, sf_dir, table)
        .filter(month_range_cond(date_col, months))
        .agg(
            F.avg(
                (
                    (F.col(colx) < bounds[0])
                    | (F.col(colx) > bounds[1])
                    | (F.col(coly) < bounds[2])
                    | (F.col(coly) > bounds[3])
                ).cast("double")
            )
        )
        .first()[0]
    )
    return float(out) if out is not None else 0.0


def refresh_zorder_monthly(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    colx: str,
    coly: str,
    date_col: str,
    days: list[str],
    bits: int = 16,
) -> None:
    """Re-layout ONLY the months containing ``days`` — the incremental
    maintenance path a dated fact ingest calls after appending.  Reuses
    the stored Morton domain, so cost is O(touched months), never
    O(history).

    Drift guard: if more than :data:`ESCAPE_REBUILD_FRACTION` of the
    refreshed months' rows escape the stored domain (keys clamp to the
    edge cells, killing their pruning), the stored domain sidecar is
    removed and the stamp marker poisoned, so the rebuild runs through
    load_or_build's STAGED path (old layout keeps serving until the atomic
    swap — never a deleted live directory) with a freshly derived domain:
    the documented re-layout trigger (VERDICT r07 #4).  The check is one
    aggregate over the same month slice the refresh re-reads, so the
    common no-drift case stays O(month)."""
    from olap_sus_spark.operators.maintained import refresh_partials, write_marker
    from olap_sus_spark.operators.index_store import corpus_stamp

    path = zorder_monthly_path(sf_dir, table, colx, coly, date_col)
    stamp = corpus_stamp(sf_dir, table)
    stored = _read_domain(path)
    if stored is not None and os.path.exists(path):
        esc = _escape_fraction(
            spark, sf_dir, table, colx, coly, date_col, days, stored
        )
        if esc > ESCAPE_REBUILD_FRACTION:
            try:
                os.remove(os.path.join(path, _DOMAIN_FILE))
            except OSError:
                pass  # already gone — rebuild re-derives either way
            write_marker(path, f"zdomain-drift-retired:{stamp}")
            load_or_build_zorder_monthly(
                spark, sf_dir, table, colx, coly, date_col, bits
            )
            return
    bounds = stored if stored is not None else _monthly_domain(
        spark, sf_dir, table, colx, coly, path
    )
    refresh_partials(
        spark,
        path,
        stamp,
        _monthly_build_fn(spark, sf_dir, table, colx, coly, date_col, bits, bounds),
        days,
        layout=_month_z_layout,
    )
    if _read_domain(path) is None:
        _write_domain(path, bounds)


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
