"""Warehouse sinks: idempotent Parquet writes (SURVEY.md §2.1 S4, §7 risks).

The reference appends facts and bridge rows to Postgres over JDBC with no
transaction around the read-check-assign-write sequence
(/root/reference/dags/spark_script_sim.py:239,402) — a retry double-writes.
Here:

- **facts** land as date-partitioned Parquet with *dynamic partition
  overwrite*: re-running a day replaces exactly that day's partition and
  nothing else.  Idempotent by construction, and the ``dt=`` layout gives
  partition pruning to every downstream query.
- **bridge rows** carry content-hash group ids (operators/bridge.py), so a
  re-run emits byte-identical rows; the sink anti-joins against the existing
  store and appends only genuinely new groups.
"""

from __future__ import annotations

import os
import posixpath

from pyspark.sql import DataFrame, SparkSession


def write_fact_partition(df: DataFrame, warehouse_dir: str, table: str, dt: str) -> str:
    """Overwrite the single ``dt=<date>`` partition of a fact table."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    path = posixpath.join(warehouse_dir, table)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.withColumn("dt", F.lit(dt))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )
    return path


def append_bridge(df: DataFrame, warehouse_dir: str, table: str = "ponte_grupo_causas") -> str:
    """Append only new (content-keyed) bridge rows; existing keys are skipped.

    Safe to re-run: identical input produces identical keys, which the
    anti-join removes.  At scale the existing-side scan prunes to the one
    join column (``chave_grupo_causa``) via Parquet column pruning.
    """
    spark = df.sparkSession
    path = posixpath.join(warehouse_dir, table)
    if _exists(spark, path):
        existing = spark.read.parquet(path).select("chave_grupo_causa").distinct()
        df = df.join(existing, "chave_grupo_causa", "left_anti")
    df.write.mode("append").parquet(path)
    return path


def write_dimension(df: DataFrame, warehouse_dir: str, name: str) -> str:
    """Full-overwrite a (small) dimension table."""
    path = posixpath.join(warehouse_dir, name)
    df.write.mode("overwrite").parquet(path)
    return path


def _exists(spark: SparkSession, path: str) -> bool:
    if "://" not in path:
        return os.path.exists(path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)  # pragma: no cover
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(jvm_path)


def merge_upsert(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "_op",
) -> str:
    """Keyed MERGE (CDC apply) onto a Parquet table without a lakehouse
    format: upserts/deletes from ``changes`` rewrite the table atomically.

    ``changes`` carries ``op_col`` ∈ {'upsert', 'delete'}.  Semantics match
    SQL MERGE: matched+upsert → replace, matched+delete → drop,
    unmatched+upsert → insert.  Implementation is one co-partitioned
    anti-join (drop all changed keys from the base) plus a union of the
    upserts — the same single-shuffle shape a Delta MERGE plans, minus the
    transaction log.  The rewrite stages to a temp dir then swaps, so a
    failed job never leaves a half-written table (the swap is the commit
    point; cloud stores would use a rename-manifest instead).

    At 100 TB the base table should be ``dt=``-partitioned and ``changes``
    pre-filtered to affected partitions (write_fact_partition's layout);
    this function is the per-partition apply.
    """
    base = spark.read.parquet(path)
    keys = changes.select(*key_cols).distinct()
    survivors = base.join(keys, key_cols, "left_anti")
    upserts = changes.filter(f"{op_col} = 'upsert'").drop(op_col).select(*base.columns)
    merged = survivors.unionByName(upserts)

    staging = path.rstrip("/") + ".__staging__"
    merged.write.mode("overwrite").parquet(staging)
    _swap_in(spark, path, staging)
    return path


def append_exactly_once(
    batch: DataFrame, table_dir: str, batch_id: int, run_tag: str
) -> None:
    """Exactly-once micro-batch append for foreachBatch sinks: the batch
    lands as ``ingest_batch_<run_tag>_<id>.parquet`` inside the dataset
    directory via stage-then-rename, so a replayed batch (crash between
    append and checkpoint commit) finds its file already present and SKIPS
    — no duplicate rows, no transaction log.  ``run_tag`` scopes the dedup
    to ONE logical stream: batch ids restart at 0 per checkpoint, so
    without the tag a fresh-checkpoint drain into an existing corpus would
    collide with a prior run's batch 0 and silently drop its rows — derive
    the tag from the checkpoint location (:func:`run_tag_of`).  One file
    per batch also grows the corpus manifest O(1) per batch, the property
    the incremental index refreshes key on.  Day-scale batches; larger
    batches would shard by a within-batch key and rename each shard under
    its own deterministic name."""
    import shutil

    dst = os.path.join(table_dir, f"ingest_batch_{run_tag}_{batch_id:06d}.parquet")
    if os.path.exists(dst):
        return  # replayed batch — already committed
    staging = f"{table_dir}.__ingest__{run_tag}_{batch_id}_{os.getpid()}"
    batch.coalesce(1).write.mode("overwrite").parquet(staging)
    parts = sorted(
        f for f in os.listdir(staging) if f.endswith(".parquet") and f.startswith("part-")
    )
    assert len(parts) == 1, parts
    os.makedirs(table_dir, exist_ok=True)
    # Commit point is a hard-link, NOT a rename: POSIX rename silently
    # REPLACES an existing destination, so it cannot detect the concurrent-
    # replayer race (harmless only because a replayed batch's bytes are
    # identical — but that's an accident, not a guarantee).  link() fails
    # with EEXIST exactly when another replayer already committed, making
    # first-commit-wins explicit.
    try:
        os.link(os.path.join(staging, parts[0]), dst)
    except FileExistsError:
        pass  # a concurrent replayer committed first — keep its copy
    except OSError as exc:
        # Filesystems without hard-link support (some FUSE/object-store
        # mounts) raise EPERM/EXDEV/ENOTSUP from link() where the plain
        # rename commit used to work.  Fall back to the exists-check +
        # rename commit there; link() stays the primary path because it is
        # the one that makes first-commit-wins DETECTABLE.
        import errno

        if exc.errno not in (errno.EPERM, errno.EXDEV, errno.ENOTSUP, errno.EACCES):
            raise
        # Emulate link()'s first-commit-wins: O_EXCL create is the atomic
        # claim (a plain exists-check + rename is NOT — POSIX rename
        # silently replaces, so two replayers racing through the TOCTOU
        # window would both commit and the later would overwrite the
        # earlier).  Trade-off vs link(): a committer crashing mid-copy
        # leaves a truncated dst that replays then skip — recover by
        # deleting the file; link() has no such window, which is why it
        # stays the primary path.
        try:
            with open(dst, "xb") as out, open(
                os.path.join(staging, parts[0]), "rb"
            ) as src:
                shutil.copyfileobj(src, out)
                out.flush()
                os.fsync(out.fileno())
        except FileExistsError:
            pass  # a concurrent replayer claimed the slot first
    shutil.rmtree(staging, ignore_errors=True)


def run_tag_of(checkpoint_dir: str) -> str:
    """Stable per-stream tag for :func:`append_exactly_once`, derived from
    the checkpoint location — the same identity Structured Streaming keys
    its batch ids on, so replays share the tag and distinct streams (or a
    wiped/relocated checkpoint, which IS a new stream) never collide."""
    import hashlib

    return hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:8]


def compact_partition(spark: SparkSession, path: str, target_files: int = 1) -> int:
    """Small-file compaction: rewrite a table/partition directory into
    ``target_files`` parquet files (streaming ingest and per-day appends
    accumulate small files that wreck scan parallelism accounting and
    NameNode/listing costs at scale).  Returns the new file count.
    Coalesce (not repartition): a pure read+write with no shuffle.
    """
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + ".__compact__"
    df.coalesce(target_files).write.mode("overwrite").parquet(staging)
    _swap_in(spark, path, staging)
    return sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    ) if "://" not in path else target_files


def write_sorted(
    df: DataFrame, path: str, sort_cols: list[str], files: int = 4
) -> str:
    """Layout-optimized write: range-partition + sort by ``sort_cols`` so
    each parquet file (and row group) covers a tight, near-disjoint value
    range.  Parquet min/max footer stats then let any filter on the sort
    key skip whole files/row groups — the poor man's clustering/Z-order,
    and the single highest-leverage layout choice for selective scans at
    100 TB.  (For multi-column skipping, lead with the most-filtered
    column; true Z-order interleaving needs a lakehouse format.)
    """
    (
        df.repartitionByRange(files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12):
    """Morton (Z-order) interleave key over ``cols`` as a pure Catalyst
    expression — multi-dimensional clustering without a lakehouse format.

    Each column is min/max-scaled to ``bits`` buckets (bounds come from one
    scalar aggregate, collected like a codebook — bounded driver work), and
    the bucket bits are interleaved so nearby Z values are nearby in EVERY
    dimension.  ``k * bits`` must fit a BIGINT (k <= 5 at the default 12).
    NULLs scale to bucket 0.  Min/max scaling keeps the expression
    shuffle-free; under heavy skew substitute rank-based buckets (a
    repartitionByRange pass) — same interleave, different scale.
    """
    from pyspark.sql import functions as F

    if len(cols) * bits > 63:
        raise ValueError(f"zorder_key: {len(cols)} cols x {bits} bits > 63")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()
    k = len(cols)
    scaled = []
    for c in cols:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        if lo is None:  # all-NULL column: every row lands in bucket 0
            lo, hi = 0.0, 0.0
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit((1 << bits) - 1),
                F.floor(
                    (F.coalesce(F.col(c).cast("double"), F.lit(lo)) - F.lit(lo))
                    / F.lit(span)
                    * F.lit(1 << bits)
                ).cast("bigint"),
            )
        )
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return z


def write_zordered(
    df: DataFrame, path: str, cols: list[str], files: int = 4, bits: int = 12
) -> str:
    """:func:`write_sorted` generalized to multi-dimensional skipping:
    range-partition + sort by the Morton key of ``cols`` so parquet footer
    min/max stats prune selective filters on ANY of the clustered columns
    — a lead-column sort prunes only its first column.  The key is layout
    machinery only (not written to the table).  At 100 TB this is the
    OPTIMIZE ZORDER equivalent for the hot multi-predicate tables."""
    from pyspark.sql import functions as F

    z = zorder_key(df, cols, bits)
    (
        df.withColumn("__z__", z)
        .repartitionByRange(files, F.col("__z__"))
        .sortWithinPartitions("__z__")
        .drop("__z__")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def write_sorted_partitioned(
    df: DataFrame,
    path: str,
    part_col: str,
    sort_cols: list[str],
    files: int = 4,
    dynamic: bool = False,
) -> str:
    """:func:`write_sorted` with a directory-partition column layered on
    top — the layout of the incrementally-maintained index tables: the
    ``part_col`` (source part-file name) is the refresh unit (dynamic
    partition overwrite replaces exactly the refreshed source's rows), and
    within each partition files stay range-sorted on ``sort_cols`` so
    footer min/max stats keep pruning selective probes.  ``dynamic=True``
    scopes an overwrite to the partitions present in ``df`` (saving and
    restoring the session conf)."""
    spark = df.sparkSession
    out = (
        df.repartitionByRange(files, part_col, *sort_cols)
        .sortWithinPartitions(part_col, *sort_cols)
        .write.mode("overwrite")
        .partitionBy(part_col)
    )
    if not dynamic:
        out.parquet(path)
        return path
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return path


def _swap_in(spark: SparkSession, path: str, staging: str) -> None:
    """Commit a staged rewrite by directory renames, never by rewriting the
    live table: retire the current dir, promote staging, drop the retired
    copy.  A crash before the promote leaves the original table intact (at
    worst under the retired name); a crash after it leaves the new table
    live — there is no window where the data exists only as a half-written
    directory.  (On object stores swap a manifest instead; renames there
    are copies.)"""
    if "://" not in path:
        import shutil

        retired = path.rstrip("/") + ".__old__"
        shutil.rmtree(retired, ignore_errors=True)  # stale from a prior crash
        os.rename(path, retired)
        os.rename(staging, path)
        shutil.rmtree(retired, ignore_errors=True)
    else:  # pragma: no cover
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        retired = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".__old__")
        fs.rename(jvm.org.apache.hadoop.fs.Path(path), retired)
        fs.rename(jvm.org.apache.hadoop.fs.Path(staging), jvm.org.apache.hadoop.fs.Path(path))
        fs.delete(retired, True)


def _rm(spark: SparkSession, path: str) -> None:
    if "://" not in path:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    else:  # pragma: no cover
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jvm_path, True)
