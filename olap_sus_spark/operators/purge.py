"""Tombstone propagation — delete specific document/vector ids from the
corpus AND every maintained index (the "right to be forgotten" pass a
training-data platform must run, and the op the reference's replace-the-
whole-table ETL never needed).

The design rides the incremental-maintenance machinery that already
exists instead of adding a second one:

1. :func:`purge_table_ids` rewrites IN PLACE only the parquet part files
   that contain a tombstoned id (located by one ``input_file_name`` +
   broadcast semi-filter scan).  A rewrite keeps the file NAME and changes
   its size/mtime, so every index manifest (``index_store.corpus_files``)
   sees those files as *changed* — never *removed*.
2. The existing ``refresh_*_index`` calls then do exactly the right thing
   per index family: SRP/IVF/inverted re-sign ONLY the rewritten files'
   ``src=`` partitions (purge cost stays O(affected files), never
   O(corpus)); the near-dup cluster map — whose labels are global (a
   purged doc may be a cluster hub) — falls back to its safe full rebuild
   via its changed-files guard.

At 100 TB this is the standard GDPR flow: tombstones arrive in bounded
batches (a legal request, not a data stream), the scan that locates them
is a column-pruned id read, and each affected file rewrite is a
distributed filter + single-file write replaced atomically
(``os.replace``), so readers see the old or the new file, never a
partial.  A crash mid-batch leaves some files purged and some not; the
pass is idempotent — re-running converges.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MAX_TOMBSTONES = 100_000  # a purge batch is a legal request, not a stream
# Above this, an isin literal list bloats the Catalyst plan (and the pushed
# parquet filter) more than it saves — switch to a broadcast tombstone join.
_ISIN_LIMIT = 256


def _match(df, id_col: str, ids: list[int]):
    """id-membership predicate applied the scale-appropriate way: a pushed
    isin for small batches, a broadcast (semi) join for large ones."""
    if len(ids) <= _ISIN_LIMIT:
        return df.filter(F.col(id_col).isin(*ids))
    spark = df.sparkSession
    tomb = spark.createDataFrame([(i,) for i in ids], f"{id_col} long")
    return df.join(F.broadcast(tomb), id_col, "left_semi")


def _drop(df, id_col: str, ids: list[int]):
    if len(ids) <= _ISIN_LIMIT:
        return df.filter(~F.col(id_col).isin(*ids))
    spark = df.sparkSession
    tomb = spark.createDataFrame([(i,) for i in ids], f"{id_col} long")
    # reselect: the join moves the key column first, and the rewritten part
    # file must keep the table's physical column order
    return df.join(F.broadcast(tomb), id_col, "left_anti").select(*df.columns)


def affected_files(
    spark: SparkSession, sf_dir: str, table: str, id_col: str, ids: list[int]
) -> list[str]:
    """Local filesystem paths of the part files holding any tombstoned id —
    ONE column-pruned scan with the id filter pushed to the parquet reader.

    ``input_file_name()`` returns a URI: percent-escapes (spaces etc. in a
    corpus path) must be decoded before the path is handed to os-level
    read/replace, or the later rewrite would miss the file."""
    from urllib.parse import unquote

    from olap_sus_spark.catalog import load_table

    df = load_table(spark, sf_dir, table).select(
        id_col, F.input_file_name().alias("_f")
    )
    rows = _match(df, id_col, ids).select("_f").distinct().collect()
    return sorted(unquote(r["_f"].removeprefix("file:")) for r in rows)


def purge_table_ids(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    id_col: str,
    ids: list[int],
) -> int:
    """Remove ``ids`` from ``sf_dir/<table>.parquet`` by rewriting only the
    part files that contain them.  Returns the number of rows removed.
    File names are preserved (rewritten in place via an atomic
    ``os.replace``), so downstream index manifests classify the purge as
    *changed files* and their refreshes stay partition-scoped."""
    if not ids:
        return 0
    if len(ids) > _MAX_TOMBSTONES:
        raise ValueError(
            f"purge batch of {len(ids)} exceeds {_MAX_TOMBSTONES}; split it"
        )
    files = affected_files(spark, sf_dir, table, id_col, ids)
    removed = 0
    for path in files:
        src = spark.read.parquet(path)
        before = src.count()
        kept = _drop(src, id_col, ids)
        # one part file in, one part file out: write to a scratch dir,
        # then atomically replace the original (readers see old XOR new)
        scratch = os.path.join(
            tempfile.gettempdir(), f"purge_{uuid.uuid4().hex[:12]}"
        )
        kept.coalesce(1).write.mode("overwrite").parquet(scratch)
        part = next(
            os.path.join(scratch, f)
            for f in os.listdir(scratch)
            if f.endswith(".parquet")
        )
        after = spark.read.parquet(part).count()
        os.replace(part, path)
        # Hadoop's LocalFileSystem keeps a `.<name>.crc` sidecar keyed to
        # the OLD bytes; left in place it fails every future read of the
        # rewritten file with ChecksumException.
        crc = os.path.join(
            os.path.dirname(path), f".{os.path.basename(path)}.crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
        for leftover in os.listdir(scratch):
            os.remove(os.path.join(scratch, leftover))
        os.rmdir(scratch)
        removed += before - after
    return removed
