"""Maintained-index persistence machinery, shared by every index family
(ANN: SRP bucket / IVF assignment tables in operators/similarity.py;
near-dup: the cluster map in operators/dedup.py).

Real deployments build an index ONCE per corpus version and amortize it
over every query; only the probe sits on the serving path.  The contract
here:

- **Corpus-stamped keys** (:func:`corpus_stamp`): the index directory name
  hashes the corpus file identity (per part-file name/size/mtime) plus an
  algorithm version, so a changed corpus or a changed build algorithm
  silently invalidates instead of silently reusing.
- **Staged build + atomic promotion** (:func:`staging_path`,
  :func:`promote`): builds land in a per-process staging dir renamed into
  place in one atomic step — a crash mid-build can never leave a directory
  that existence-checks mistake for a complete index.
- **Never delete a live destination** (:func:`promote`): an existing
  destination can only exist via a completed rename, so the race loser
  discards its own (equivalent) staging copy rather than opening a
  reader-sees-no-index window.
- **Age-gated staging sweep** (:func:`sweep_stale_staging`): abandoned
  staging dirs from crashed builds are reaped only past an age threshold —
  a live build's staging is minutes old at most.
"""

from __future__ import annotations

import os


def index_root() -> str:
    import tempfile

    return os.environ.get(
        "SPARK_GRAFT_INDEX_DIR",
        os.path.join(tempfile.gettempdir(), "spark_graft_ann_index"),
    )


def corpus_files(sf_dir: str, table: str = "embeddings") -> dict[str, list[int]]:
    """Per-part-file identity of the corpus dataset:
    {file name: [size, mtime_ns]}.  This is the unit of incremental index
    maintenance — an append-only corpus grows by part files, and a refresh
    re-signs only the files whose identity changed since the last manifest.
    A single-file dataset is a one-entry manifest (any change to it IS a
    full-corpus change, so refresh correctly degenerates to rebuild)."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(src):
            return {
                e.name: [e.stat().st_size, e.stat().st_mtime_ns]
                for e in os.scandir(src)
                if e.is_file() and not e.name.startswith(("_", "."))
            }
        st = os.stat(src)
        return {os.path.basename(src): [st.st_size, st.st_mtime_ns]}
    except OSError:
        return {}


def corpus_file_paths(sf_dir: str, table: str, names: list[str]) -> list[str]:
    """Absolute paths of specific corpus part files (for a pruned re-read)."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(src):
        return [os.path.join(src, n) for n in sorted(names)]
    return [src]


def corpus_rows(sf_dir: str, table: str = "embeddings") -> int:
    """Exact corpus row count from Parquet footer metadata — O(#files)
    driver-side footer reads, no Spark scan.  Serving paths that size
    structures from N (auto_bits) must not pay a full-corpus count() action
    per cold call; at 100 TB this would come from the table catalog."""
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, f"{table}.parquet")
    files = (
        [e.path for e in os.scandir(src) if e.is_file() and e.name.endswith(".parquet")]
        if os.path.isdir(src)
        else [src]
    )
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def corpus_id_ranges(
    sf_dir: str, table: str, column: str, names: list[str] | None = None
) -> dict[str, list[int] | None]:
    """Per-part-file [min, max] of an integer id column, from Parquet
    footer column statistics — O(#files) driver-side footer reads, no
    Spark scan.  ``None`` for a file whose stats are absent/unusable
    (callers must treat that conservatively).  This is the cheap side of
    the doc-locality guard: disjoint per-file id ranges PROVE the id is
    unique across part files without touching row data."""
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, f"{table}.parquet")
    if names is None:
        names = sorted(corpus_files(sf_dir, table))
    out: dict[str, list[int] | None] = {}
    for name in names:
        fpath = os.path.join(src, name) if os.path.isdir(src) else src
        try:
            md = pq.ParquetFile(fpath).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[
                column
            ]
            if md.num_rows == 0:
                out[name] = [0, -1]  # empty interval: a 0-row file is vacuously safe
                continue
            lo = hi = None
            for rg in range(md.num_row_groups):
                if md.row_group(rg).num_rows == 0:
                    continue
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            out[name] = None if lo is None else [int(lo), int(hi)]
        except (OSError, KeyError, TypeError, ValueError):
            out[name] = None
    return out


def corpus_stamp(sf_dir: str, table: str = "embeddings") -> str:
    """Identity stamp of the corpus dataset, hashed from the per-file
    identities (:func:`corpus_files`) — a directory's own st_size/st_mtime
    don't reliably change when a part file is rewritten in place, so
    stat'ing the directory could silently reuse a stale index."""
    import hashlib

    files = corpus_files(sf_dir, table)
    if not files:
        return "na"
    return hashlib.md5(repr(sorted(files.items())).encode()).hexdigest()[:16]


_MANIFEST = "_corpus_manifest.json"


def read_manifest(path: str) -> dict | None:
    """Read an index table's corpus manifest (None = absent/unreadable).
    Shape: {"files": {name: [size, mtime_ns]}, ...extra keys per family}."""
    import json

    try:
        with open(os.path.join(path, _MANIFEST)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def write_manifest(path: str, manifest: dict) -> None:
    """Write the manifest atomically (rename) so a crash mid-write can
    never leave a truncated manifest that parses as a different corpus."""
    import json

    tmp = os.path.join(path, _MANIFEST + f".tmp{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))


def diff_files(
    old: dict[str, list[int]], new: dict[str, list[int]]
) -> tuple[list[str], list[str], list[str]]:
    """(added, changed, removed) part-file names between two manifests."""
    added = [n for n in new if n not in old]
    changed = [n for n in new if n in old and list(old[n]) != list(new[n])]
    removed = [n for n in old if n not in new]
    return added, changed, removed


# ---------------------------------------------------------------------------
# Manifest compaction: an append-only corpus at daily ingest grows the
# per-file manifest one row per ingested file FOREVER.  Once a file is fully
# signed into the index it almost never changes again, so old rows are
# rolled into sealed EPOCHS — each a sorted name list plus one hash over the
# members' identities.  The live ``files`` map stays bounded
# (≤ EPOCH_KEEP + one epoch of headroom); staleness and diff checks treat a
# sealed epoch as one unit: hash matches → all members unchanged (O(1) rows
# in the manifest), hash broken → every surviving member conservatively
# re-signed (O(epoch), still never O(corpus)).  Purge/RTBF rewrites of an
# old file therefore cost one epoch's re-sign instead of staying file-
# scoped — the deliberate trade for a bounded manifest.
# ---------------------------------------------------------------------------
EPOCH_KEEP = 64  # max loose per-file rows before sealing kicks in
EPOCH_SIZE = 64  # files rolled into one sealed epoch


def _epoch_hash(names: list[str], files: dict[str, list[int]]) -> str:
    import hashlib

    ident = [(n, list(files[n])) for n in sorted(names)]
    return hashlib.md5(repr(ident).encode()).hexdigest()[:16]


def compact_manifest(man: dict | None, current: dict[str, list[int]]) -> dict:
    """Build the ``{"files": ..., "epochs": ...}`` payload for ``current``:
    carry forward every sealed epoch still intact, re-loosen members of
    broken ones, then seal the oldest loose files (by mtime, then name)
    while more than EPOCH_KEEP remain.  Callers merge their extra keys on
    top.  A manifest without epochs reads/writes exactly as before."""
    epochs = []
    for e in (man or {}).get("epochs", []):
        try:
            if all(n in current for n in e["names"]) and _epoch_hash(
                e["names"], current
            ) == e.get("h"):
                epochs.append({"names": sorted(e["names"]), "h": e["h"]})
        except (TypeError, KeyError, AttributeError):
            # legacy / hand-edited epoch entry with an unexpected shape:
            # treat it as broken (members re-loosen) instead of raising out
            # of the compaction path
            continue
    covered = {n for e in epochs for n in e["names"]}
    loose = {n: list(v) for n, v in current.items() if n not in covered}
    order = sorted(  # oldest first; tolerate odd value shapes (sort last)
        loose,
        key=lambda n: (
            loose[n][1]
            if isinstance(loose[n], (list, tuple)) and len(loose[n]) > 1
            else float("inf"),
            n,
        ),
    )
    while len(loose) > EPOCH_KEEP:
        chunk = order[: min(EPOCH_SIZE, len(loose) - EPOCH_KEEP)]
        order = order[len(chunk):]
        epochs.append({"names": sorted(chunk), "h": _epoch_hash(chunk, current)})
        for n in chunk:
            del loose[n]
    # "epochs" is ALWAYS present (even empty) so ``{**man, **compacted}``
    # merges can never carry a stale epoch list forward
    return {"files": loose, "epochs": epochs}


def manifest_is_current(man: dict | None, current: dict[str, list[int]]) -> bool:
    """Epoch-aware staleness test: every sealed epoch intact AND the loose
    map exactly covers the remaining current files.  A manifest whose shape
    doesn't parse (legacy / hand-edited 'files' or 'epochs' values) is
    STALE, not an exception — same degrade-to-rebuild rule as unparseable
    JSON in :func:`read_manifest`."""
    if man is None:
        return False
    try:
        covered: set[str] = set()
        for e in man.get("epochs", []):
            if any(n not in current for n in e["names"]):
                return False
            if _epoch_hash(e["names"], current) != e.get("h"):
                return False
            covered.update(e["names"])
        loose_cur = {n: list(v) for n, v in current.items() if n not in covered}
        files = {n: list(v) for n, v in man.get("files", {}).items()}
        return files == loose_cur
    except (TypeError, KeyError, AttributeError):
        return False


def manifest_diff(
    man: dict, current: dict[str, list[int]]
) -> tuple[list[str], list[str], list[str]]:
    """Epoch-aware (added, changed, removed).  An intact epoch contributes
    nothing; a broken epoch's surviving members are conservatively
    ``changed`` (their individual old identities were compacted away) and
    its vanished members ``removed``."""
    covered: set[str] = set()
    changed_extra: list[str] = []
    removed_extra: list[str] = []
    for e in man.get("epochs", []):
        covered.update(e["names"])
        missing = [n for n in e["names"] if n not in current]
        if missing:
            removed_extra.extend(missing)
            changed_extra.extend(n for n in e["names"] if n in current)
        elif _epoch_hash(e["names"], current) != e.get("h"):
            changed_extra.extend(e["names"])
    loose_cur = {n: v for n, v in current.items() if n not in covered}
    a, c, r = diff_files(man.get("files", {}), loose_cur)
    return sorted(a), sorted(set(c) | set(changed_extra)), sorted(
        set(r) | set(removed_extra)
    )


def drop_src_partitions(component_root: str, srcs: set[str]) -> None:
    """Remove ``src=<name>`` partition directories for the given source
    part-file names.  Needed by the per-``src`` refresh paths: dynamic
    partition overwrite only rewrites partitions PRESENT in the output, so
    a stale source whose recomputed partial is EMPTY (e.g. an RTBF rewrite
    that purged every index-producing row of the file) would otherwise keep
    serving its old rows forever while the manifest reads current.  Names
    are matched through Spark's partition-path percent-escaping (escapes
    are UTF-8 byte sequences — %C3%A9 is one 'é', so decode with
    urllib.parse.unquote, never per-byte chr(), or multi-byte names
    mismatch and the stale partition is kept forever)."""
    import shutil
    from urllib.parse import unquote

    try:
        entries = list(os.scandir(component_root))
    except OSError:
        return
    for e in entries:
        if not (e.is_dir() and e.name.startswith("src=")):
            continue
        raw = e.name[len("src="):]
        try:
            value = unquote(raw, errors="strict")
        except UnicodeDecodeError:
            value = raw  # not a Spark escape sequence: match verbatim
        if value in srcs:
            shutil.rmtree(e.path, ignore_errors=True)


def compact_src_partitions(
    spark,
    component_root: str,
    target_files: int = 1,
    sort_cols: tuple[str, ...] = (),
) -> dict[str, int]:
    """Small-file compaction for ``src=``-partitioned index components:
    rewrite every partition holding more than ``target_files`` parquet
    files down to ``target_files`` (the refresh path writes up to 4 files
    per touched partition — sources/sinks.write_sorted_partitioned — so a
    long ingest chain accumulates ~4 files per corpus part file per
    component; the r10 steady-state probe measured ~15 files/ingest across
    the corpus-index fleet).  Run it on an operator's cadence (e.g. every
    K ingests); returns {partition name: files before} for what was
    rewritten.

    The corpus manifest tracks CORPUS files, not index files, so
    compaction is invisible to staleness and needs no re-stamp.  Staging
    lives OUTSIDE the component root (a sibling dir), so partition
    discovery on the live root never sees half-written copies; each
    partition is committed by the sinks retire→promote rename pair.  Same
    SINGLE-MAINTAINER assumption as the refresh paths (gramfreq/inverted
    docstrings): a concurrent reader can race one partition's rename
    window exactly as it can race a dynamic partition overwrite.  Rows are
    re-sorted on ``sort_cols`` so the compacted file keeps the range-
    sorted layout (footer min/max stay selective)."""
    import shutil

    from olap_sus_spark.sources.sinks import _swap_in

    out: dict[str, int] = {}
    try:
        entries = list(os.scandir(component_root))
    except OSError:
        return out
    stage_root = component_root.rstrip("/") + f".__compactstage__{os.getpid()}"
    for e in entries:
        if not (e.is_dir() and e.name.startswith("src=")):
            continue
        try:
            n = sum(1 for f in os.listdir(e.path) if f.endswith(".parquet"))
        except OSError:
            continue
        if n <= target_files:
            continue
        df = spark.read.parquet(e.path).coalesce(target_files)
        if sort_cols:
            df = df.sortWithinPartitions(*sort_cols)
        staging = os.path.join(stage_root, e.name)
        df.write.mode("overwrite").parquet(staging)
        _swap_in(spark, e.path, staging)
        out[e.name] = n
    shutil.rmtree(stage_root, ignore_errors=True)
    return out


def index_path(kind: str, key: str) -> str:
    """Deterministic index directory for (kind, logical key)."""
    import hashlib

    return os.path.join(
        index_root(), f"{kind}_{hashlib.md5(key.encode()).hexdigest()[:16]}"
    )


def staging_path(path: str) -> str:
    """Per-process unique staging dir: concurrent builders (bench + tests)
    must never write into each other's staging."""
    import uuid

    return f"{path}.__build__{os.getpid()}_{uuid.uuid4().hex[:8]}"


def sweep_stale_staging(max_age_sec: float = 3600.0) -> None:
    """Reap staging dirs abandoned by crashed builds.  A live build's
    staging is at most minutes old, so anything past ``max_age_sec`` is a
    leak; the rename-race loser already cleans its own copy up."""
    import shutil
    import time

    root = index_root()
    try:
        entries = list(os.scandir(root))
    except OSError:
        return
    cutoff = time.time() - max_age_sec
    for e in entries:
        if ".__build__" in e.name and e.is_dir():
            try:
                if e.stat().st_mtime < cutoff:
                    shutil.rmtree(e.path, ignore_errors=True)
            except OSError:
                pass


def promote(staging: str, path: str) -> None:
    """Commit a staged index build by rename (same crash-safety contract as
    sources/sinks._swap_in).  The destination is NEVER deleted: it can only
    exist via a completed atomic rename, so an existing destination means a
    concurrent builder won the race over the same corpus — deleting it would
    open a window where a reader finds no index at all.  The loser just
    discards its (equivalent) staging copy."""
    import shutil

    if os.path.exists(path):  # lost the race — keep the live index untouched
        shutil.rmtree(staging, ignore_errors=True)
        return
    try:
        os.rename(staging, path)
    except OSError:
        if os.path.exists(path):  # another builder promoted between check & rename
            shutil.rmtree(staging, ignore_errors=True)
        else:
            raise
