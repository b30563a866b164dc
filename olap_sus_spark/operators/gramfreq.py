"""Maintained cross-document gram-frequency index — the serving structure
behind ``dedup_cross_doc_scrub_served`` (queries/text_pipeline.py).

The exact-substring-dedup family (Lee et al. 2022) needs, per token
5-gram, the number of distinct documents containing it; the from-scratch
queries (``dedup_cross_doc_ngrams`` / ``dedup_cross_doc_scrub``) pay a
corpus-sized tokenize + hash + per-doc-distinct + global groupBy on every
call.  At 100 TB that global gram-frequency pass is a corpus-version-level
batch job, not a query — so it follows the same maintained-partials
contract as the KMV/CMS/histogram tables (operators/index_store.py:
corpus-manifest staleness, staged build + atomic promotion, per-``src``
dynamic-partition-overwrite refresh):

- ``grams/`` — per corpus part file: ``(src, gram, n_docs)`` where ``gram``
  is the 60-bit md5 hash of a sliding token 5-gram over the AUGMENTED view
  of that file's documents and ``n_docs`` the count of distinct docs in
  the file containing it.  The augmentation (queries/text_pipeline._augment)
  is row-local and every document lives wholly in one part file, so each
  partition is a pure function of its part file — a refresh of the
  ingested files is bit-identical to a full rebuild by construction.
- Serving folds the partials: global document frequency of a gram is the
  SUM of its per-src counts (``doc_id`` is the corpus primary key, unique
  across part files — the same assumption the cluster index's id-order
  guard rests on), and the scrub only needs the ``>= 2`` cut of that sum.

No counterpart in the reference (tabular-only pipeline).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.operators import index_store as ix
from olap_sus_spark.operators import text as tx

_ALGO_VERSION = "gramfreq-v1"
_SRC = "src"
NGRAM_N = 5  # must match queries/text_pipeline._CROSS_NGRAM_N

# Per-view doc_id offsets for the footer-stat doc-locality guard: a view
# maps one base row with id x to rows {x + o for o in offsets} (a subset —
# the guard only needs a superset of the produced ids).  "aug" must match
# queries/text_pipeline._augment (+1M for doc_id%7==0, +2M for %11==0) —
# pinned by tests/test_index_refresh.py.  Views not listed here can't be
# range-checked and take the exact Spark check on every rebuild.
_VIEW_OFFSETS: dict[str, tuple[int, ...]] = {
    "plain": (0,),
    "aug": (0, 1_000_000, 2_000_000),
    # eval-split view (queries/text_pipeline decontamination): keeps a
    # row iff doc_id % 97 == 0, ids unchanged — produced ids are a SUBSET
    # of {x + 0}, which is all the guard needs
    "eval97": (0,),
}
_DEGRADED_SRC = "__degraded__"


def gram_freq_path(sf_dir: str, table: str = "documents", view: str = "aug") -> str:
    """Index directory for one (corpus dir, table, CORPUS VIEW).  The view
    tag is part of the key: the registered queries gram the AUGMENTED view
    (synthetic duplicate injection the driver oracles are defined over)
    while the streaming ingest loop grams the PLAIN corpus — folding one
    view's partials into the other's query would be silently wrong, so the
    two views can never share a directory.  ``sf_dir`` is normalized with
    abspath (same as cluster_index_path) so relative vs absolute
    invocations of the same corpus hit the same index."""
    return ix.index_path(
        "gramfreq",
        f"{_ALGO_VERSION}|{os.path.abspath(sf_dir)}|{table}|{NGRAM_N}|{view}",
    )


def _view_of(docs_of, view: str | None) -> str:
    """Resolve the index-key view tag: the default ``docs_of`` is the
    augmented query view; a caller-supplied ``docs_of`` (streaming/purge —
    plain corpus) defaults to 'plain' unless the caller says otherwise."""
    return view if view is not None else ("aug" if docs_of is None else "plain")


def _with_src(df: DataFrame) -> DataFrame:
    # Evaluated at the scan, before any exchange (index_store contract).
    return df.withColumn(_SRC, F.element_at(F.split(F.input_file_name(), "/"), -1))


def _partials_frame(docs: DataFrame) -> DataFrame:
    """(src, gram, n_docs) for a documents frame in the caller's chosen
    corpus view: distinct docs per 60-bit-hashed sliding 5-gram, within
    src.  A frame without a ``src`` column (e.g. corpus_docs_of's
    full-corpus branch) gets tagged here — still at the scan, before any
    exchange, since nothing above this call shuffles.

    ``count_distinct(doc_id)`` (not ``count(1)``) so a doc_id duplicated
    across two ROWS of the same part file is counted once — intra-file
    duplicates are harmless by construction, and the doc-locality guard
    only has to prove CROSS-file uniqueness (footer-range disjointness).
    Shuffle cost is unchanged in the common case: after the per-row
    ``array_distinct``, (src, doc_id, gram) rows are already unique when
    doc_ids are, so the extra distinct level collapses nothing."""
    if _SRC not in docs.columns:
        docs = _with_src(docs)
    return (
        docs.select(
            _SRC,
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        tx.sliding_concat(tx.tokens(F.col("text")), NGRAM_N),
                        tx.md5_int,
                    )
                )
            ).alias("gram"),
        )
        .groupBy(_SRC, "gram")
        .agg(F.count_distinct(F.col("doc_id")).cast("bigint").alias("n_docs"))
    )


def _degraded_partials(docs: DataFrame) -> DataFrame:
    """Single-partition partials with the (doc_id, gram) pairs GLOBALLY
    deduplicated before counting — the correct distinct-document frequency
    when the doc-locality invariant is violated (a doc_id appearing in two
    part FILES would otherwise be double-counted by the per-src fold;
    intra-file duplicates are already handled by the per-src
    count_distinct).
    Loses incremental refresh (any corpus change → full rebuild) but keeps
    the served >=2 cut — and therefore the scrub twins — exact."""
    dg = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    tx.sliding_concat(tx.tokens(F.col("text")), NGRAM_N),
                    tx.md5_int,
                )
            )
        ).alias("gram"),
    ).distinct()
    return dg.groupBy("gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).select(F.lit(_DEGRADED_SRC).alias(_SRC), "gram", "n_docs")


def _expanded_intervals(
    ranges: dict[str, list[int] | None] | None, view: str
) -> list[tuple[int, int]] | None:
    """View-expanded per-file id intervals, or None when they can't prove
    anything (missing stats, unknown view, legacy manifest)."""
    offs = _VIEW_OFFSETS.get(view)
    if offs is None or not isinstance(ranges, dict):
        return None
    out: list[tuple[int, int]] = []
    for rng in ranges.values():
        if rng is None:
            return None
        lo, hi = int(rng[0]), int(rng[1])
        if lo > hi:  # empty file: vacuously safe
            continue
        out.extend((lo + o, hi + o) for o in offs)
    return out


def _intervals_disjoint(ivs: list[tuple[int, int]]) -> bool:
    ivs = sorted(ivs)
    return all(ivs[i][1] < ivs[i + 1][0] for i in range(len(ivs) - 1))


def _intervals_between_disjoint(
    a: list[tuple[int, int]], b: list[tuple[int, int]]
) -> bool:
    """No interval of ``a`` overlaps any interval of ``b`` (overlaps WITHIN
    each list are allowed — the refresh guard only needs batch-vs-old
    disjointness; old-vs-old overlaps were proven unique by the build's
    exact check, batch-internal duplicates by the refresh's O(batch)
    exact check)."""
    import bisect

    merged: list[tuple[int, int]] = []
    for lo, hi in sorted(b):
        if merged and lo <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    starts = [m[0] for m in merged]
    for lo, hi in a:
        i = bisect.bisect_right(starts, hi) - 1
        if i >= 0 and merged[i][1] >= lo:
            return False
    return True


def _augmented_docs_of(sf_dir: str):
    """Default ``docs_of``: the registered queries' AUGMENTED corpus view
    (queries/text_pipeline._augment — the synthetic duplicate injection the
    driver oracles are defined over).  Real corpora (e.g. the streaming
    ingest loop) pass a plain view instead — like the cluster index, the
    caller owns which corpus view an index path serves; the augmentation is
    row-local either way, so per-src purity (the refresh contract) holds
    for both."""
    from olap_sus_spark.catalog import load_table, spread_compute
    from olap_sus_spark.queries.text_pipeline import _augment

    def docs_of(spark: SparkSession, paths: list[str] | None) -> DataFrame:
        if paths is None:
            docs = _with_src(load_table(spark, sf_dir, "documents"))
        else:
            docs = _with_src(spark.read.parquet(*paths))
        return _augment(spread_compute(docs))

    return docs_of


def load_or_build_gram_freq(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    docs_of=None,
    view: str | None = None,
) -> DataFrame:
    """Return the ``(src, gram, n_docs)`` partials, building + persisting
    on first use.  A manifest mismatch triggers the safe full staged
    rebuild — never silently serves stale frequencies.

    The per-src fold is only exact under the DOC-LOCALITY INVARIANT
    (no doc_id spans two part files; duplicate rows WITHIN a file are
    harmless — the partials count distinct docs, r10).  Every rebuild
    verifies it at runtime: per-file doc_id [min,max] footer stats,
    view-expanded, pairwise disjoint → proven for free; otherwise one
    exact Spark check (distinct (src, doc_id) == distinct doc_id over
    the view); a genuine violation degrades to the
    single-partition globally-deduplicated build (``src=__degraded__``) —
    served frequencies stay correct, maintenance degrades to
    rebuild-on-change.  The verdict (ranges + degraded flag) is stamped
    into the manifest for the refresh-time guard."""
    view = _view_of(docs_of, view)
    docs_of = docs_of or _augmented_docs_of(sf_dir)
    path = gram_freq_path(sf_dir, table, view)
    current = ix.corpus_files(sf_dir, table)
    man = ix.read_manifest(path)
    if not ix.manifest_is_current(man, current):
        ix.sweep_stale_staging()
        os.makedirs(ix.index_root(), exist_ok=True)
        docs = docs_of(spark, None)
        ranges = ix.corpus_id_ranges(sf_dir, table, "doc_id")
        ivs = _expanded_intervals(ranges, view)
        degraded = False
        if ivs is None or not _intervals_disjoint(ivs):
            # exact cross-FILE check: the per-src fold (count_distinct
            # doc_id within src) is exact iff no doc_id lives in two part
            # files — intra-file duplicate rows are harmless, so distinct
            # (src, doc_id) tuples must equal distinct doc_ids
            d = docs if _SRC in docs.columns else _with_src(docs)
            n, nd = d.agg(
                F.count_distinct(F.col(_SRC), F.col("doc_id")),
                F.count_distinct(F.col("doc_id")),
            ).first()
            degraded = n != nd
        partials = _degraded_partials(docs) if degraded else _partials_frame(docs)
        staging = ix.staging_path(path)
        from olap_sus_spark.sources.sinks import write_sorted_partitioned

        write_sorted_partitioned(
            partials, os.path.join(staging, "grams"), _SRC, ["gram"], files=4,
            dynamic=False,
        )
        manifest = ix.compact_manifest(man, current)
        manifest["doc_ranges"] = ranges
        manifest["degraded"] = degraded
        ix.write_manifest(staging, manifest)
        _retire_and_promote(staging, path, current)
    return _serve(spark, path)


def refresh_gram_freq(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    docs_of=None,
    view: str | None = None,
) -> DataFrame:
    """Incremental maintenance: re-gram ONLY the part files added or
    rewritten since the last manifest and dynamic-partition-overwrite
    their ``src=`` partitions — O(ingested files), never O(corpus).
    Removed part files (or a never-built index) fall back to the full
    staged build.

    A rewritten (changed) source whose re-gram yields ZERO rows — e.g. an
    RTBF rewrite that purged every >=5-token doc of the file — is not
    reachable by dynamic overwrite (no partition in the output), so its
    old ``src=`` partition is dropped explicitly before the manifest is
    stamped; the partials are persisted across write+probe so the stale
    files are grammed exactly once.

    SINGLE REFRESHER ASSUMED per index directory: like inverted.py, the
    refresh dynamic-overwrites live ``src=`` partitions in place, so two
    concurrent refreshes of the SAME corpus+view can interleave clear/
    commit phases inside one partition.  Both in-repo callers satisfy
    this: the streaming ingest loop is serialized per checkpoint by
    Structured Streaming itself, and the query path only ever
    load_or_builds (staged + atomic promote, race-safe).  Concurrent
    refresh+build / build+build stay safe via _retire_and_promote."""
    view = _view_of(docs_of, view)
    docs_of = docs_of or _augmented_docs_of(sf_dir)
    path = gram_freq_path(sf_dir, table, view)
    current = ix.corpus_files(sf_dir, table)
    man = ix.read_manifest(path)
    if man is None:
        return load_or_build_gram_freq(spark, sf_dir, table, docs_of, view)
    added, changed, removed = ix.manifest_diff(man, current)
    if removed or man.get("degraded"):
        # shrunk corpus, or an index already in degraded (non-per-src)
        # mode: per-partition overwrite can't express either — rebuild
        return load_or_build_gram_freq(spark, sf_dir, table, docs_of, view)
    stale = sorted(added + changed)
    if stale:
        # doc-locality guard, refresh side (two cheap halves):
        #  (a) batch-vs-old: the stale files' view-expanded footer ranges
        #      must not overlap the non-stale signed files' — old-vs-old
        #      overlaps are FINE (the build's exact check proved them
        #      unique; staged corpora routinely interleave ids across
        #      files, and re-proving global pairwise disjointness here
        #      forced a full rebuild on every ingest — r9 probe);
        #  (b) batch-internal: one O(batch) cross-file check over the
        #      stale files' view — distinct (src, doc_id) == distinct
        #      doc_id (intra-file duplicate rows are harmless since the
        #      partials count distinct docs, r10).
        # Anything unprovable (missing stats/ranges, overlap, duplicate)
        # falls back to the full staged rebuild, whose exact corpus-wide
        # check decides per-src vs degraded.
        stale_set = set(stale)
        old_ranges = man.get("doc_ranges")
        new_ranges = ix.corpus_id_ranges(sf_dir, table, "doc_id", stale)
        guard_ok = False
        if isinstance(old_ranges, dict):
            old_only = {
                n: r
                for n, r in old_ranges.items()
                if n in current and n not in stale_set
            }
            if set(old_only) == {n for n in current if n not in stale_set}:
                old_ivs = _expanded_intervals(old_only, view)
                new_ivs = _expanded_intervals(new_ranges, view)
                guard_ok = (
                    old_ivs is not None
                    and new_ivs is not None
                    and _intervals_between_disjoint(new_ivs, old_ivs)
                )
        if not guard_ok:
            return load_or_build_gram_freq(spark, sf_dir, table, docs_of, view)
        paths = ix.corpus_file_paths(sf_dir, table, stale)
        batch = docs_of(spark, paths)
        b = batch if _SRC in batch.columns else _with_src(batch)
        n, ndist = b.agg(
            F.count_distinct(F.col(_SRC), F.col("doc_id")),
            F.count_distinct(F.col("doc_id")),
        ).first()
        if n != ndist:
            return load_or_build_gram_freq(spark, sf_dir, table, docs_of, view)
        ranges = {
            **{k: v for k, v in old_ranges.items() if k in current},
            **new_ranges,
        }
        partials = _partials_frame(batch).persist()
        from olap_sus_spark.sources.sinks import write_sorted_partitioned

        try:
            write_sorted_partitioned(
                partials, os.path.join(path, "grams"), _SRC, ["gram"], files=4,
                dynamic=True,
            )
            written = {r[0] for r in partials.select(_SRC).distinct().collect()}
        finally:
            partials.unpersist()
        orphaned = set(stale) - written
        if orphaned:
            ix.drop_src_partitions(os.path.join(path, "grams"), orphaned)
        manifest = ix.compact_manifest(man, current)
        manifest["doc_ranges"] = ranges
        manifest["degraded"] = False
        ix.write_manifest(path, manifest)
    return _serve(spark, path)


def shared_grams(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    docs_of=None,
    view: str | None = None,
) -> DataFrame:
    """Grams contained in >= 2 distinct documents corpus-wide, served from
    the maintained partials: one fold over the index table, zero corpus
    work."""
    return (
        load_or_build_gram_freq(spark, sf_dir, table, docs_of, view)
        .groupBy("gram")
        .agg(F.sum("n_docs").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("gram")
    )


# ---------------------------------------------------------------------------
# Second-level maintained rollup (r9): the global (gram, n_docs) fold —
# and its >=2 serving cut — as a persisted table of their own, so serving
# paths stop re-folding every per-src partial per call.  At 100× corpus
# the fold is a ~45M-row exchange+hash-agg inside EVERY scrub/stats serve;
# the rollup moves that cost to ingest time: an APPEND-only refresh merges
# the old rollup with just the appended files' partials (read back from
# the partials index with src= partition pruning — the corpus is never
# re-grammed), rewrites the rollup dir staged + atomically promoted, and
# serving becomes a plain pruned scan of the cut with zero shuffle.
# Non-append changes (RTBF rewrites, removals) and degraded-mode partials
# re-fold from the partials index — still never O(corpus) text work.
# ---------------------------------------------------------------------------
def rollup_path(sf_dir: str, table: str = "documents", view: str = "aug") -> str:
    return ix.index_path(
        "gramrollup",
        f"{_ALGO_VERSION}|{os.path.abspath(sf_dir)}|{table}|{NGRAM_N}|{view}",
    )


def _write_rollup_tables(rolled: DataFrame, root: str) -> None:
    from olap_sus_spark.sources.sinks import write_sorted

    rolled = rolled.persist()
    try:
        write_sorted(rolled, os.path.join(root, "rollup"), ["gram"], files=4)
        write_sorted(
            rolled.filter(F.col("n_docs") >= 2).select("gram"),
            os.path.join(root, "cut"),
            ["gram"],
            files=4,
        )
    finally:
        rolled.unpersist()


def load_or_build_gram_rollup(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    docs_of=None,
    view: str | None = None,
) -> DataFrame:
    """Global ``(gram, n_docs)``, building by folding the (fresh) partials
    on first use / staleness.  Inherits the partials' degraded flag so a
    doc-locality violation keeps forcing re-folds instead of merges."""
    view = _view_of(docs_of, view)
    path = rollup_path(sf_dir, table, view)
    current = ix.corpus_files(sf_dir, table)
    man = ix.read_manifest(path)
    if not ix.manifest_is_current(man, current):
        partials = load_or_build_gram_freq(spark, sf_dir, table, docs_of, view)
        gman = ix.read_manifest(gram_freq_path(sf_dir, table, view)) or {}
        rolled = partials.groupBy("gram").agg(
            F.sum("n_docs").cast("bigint").alias("n_docs")
        )
        ix.sweep_stale_staging()
        os.makedirs(ix.index_root(), exist_ok=True)
        staging = ix.staging_path(path)
        _write_rollup_tables(rolled, staging)
        manifest = ix.compact_manifest(man, current)
        manifest["degraded"] = bool(gman.get("degraded"))
        manifest["levels"] = []  # a fresh sorted base carries no deltas
        ix.write_manifest(staging, manifest)
        _retire_and_promote(staging, path, current, components=("rollup", "cut"))
    return _serve_rollup(spark, path)


# --- LSM delta levels for the rollup/cut (r10, VERDICT r09 #4) ------------
# The r9 refresh rewrote the WHOLE sorted rollup+cut per ingest (~2 s I/O
# floor of the 14.5 s no-flip refresh at 100×).  Grams are 60-bit hashes —
# uniformly distributed — so range-partitioned partial rewrites can't
# localize a delta (every ingest would touch every range); the LSM shape
# is the one that works: the base rollup/cut stay immutable, each refresh
# appends one bounded DELTA level, and serving overlays the folded levels
# onto the base with broadcast joins (base stays SCAN-ONLY, zero base
# exchange).  Levels are listed in the manifest ("levels"); unlisted dirs
# are crash orphans, ignored and GC'd.  At _ROLLUP_MAX_LEVELS the refresh
# folds everything back into a fresh sorted base (the old full-rewrite
# path) — bounded level count, amortized rewrite.
#   rdelta/<name>: (gram, d)   net per-gram count delta of one refresh
#   cdelta/<name>: (gram, op)  >=2-cut crossings, op=+1 enter / -1 leave;
#                  crossings strictly alternate per gram, so the folded
#                  SUM(op) ∈ {-1,0,+1} is exactly the state flip vs base.
_ROLLUP_MAX_LEVELS = 8


def _levels_of(man: dict | None) -> list[str]:
    lv = (man or {}).get("levels")
    return list(lv) if isinstance(lv, list) else []


def _gc_orphan_levels(path: str, keep: list[str]) -> None:
    import shutil

    for comp in ("rdelta", "cdelta"):
        root = os.path.join(path, comp)
        try:
            entries = list(os.scandir(root))
        except OSError:
            continue
        for e in entries:
            if e.is_dir() and e.name not in keep:
                shutil.rmtree(e.path, ignore_errors=True)


def _write_level(df: DataFrame, path: str, comp: str, name: str) -> None:
    """Stage + rename one delta level (same-fs rename = atomic publish;
    the manifest lists the level only after the rename succeeded)."""
    root = os.path.join(path, comp)
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f".tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.rename(tmp, os.path.join(root, name))


def _read_levels(spark: SparkSession, path: str, comp: str, names: list[str]):
    return spark.read.parquet(
        *[os.path.join(path, comp, n) for n in names]
    )


def _merged_rollup(spark: SparkSession, path: str, man: dict | None) -> DataFrame:
    """Base rollup overlaid with the manifest's delta levels.  The base is
    the only corpus-sized table and it is never exchanged: the folded
    deltas (bounded by levels × ingest size) broadcast onto it, brand-new
    grams come from the tiny delta⟕hit anti-join, and grams folded to zero
    drop out."""
    base = _serve_component(
        spark, path, "rollup", "gram bigint, n_docs bigint"
    ).select(
        F.col("gram").cast("bigint").alias("gram"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
    )
    levels = _levels_of(man)
    if not levels:
        return base
    dfold = (
        _read_levels(spark, path, "rdelta", levels)
        .groupBy("gram")
        .agg(F.sum("d").cast("bigint").alias("d"))
    )
    updated = base.join(F.broadcast(dfold), "gram", "left").select(
        "gram",
        (F.col("n_docs") + F.coalesce(F.col("d"), F.lit(0)))
        .cast("bigint")
        .alias("n_docs"),
    )
    old_hit = base.join(F.broadcast(dfold.select("gram")), "gram", "left_semi")
    fresh = dfold.join(old_hit, "gram", "left_anti").select(
        "gram", F.col("d").cast("bigint").alias("n_docs")
    )
    return updated.unionByName(fresh).filter(F.col("n_docs") > 0)


def _merged_cut(spark: SparkSession, path: str, man: dict | None) -> DataFrame:
    base = _serve_component(spark, path, "cut", "gram bigint").select(
        F.col("gram").cast("bigint").alias("gram")
    )
    levels = _levels_of(man)
    if not levels:
        return base
    net = (
        _read_levels(spark, path, "cdelta", levels)
        .groupBy("gram")
        .agg(F.sum("op").cast("int").alias("net"))
    )
    dels = net.filter(F.col("net") < 0).select("gram")
    adds = net.filter(F.col("net") > 0).select("gram")
    return base.join(F.broadcast(dels), "gram", "left_anti").unionByName(adds)


def _manifests_aligned(a: dict | None, b: dict | None) -> bool:
    """True when two index manifests were stamped from the SAME corpus
    snapshot (files + epochs bit-identical).  The changed-file delta merges
    need the partials' OLD per-src values; if the partials index was
    refreshed independently past this index's snapshot those values are
    already overwritten — the caller must re-fold instead."""
    if a is None or b is None:
        return False
    return a.get("files") == b.get("files") and a.get("epochs") == b.get("epochs")


def _capture_partials(spark: SparkSession, gpath: str, srcs: list[str]) -> str:
    """Materialize the CURRENT (pre-refresh) partials of specific srcs to a
    temp parquet — O(changed files), partition-pruned — so delta merges can
    subtract them after the refresh overwrites the live partitions."""
    import tempfile

    tmp = tempfile.mkdtemp(prefix="spark_graft_gram_olddelta_")
    (
        spark.read.parquet(os.path.join(gpath, "grams"))
        .filter(F.col(_SRC).isin(sorted(srcs)))
        .select("gram", F.col("n_docs").cast("bigint").alias("n_docs"))
        .write.mode("overwrite")
        .parquet(tmp)
    )
    return tmp


def refresh_gram_rollup(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    docs_of=None,
    view: str | None = None,
) -> DataFrame:
    """Keep partials AND rollup fresh after an ingest or an RTBF rewrite.
    Appends contribute ``appended srcs' partials``; CHANGED files (purge
    rewrites keep their names) contribute ``new partials − captured old
    partials`` of just those srcs — both O(ingest/affected), no corpus
    re-gram, no full re-fold (r9).  The net delta lands as ONE bounded LSM
    level (r10): the sorted base rollup/cut are untouched, serving overlays
    the folded levels by broadcast, and the full sorted rewrite runs only
    at the ``_ROLLUP_MAX_LEVELS`` fold (or for backfill-sized deltas) —
    the per-ingest base rewrite the r9 probe measured as the refresh floor
    is amortized 1-in-8.  Removals, degraded mode, and a partials index
    refreshed past this rollup's snapshot (old per-src values already
    overwritten) re-fold from the refreshed partials.  Same
    single-refresher assumption as :func:`refresh_gram_freq`."""
    import shutil

    view = _view_of(docs_of, view)
    path = rollup_path(sf_dir, table, view)
    gpath = gram_freq_path(sf_dir, table, view)
    current = ix.corpus_files(sf_dir, table)
    man = ix.read_manifest(path)
    if man is None or man.get("degraded"):
        refresh_gram_freq(spark, sf_dir, table, docs_of, view)
        return load_or_build_gram_rollup(spark, sf_dir, table, docs_of, view)
    added, changed, removed = ix.manifest_diff(man, current)
    if removed:
        refresh_gram_freq(spark, sf_dir, table, docs_of, view)
        return load_or_build_gram_rollup(spark, sf_dir, table, docs_of, view)
    old_delta_tmp = None
    if changed:
        if not _manifests_aligned(man, ix.read_manifest(gpath)):
            refresh_gram_freq(spark, sf_dir, table, docs_of, view)
            return load_or_build_gram_rollup(spark, sf_dir, table, docs_of, view)
        old_delta_tmp = _capture_partials(spark, gpath, changed)
    try:
        refresh_gram_freq(spark, sf_dir, table, docs_of, view)
        if (ix.read_manifest(gpath) or {}).get("degraded"):
            return load_or_build_gram_rollup(spark, sf_dir, table, docs_of, view)
        stale = sorted(added + changed)
        if stale:
            import uuid

            delta = (
                spark.read.parquet(os.path.join(gpath, "grams"))
                .filter(F.col(_SRC).isin(stale))
                .select("gram", F.col("n_docs").cast("bigint").alias("n_docs"))
            )
            if old_delta_tmp is not None:
                neg = spark.read.parquet(old_delta_tmp).select(
                    "gram", (-F.col("n_docs")).cast("bigint").alias("n_docs")
                )
                delta = delta.unionByName(neg)
            # net per-gram delta is bounded by the stale files' gram count —
            # small for a daily ingest/purge; zero-net grams (a rewrite
            # that re-grammed identically) drop out entirely
            dd = (
                delta.groupBy("gram")
                .agg(F.sum("n_docs").cast("bigint").alias("d"))
                .filter(F.col("d") != 0)
                .persist()
            )
            levels = _levels_of(man)
            try:
                n_dd = dd.count()
                if n_dd == 0:
                    # net no-op (a rewrite re-grammed identically): stamp
                    # the manifest current, no level, no rewrite
                    manifest = ix.compact_manifest(man, current)
                    manifest["degraded"] = False
                    manifest["levels"] = levels
                    ix.write_manifest(path, manifest)
                    return _serve_rollup(spark, path)
                small = n_dd <= 1_000_000
                if small and len(levels) < _ROLLUP_MAX_LEVELS:
                    # LSM fast path (r10): append ONE bounded delta level —
                    # the base rollup/cut are not rewritten at all.  The
                    # only base-sized work is one scan-only broadcast-semi
                    # to fetch the dd grams' old base counts for the cut-
                    # crossing computation; everything written is O(dd).
                    name = f"L{len(levels):03d}_{uuid.uuid4().hex[:8]}"
                    base = _serve_component(
                        spark, path, "rollup", "gram bigint, n_docs bigint"
                    ).select(
                        F.col("gram").cast("bigint").alias("gram"),
                        F.col("n_docs").cast("bigint").alias("n_docs"),
                    )
                    parts = [
                        base.join(
                            F.broadcast(dd.select("gram")), "gram", "left_semi"
                        ).select("gram", F.col("n_docs").alias("v"))
                    ]
                    if levels:
                        parts.append(
                            _read_levels(spark, path, "rdelta", levels)
                            .join(
                                F.broadcast(dd.select("gram")),
                                "gram",
                                "left_semi",
                            )
                            .select("gram", F.col("d").cast("bigint").alias("v"))
                        )
                    old_tot = parts[0]
                    for p in parts[1:]:
                        old_tot = old_tot.unionByName(p)
                    old_tot = old_tot.groupBy("gram").agg(
                        F.sum("v").cast("bigint").alias("old_n")
                    )
                    x = (
                        dd.join(old_tot, "gram", "left")
                        .select(
                            "gram",
                            "d",
                            F.coalesce(F.col("old_n"), F.lit(0))
                            .cast("bigint")
                            .alias("old_n"),
                        )
                        .withColumn("new_n", F.col("old_n") + F.col("d"))
                    )
                    cut_delta = x.filter(
                        ((F.col("old_n") < 2) & (F.col("new_n") >= 2))
                        | ((F.col("old_n") >= 2) & (F.col("new_n") < 2))
                    ).select(
                        "gram",
                        F.when(F.col("new_n") >= 2, F.lit(1))
                        .otherwise(F.lit(-1))
                        .cast("int")
                        .alias("op"),
                    )
                    _write_level(
                        dd.select("gram", F.col("d").cast("bigint").alias("d")),
                        path,
                        "rdelta",
                        name,
                    )
                    _write_level(cut_delta, path, "cdelta", name)
                    manifest = ix.compact_manifest(man, current)
                    manifest["degraded"] = False
                    manifest["levels"] = levels + [name]
                    ix.write_manifest(path, manifest)
                    _gc_orphan_levels(path, manifest["levels"])
                else:
                    # fold (level cap reached, or a backfill-sized delta):
                    # base + all levels + dd -> a fresh sorted base with no
                    # deltas.  When dd broadcasts, the merge keeps the old
                    # base SCAN-ONLY (BHJ update + tiny anti for brand-new
                    # grams); the remaining big shuffle is the sorted
                    # rewrite itself — now paid once per _ROLLUP_MAX_LEVELS
                    # refreshes instead of every refresh.
                    old = _merged_rollup(spark, path, man)
                    if small:
                        updated = old.join(F.broadcast(dd), "gram", "left").select(
                            "gram",
                            (F.col("n_docs") + F.coalesce(F.col("d"), F.lit(0)))
                            .cast("bigint")
                            .alias("n_docs"),
                        )
                        old_hit = old.join(
                            F.broadcast(dd.select("gram")), "gram", "left_semi"
                        )
                        fresh = dd.join(old_hit, "gram", "left_anti").select(
                            "gram", F.col("d").cast("bigint").alias("n_docs")
                        )
                        merged = updated.unionByName(fresh).filter(
                            F.col("n_docs") > 0
                        )
                    else:
                        merged = (
                            old.unionByName(
                                dd.select("gram", F.col("d").alias("n_docs"))
                            )
                            .groupBy("gram")
                            .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
                            .filter(F.col("n_docs") > 0)
                        )
                    staging = ix.staging_path(path)
                    _write_rollup_tables(merged, staging)
                    manifest = ix.compact_manifest(man, current)
                    manifest["degraded"] = False
                    manifest["levels"] = []
                    ix.write_manifest(staging, manifest)
                    # the merge read the OLD rollup: promote must replace it
                    # even though it exists — retire-then-promote, never skip
                    _retire_and_promote(
                        staging, path, None, components=("rollup", "cut")
                    )
            finally:
                dd.unpersist()
        return _serve_rollup(spark, path)
    finally:
        if old_delta_tmp is not None:
            shutil.rmtree(old_delta_tmp, ignore_errors=True)


def shared_grams_cut(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    docs_of=None,
    view: str | None = None,
) -> DataFrame:
    """The >=2 cut served from the maintained ROLLUP — a plain sorted scan
    of the base cut plus a broadcast overlay of the (bounded) crossing
    levels, zero base exchange (the scale serving path;
    :func:`shared_grams` remains the fold-the-partials fallback)."""
    view = _view_of(docs_of, view)
    load_or_build_gram_rollup(spark, sf_dir, table, docs_of, view)
    path = rollup_path(sf_dir, table, view)
    return _merged_cut(spark, path, ix.read_manifest(path))


# ---------------------------------------------------------------------------
# Ingest-incremental scrub (r9): the exact-substring scrub OUTPUT itself as
# a maintained per-src table, closing the family's last corpus-sized
# serving term.  dedup_cross_doc_scrub_served still re-scrubs the whole
# corpus per call (only its frequency pass is served); the production
# shape at 100 TB is scrub-on-ingest — per batch, scrub ONLY:
#
#   1. the newly ingested part files, and
#   2. the old part files RETROACTIVELY affected by the ingest: a new doc
#      can flip an old doc's gram from unique to shared (n_docs 1 -> >=2),
#      invalidating that old doc's previously emitted scrub.  Flipped
#      grams are computed without any pre-refresh snapshot:
#      new_total >= 2 AND new_total - delta <= 1 (delta = the appended
#      srcs' partials, re-readable from the partials index any time),
#      and the affected srcs are the partials' srcs containing a flipped
#      gram — index work only, never corpus work.
#
# Each src= scrub partition is a pure function of (that part file, the
# GLOBAL >=2 cut), so untouched partitions stay exact by construction.
# Non-append changes (RTBF rewrites, removals) and degraded-mode partials
# fall back to the full staged rebuild — correct first, incremental where
# the invariants allow.  No counterpart in the reference.
# ---------------------------------------------------------------------------
def scrub_path(sf_dir: str, table: str = "documents", view: str = "aug") -> str:
    return ix.index_path(
        "gramscrub",
        f"{_ALGO_VERSION}|{os.path.abspath(sf_dir)}|{table}|{NGRAM_N}|{view}",
    )


def scrub_assemble(toks: DataFrame, covered_pos: DataFrame, extra=()) -> DataFrame:
    """Shared scrub assembly (r10): ``toks`` = (..extra.., doc_id, t) with
    the token array staged; ``covered_pos`` = (doc_id, cpos) rows of
    1-based covered token positions (duplicates fine — collect_set dedups).
    Returns one row per doc: (..extra.., doc_id, n_tokens, n_removed,
    scrubbed_text).

    Replaces the tokpos-explode → anti-join → collect_list + order-
    restoring-sort reassembly: covered positions (two ints per row) are the
    only rows that cross an exchange — the token strings never shuffle —
    and the per-doc reassembly is a narrow map.  Bit-identical output:
    array_except preserves the (ascending) order of its left operand, so
    kept positions come out sorted and each kept token is re-read in place
    with element_at (1-based, and every position is ≤ size(t) by
    construction, so ANSI cannot throw)."""
    cov = covered_pos.groupBy("doc_id").agg(F.collect_set("cpos").alias("_cov"))
    empty = F.array().cast("array<int>")
    # sequence(1, 0) silently turns DESCENDING under ANSI (CLAUDE.md) —
    # guard the zero-token docs explicitly.
    allpos = F.when(F.size("t") > 0, F.sequence(F.lit(1), F.size("t"))).otherwise(empty)
    staged = toks.join(cov, "doc_id", "left").select(
        *extra,
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.array_except(allpos, F.coalesce(F.col("_cov"), empty)).alias("_kept"),
        "t",
    )
    return staged.select(
        *extra,
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.size("_kept")).cast("int").alias("n_removed"),
        F.array_join(
            F.transform(F.col("_kept"), lambda p: F.element_at(F.col("t"), p)), " "
        ).alias("scrubbed_text"),
    )


def _scrub_frame(docs: DataFrame, shared: DataFrame, src_col=None) -> DataFrame:
    """Exact-substring scrub of ``docs`` against the ``shared`` gram cut:
    (src, doc_id, n_tokens, n_removed, scrubbed_text), token positions
    1-based (same semantics as queries/text_pipeline.dedup_cross_doc_scrub,
    whose oracle the maintained table shares).  ``src_col`` overrides the
    provenance column (degraded mode writes one pseudo-partition)."""
    n = NGRAM_N
    if src_col is None and _SRC not in docs.columns:
        docs = _with_src(docs)
    src = F.lit(src_col) if src_col is not None else F.col(_SRC)
    toks = docs.select(
        src.alias(_SRC), "doc_id", tx.tokens(F.col("text")).alias("t")
    )
    grams = (
        toks.select(
            "doc_id",
            F.posexplode(
                F.transform(tx.sliding_concat(F.col("t"), n), tx.md5_int)
            ).alias("pos0", "gram"),
        )
        .withColumn("pos", F.col("pos0") + 1)
        .drop("pos0")
    )
    covered = grams.join(shared, "gram").select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("cpos"),
    )
    return scrub_assemble(toks, covered, extra=(_SRC,))


def _write_scrub(frame: DataFrame, root: str, dynamic: bool) -> None:
    from olap_sus_spark.sources.sinks import write_sorted_partitioned

    write_sorted_partitioned(
        frame, os.path.join(root, "docs"), _SRC, ["doc_id"], files=4,
        dynamic=dynamic,
    )


def load_or_build_gram_scrub(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    docs_of=None,
    view: str | None = None,
) -> DataFrame:
    """The maintained scrub table, full staged build on first use /
    staleness: partials + rollup brought current first, then every part
    file scrubbed against the global cut.  Degraded partials (doc-locality
    violation) scrub the whole view in ONE pass under ``src=__degraded__``
    — identical semantics to the from-scratch query, which groups kept
    tokens by doc_id corpus-wide."""
    view = _view_of(docs_of, view)
    docs_of_r = docs_of or _augmented_docs_of(sf_dir)
    path = scrub_path(sf_dir, table, view)
    current = ix.corpus_files(sf_dir, table)
    man = ix.read_manifest(path)
    if not ix.manifest_is_current(man, current):
        load_or_build_gram_rollup(spark, sf_dir, table, docs_of, view)
        degraded = bool(
            (ix.read_manifest(gram_freq_path(sf_dir, table, view)) or {}).get(
                "degraded"
            )
        )
        shared = shared_grams_cut(spark, sf_dir, table, docs_of, view)
        docs = docs_of_r(spark, None)
        frame = _scrub_frame(
            docs, shared, src_col=_DEGRADED_SRC if degraded else None
        )
        ix.sweep_stale_staging()
        os.makedirs(ix.index_root(), exist_ok=True)
        staging = ix.staging_path(path)
        _write_scrub(frame, staging, dynamic=False)
        manifest = ix.compact_manifest(man, current)
        manifest["degraded"] = degraded
        ix.write_manifest(staging, manifest)
        _retire_and_promote(staging, path, current, components=("docs",))
    return _serve_scrub(spark, path)


def refresh_gram_scrub(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    docs_of=None,
    view: str | None = None,
) -> DataFrame:
    """Scrub-on-ingest AND scrub-on-purge: bring partials + rollup current,
    then rewrite ONLY the scrub partitions of (added ∪ changed srcs) ∪
    (old srcs retroactively hit by a shared-status flip).  Flips go BOTH
    ways (r9): an append can turn a gram unique→shared (old docs need
    scrubbing), an RTBF rewrite can turn it shared→unique (surviving docs
    get their tokens BACK).  Per gram, old_total = new_total − new_delta +
    old_delta over the stale srcs — snapshot-free except the O(changed)
    old-partials capture.  Removals, degraded mode, and misaligned
    manifests fall back to the full staged rebuild.  Same single-refresher
    assumption as :func:`refresh_gram_freq`."""
    import shutil

    view = _view_of(docs_of, view)
    docs_of_r = docs_of or _augmented_docs_of(sf_dir)
    path = scrub_path(sf_dir, table, view)
    gpath = gram_freq_path(sf_dir, table, view)
    current = ix.corpus_files(sf_dir, table)
    man = ix.read_manifest(path)
    if man is None or man.get("degraded"):
        return load_or_build_gram_scrub(spark, sf_dir, table, docs_of, view)
    added, changed, removed = ix.manifest_diff(man, current)
    if removed:
        return load_or_build_gram_scrub(spark, sf_dir, table, docs_of, view)
    stale = sorted(added + changed)
    if not stale:
        return _serve_scrub(spark, path)
    old_delta_tmp = None
    if changed:
        if not _manifests_aligned(man, ix.read_manifest(gpath)):
            return load_or_build_gram_scrub(spark, sf_dir, table, docs_of, view)
        old_delta_tmp = _capture_partials(spark, gpath, changed)
    try:
        rollup = refresh_gram_rollup(spark, sf_dir, table, docs_of, view)
        if (ix.read_manifest(gpath) or {}).get("degraded"):
            return load_or_build_gram_scrub(spark, sf_dir, table, docs_of, view)
        partials = spark.read.parquet(os.path.join(gpath, "grams"))
        nd = (
            partials.filter(F.col(_SRC).isin(stale))
            .groupBy("gram")
            .agg(F.sum("n_docs").cast("bigint").alias("nd"))
        )
        if old_delta_tmp is not None:
            od = (
                spark.read.parquet(old_delta_tmp)
                .groupBy("gram")
                .agg(F.sum("n_docs").cast("bigint").alias("od"))
            )
            cand = nd.join(od, "gram", "full")
        else:
            cand = nd.withColumn("od", F.lit(None).cast("bigint"))
        # candidate grams are bounded by the stale files' gram count; keep
        # the big rollup SCAN-ONLY: broadcast-semi it down to the
        # candidates, then join the two small sides (vs an SMJ that would
        # exchange the whole rollup per refresh)
        cand = cand.persist()
        try:
            small = cand.count() <= 1_000_000
            small_rollup = (
                rollup.join(F.broadcast(cand.select("gram")), "gram", "left_semi")
                if small
                else rollup
            )
            j = cand.join(small_rollup, "gram", "left")
            new_total = F.coalesce(F.col("n_docs"), F.lit(0))
            old_total = (
                new_total - F.coalesce(F.col("nd"), F.lit(0))
                + F.coalesce(F.col("od"), F.lit(0))
            )
            flipped = j.filter(
                (old_total >= 2) != (new_total >= 2)
            ).select("gram")
            flipped = F.broadcast(flipped) if small else flipped
            affected = {
                r[0]
                for r in partials.join(flipped, "gram", "left_semi")
                .select(_SRC)
                .distinct()
                .collect()
            } - set(stale)
        finally:
            cand.unpersist()
        scope = sorted(set(stale) | affected)
        shared = shared_grams_cut(spark, sf_dir, table, docs_of, view)
        frame = _scrub_frame(
            docs_of_r(spark, ix.corpus_file_paths(sf_dir, table, scope)), shared
        ).persist()
        try:
            _write_scrub(frame, path, dynamic=True)
            written = {r[0] for r in frame.select(_SRC).distinct().collect()}
        finally:
            frame.unpersist()
        orphaned = set(scope) - written
        if orphaned:
            # a changed file whose docs all vanished: its scrub partition
            # is unreachable by dynamic overwrite — drop it explicitly
            ix.drop_src_partitions(os.path.join(path, "docs"), orphaned)
        manifest = ix.compact_manifest(man, current)
        manifest["degraded"] = False
        ix.write_manifest(path, manifest)
        return _serve_scrub(spark, path)
    finally:
        if old_delta_tmp is not None:
            shutil.rmtree(old_delta_tmp, ignore_errors=True)


def _serve_scrub(spark: SparkSession, path: str) -> DataFrame:
    return _serve_component(
        spark,
        path,
        "docs",
        "doc_id bigint, n_tokens int, n_removed int, scrubbed_text string",
        partitioned=True,
    ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_removed").cast("int").alias("n_removed"),
        "scrubbed_text",
    )


def _serve_rollup(spark: SparkSession, path: str) -> DataFrame:
    return _merged_rollup(spark, path, ix.read_manifest(path))


def _serve_component(
    spark: SparkSession,
    path: str,
    component: str,
    empty_schema: str,
    partitioned: bool = False,
) -> DataFrame:
    """``partitioned`` components (the src=-partitioned scrub docs) keep
    their data under ``src=`` subdirectories, so emptiness is the ABSENCE
    of src= dirs (same rule as ``_serve``) — a top-level ``*.parquet``
    scan would read a populated table as empty and mask real read errors
    (corrupt file, crashed-overwrite leftovers) as valid zero-row
    results.  Unpartitioned components (rollup/cut) keep the flat
    ``*.parquet`` check."""
    import time

    comp = os.path.join(path, component)
    for _ in range(100):
        try:
            return spark.read.parquet(comp)
        except Exception:
            if os.path.exists(path):
                if os.path.isdir(comp) and not any(
                    e.name.startswith("src=")
                    if partitioned
                    else e.name.endswith(".parquet")
                    for e in os.scandir(comp)
                ):
                    return spark.createDataFrame([], empty_schema)
                raise
            time.sleep(0.05)
    raise FileNotFoundError(path)


def _serve(spark: SparkSession, path: str) -> DataFrame:
    import time

    grams = os.path.join(path, "grams")
    for _ in range(100):
        try:
            return spark.read.parquet(grams).select(
                "gram", F.col("n_docs").cast("bigint").alias("n_docs")
            )
        except Exception:
            if os.path.exists(path):
                if os.path.isdir(grams) and not any(
                    e.name.startswith("src=") for e in os.scandir(grams)
                ):
                    # every src partition dropped (e.g. RTBF purged the
                    # whole corpus): a valid EMPTY index, not an error
                    return spark.createDataFrame([], "gram bigint, n_docs bigint")
                raise
            time.sleep(0.05)
    raise FileNotFoundError(path)


def _retire_and_promote(
    staging: str,
    path: str,
    current_files: dict | None = None,
    components: tuple[str, ...] = ("grams",),
) -> None:
    """Retire→promote with the concurrent-winner check (same contract as
    operators/inverted.py — see that docstring for the race reasoning).
    ``current_files=None`` skips the winner check and always replaces —
    required when the staging was DERIVED from the live copy (the rollup
    merge), where keeping the live dir would drop the merge."""
    import shutil

    if current_files is not None and os.path.exists(path):
        man = ix.read_manifest(path)
        if ix.manifest_is_current(man, current_files) and all(
            os.path.exists(os.path.join(path, c)) for c in components
        ):
            shutil.rmtree(staging, ignore_errors=True)
            return
    if os.path.exists(path):
        tomb = ix.staging_path(path) + ".stale"
        try:
            os.rename(path, tomb)
        except OSError:
            tomb = None
        ix.promote(staging, path)
        if tomb is not None:
            shutil.rmtree(tomb, ignore_errors=True)
    else:
        ix.promote(staging, path)
