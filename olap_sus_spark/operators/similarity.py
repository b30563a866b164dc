"""Similarity search over embedding columns (array<float>).

Two paths, mirroring real vector-search practice:

- **Brute-force top-k** (:func:`cosine_topk`): every (query, candidate)
  pair, exact cosine, window top-k.  Correctness baseline; O(Q·N·d) — fine
  for Q small, wrong as the corpus path at 100 TB.
- **IVF top-k** (:func:`ivf_topk`): inverted-file index with deterministic
  centroids (the first C vectors — a real pipeline would k-means them; the
  assignment/probe machinery is identical).  Each vector is assigned to its
  nearest centroid (one narrow pass); a query probes only the nprobe nearest
  centroid lists, cutting the scanned corpus by ~C/nprobe.  The probe join
  is an equi-join on centroid id — shuffle on cluster id only, AQE handles
  skewed clusters.

Dot products are sequential left-folds over double-cast arrays so results
are bit-identical to the DuckDB oracle's list_reduce fold (no SIMD
reassociation on either side).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_sus_spark.operators.onecall import (
    lit_bigints,
    lit_doubles,
    lit_double_matrix,
)


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    return df.withColumn(out, F.col(vec_col).cast("array<double>"))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast queries × corpus, rank per query.

    Ties broken by candidate id — deterministic output.
    """
    # Per-vector norms price once per VECTOR, not once per (query, cand)
    # pair (r10): the inline cosine re-folded the candidate norm for every
    # query and the query norm for every candidate.  Staged sqrt(fold(x²))
    # is bit-identical and the division tree is unchanged.
    cand = (
        _as_double(emb, vec_col, "cv")
        .select(F.col(id_col).alias("cand_id"), "cv")
        .withColumn("_cn", norm(F.col("cv")))
    )
    qry = (
        _as_double(queries, vec_col, "qv")
        .select(F.col(query_id_col).alias("query_id"), "qv")
        .withColumn("_qn", norm(F.col("qv")))
    )
    # Broadcast the (small) query side: the corpus never moves, each
    # executor scans its corpus partitions against the replicated queries.
    scored = F.broadcast(qry).crossJoin(cand).filter(F.col("query_id") != F.col("cand_id")).select(
        "query_id", "cand_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def best_by(
    df: DataFrame,
    keys: list[str],
    score_col: str,
    id_col: str,
) -> DataFrame:
    """rank-1-by-(score DESC, id ASC) per key as ONE hash aggregate.

    ``max(struct(score, -id))`` replaces the row_number window: the window
    needs a full per-partition SORT of the scored stream before the partial
    WindowGroupLimit can prune it, while a hash aggregate partial-aggregates
    map-side with no sort at all and shuffles one row per (key, task)
    (guide §2.3 aggregate before you shuffle / §2.4 remove the sort).
    Selection-only, bit-identical: the struct's lexicographic comparison is
    double order on ``score`` first (Spark's NaN-greatest total order — the
    same order the DESC sort used), then max(-id) == min(id), the window's
    ASC tie-break; the carried doubles are untouched.

    NaN scores need no special casing even under the threshold-above-
    aggregate rewrite (ADVICE r10 raised it; verified WRONG in r11,
    tests/test_r11_optimizations.py): Spark's comparison operators use the
    same NaN-GREATEST total order as its sort, and so do DuckDB's — a
    ``score >= t`` filter KEEPS NaN rows in both engines, so the original
    pre-filtered window also selected the NaN pair whenever one existed,
    exactly like max(struct) does.  Pre- and post-filtering therefore
    commute bit-for-bit including 0/0 cosines from zero-norm vectors.

    Returns (*keys, id_col, score_col).
    """
    m = F.max(
        F.struct(F.col(score_col).alias("_s"), (-F.col(id_col)).alias("_negid"))
    )
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(m.alias("_best"))
        .select(
            *keys,
            (-F.col("_best._negid")).alias(id_col),
            F.col("_best._s").alias(score_col),
        )
    )


# Above this size the k×dim literal matrix (and the driver collect) stops
# being sensible — the crossJoin + window fallback handles big codebooks.
_MATRIX_MAX_K = 64


def _nearest_centroid_matrix(
    vecs: DataFrame,
    cent_rows: list,
    keep_cols: list[str],
    v_col: str = "v",
):
    """All-k cosine scoring in ONE aggregate pass (the srp_buckets matrix
    fold on runtime centroids): centroid vectors are collected driver-side
    (k is bounded — the codebook is the small side by construction) and
    folded into a constant element-major matrix, the per-vector norm prices
    once, and argmax-with-smallest-id-tie-break is array_position of the
    max (first occurrence — centroids enter the matrix sorted by id).

    Bit-exactness vs the crossJoin + per-centroid fold formulation (and the
    DuckDB oracles): each dot accumulates in the identical left-to-right
    element order; centroid norms are computed driver-side with the same
    sequential float64 fold + one sqrt; the division tree d/(vn·cn) is
    unchanged.  Returns ``keep_cols`` + (centroid_id, sim).
    """
    import math

    rows = sorted(cent_rows, key=lambda r: r[0])
    ids = [int(r[0]) for r in rows]
    cvecs = [[float(x) for x in r[1]] for r in rows]
    k, dim = len(ids), len(cvecs[0])

    def _norm(xs: list[float]) -> float:
        s = 0.0
        for x in xs:
            s += x * x
        return math.sqrt(s)

    cnorms = [_norm(v) for v in cvecs]
    # ONE py4j call via a server-side SQL literal (operators/onecall.py):
    # F.lit(list-of-lists) expands client-side to k·dim scalar lits — the
    # r10 rewrite was a no-op and the construction still cost seconds per
    # build, degrading with the py4j registry (measured r11).
    pmat = lit_double_matrix([[cvecs[c][j] for c in range(k)] for j in range(dim)])
    dots = F.aggregate(
        F.zip_with(F.col(v_col), pmat, lambda x, prow: F.transform(prow, lambda p: x * p)),
        F.array_repeat(F.lit(0.0), k),
        lambda acc, prods: F.zip_with(acc, prods, lambda a, b: a + b),
    )
    # Stage dots + the vector norm as real columns: sims references _vn per
    # element, and an inlined norm fold would re-run per element (the HOF
    # re-evaluation gotcha); attribute references are cheap.
    staged = vecs.select(*keep_cols, dots.alias("_dots"), norm(F.col(v_col)).alias("_vn"))
    sims = F.zip_with(
        F.col("_dots"),
        lit_doubles(cnorms),
        lambda d, cn: d / (F.col("_vn") * cn),
    )
    staged = staged.select(*keep_cols, sims.alias("_sims"))
    best = F.array_position(F.col("_sims"), F.array_max(F.col("_sims"))).cast("int")
    # centroid_id stays BIGINT like the chunked path's (and like the
    # source id column): the two paths must not produce different physical
    # schemas for the persisted assignments table.
    id_arr = lit_bigints(ids)
    return staged.select(
        *keep_cols,
        F.element_at(id_arr, best).alias("centroid_id"),
        F.array_max(F.col("_sims")).alias("sim"),
    )


def assign_centroids(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """IVF list assignment: nearest centroid per vector (max cosine, ties →
    smallest centroid id).  Small codebooks (k ≤ 64) take the single-pass
    matrix fold (:func:`_nearest_centroid_matrix`); larger ones take the
    CHUNKED matrix fold (:func:`_nearest_centroid_chunked`) — still exact,
    still narrow.  The retired alternative (broadcast crossJoin + window)
    materializes n×k rows each carrying both vectors: at 200k vectors ×
    3125 centroids that is a ~700 GB shuffle — the x100 semantic probe
    found it, and the chunked fold replaces it with k/64 shuffle-free
    passes.  ``passthrough`` columns (e.g. the source-file partition key of
    an incremental index refresh) ride along unchanged."""
    cents = _as_double(centroids, vec_col, "centv").select(
        F.col(id_col).alias("centroid_id"), "centv"
    )
    # limit(k+1) decides the path WITHOUT pulling a big codebook to the
    # driver prematurely: it returns every row iff the codebook fits the
    # single-matrix path, and at most 65 rows (discarded) when it doesn't.
    cent_rows = cents.limit(_MATRIX_MAX_K + 1).collect()
    vecs = _as_double(emb, vec_col, "v").select(
        F.col(id_col), "v", F.col(vec_col), *[F.col(c) for c in passthrough]
    )
    if 0 < len(cent_rows) <= _MATRIX_MAX_K:
        return _nearest_centroid_matrix(
            vecs, cent_rows, [id_col, vec_col, *passthrough]
        ).select(id_col, vec_col, *passthrough, "centroid_id")
    # big codebook: collect it whole (k×dim doubles — 3125×64 ≈ 1.6 MB;
    # ~65k centroids ≈ 33 MB is the practical ceiling before the documented
    # coarse-to-fine nesting takes over) and fold it chunk by chunk
    return _nearest_centroid_chunked(
        vecs, cents.collect(), [id_col, vec_col, *passthrough]
    ).select(id_col, vec_col, *passthrough, "centroid_id")


def _nearest_centroid_chunked(
    vecs: DataFrame,
    cent_rows: list,
    keep_cols: list[str],
    v_col: str = "v",
    checkpoint_every: int = 8,
):
    """EXACT nearest-centroid over a codebook larger than one literal
    matrix: iterate :func:`_nearest_centroid_matrix`-style folds over
    64-centroid chunks (id-ordered), carrying a running (best sim, best id)
    pair — every pass is a narrow projection, so the total cost is the
    irreducible n·k dot products with ZERO shuffle, vs the n×k row
    materialization of a crossJoin.  Ties: within a chunk, first-max =
    smallest id; across chunks, strictly-greater keeps the earlier
    (smaller-id) chunk — together exactly the global smallest-id
    tie-break.  ``localCheckpoint`` every few chunks keeps the plan flat.
    Bit-exact vs the single-matrix path: identical per-chunk fold order,
    identical division tree, comparisons on identical doubles."""
    import math

    rows = sorted(cent_rows, key=lambda r: r[0])

    def _norm(xs: list[float]) -> float:
        s = 0.0
        for x in xs:
            s += x * x
        return math.sqrt(s)

    staged = vecs.select(
        *keep_cols,
        F.col(v_col),
        norm(F.col(v_col)).alias("_vn"),
        F.lit(float("-inf")).alias("_bs"),
        F.lit(None).cast("long").alias("_bi"),
    )
    for ci, lo in enumerate(range(0, len(rows), _MATRIX_MAX_K)):
        chunk = rows[lo : lo + _MATRIX_MAX_K]
        ids = [int(r[0]) for r in chunk]
        cvecs = [[float(x) for x in r[1]] for r in chunk]
        k, dim = len(ids), len(cvecs[0])
        cnorms = [_norm(v) for v in cvecs]
        # one-call SQL literal per chunk (F.lit(list) would be k·dim py4j
        # round trips per chunk — see operators/onecall.py)
        pmat = lit_double_matrix([[cvecs[c][j] for c in range(k)] for j in range(dim)])
        dots = F.aggregate(
            F.zip_with(
                F.col(v_col), pmat, lambda x, prow: F.transform(prow, lambda p: x * p)
            ),
            F.array_repeat(F.lit(0.0), k),
            lambda acc, prods: F.zip_with(acc, prods, lambda a, b: a + b),
        )
        # stage dots, then sims, as real columns (HOF re-evaluation gotcha)
        staged = staged.select(
            *keep_cols, v_col, "_vn", "_bs", "_bi", dots.alias("_dots")
        )
        sims = F.zip_with(
            F.col("_dots"),
            lit_doubles(cnorms),
            lambda d, cn: d / (F.col("_vn") * cn),
        )
        staged = staged.select(
            *keep_cols, v_col, "_vn", "_bs", "_bi", sims.alias("_sims")
        )
        cbest = F.array_max(F.col("_sims"))
        cpos = F.array_position(F.col("_sims"), cbest).cast("int")
        cid = F.element_at(lit_bigints(ids), cpos)
        # both whens read the INPUT row's _bs — one select, no ordering hazard
        staged = staged.select(
            *keep_cols,
            v_col,
            "_vn",
            F.when(cbest > F.col("_bs"), cbest).otherwise(F.col("_bs")).alias("_bs"),
            F.when(cbest > F.col("_bs"), cid).otherwise(F.col("_bi")).alias("_bi"),
        )
        if (ci + 1) % checkpoint_every == 0:
            staged = staged.localCheckpoint(eager=True)
    return staged.select(
        *keep_cols,
        F.col("_bi").alias("centroid_id"),
        F.col("_bs").alias("sim"),
    )


def ivf_probe(
    indexed: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Query-path half of IVF: given a built index (``indexed`` =
    (id, vec, centroid_id) assignments + the centroid table), probe the
    nprobe nearest centroid lists and rerank by exact cosine.

    This is what a serving query costs once the index is maintained as a
    table — the assignment pass (:func:`assign_centroids`) amortizes across
    every query, exactly like a real vector store's index build.
    """
    # Queries probe their nprobe nearest centroids.
    cents = _as_double(centroids, vec_col, "centv").select(
        F.col(id_col).alias("centroid_id"), "centv"
    )
    qry = (
        _as_double(queries, vec_col, "qv")
        .select(F.col(query_id_col).alias("query_id"), "qv")
        # query norm prices once per query, not once per (query, candidate)
        # pair in the probed-list rerank below (r10; bit-identical staging)
        .withColumn("_qn", norm(F.col("qv")))
    )
    qprobe = qry.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "_qn", "centroid_id",
        cosine(F.col("qv"), F.col("centv")).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("centroid_id"))
    probes = (
        qprobe.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "qv", "_qn", "centroid_id")
    )

    # Search only the probed lists: equi-join on centroid_id.  Candidate
    # norms price once per vector — a candidate list is rescanned by every
    # query probing it.
    cand = (
        _as_double(indexed, vec_col, "cv")
        .select(F.col(id_col).alias("cand_id"), "cv", "centroid_id")
        .withColumn("_cn", norm(F.col("cv")))
    )
    scored = probes.join(cand, "centroid_id").filter(
        F.col("query_id") != F.col("cand_id")
    ).select(
        "query_id", "cand_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    num_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: index build (assignment) + probe in one plan.

    Deterministic 'training': centroids = the num_centroids smallest-id
    vectors (swap in k-means offline at scale; the index machinery is the
    same).  :func:`ivf_probe` is the serving half when the index is
    maintained as a table.
    """
    centroids = emb.orderBy(id_col).limit(num_centroids)
    indexed = assign_centroids(emb, centroids, id_col, vec_col)
    return ivf_probe(indexed, centroids, queries, nprobe, k, id_col, vec_col,
                     query_id_col)


def kmeans_centroids(
    emb: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means as DataFrame iterations (deterministic smallest-id
    init) — upgrades the IVF index from placeholder centroids to trained
    ones.

    Each round: broadcast the k centroids, assign every vector (narrow),
    recompute means with posexplode → groupBy(centroid_id, pos) partial
    sums — every aggregation buffer holds ONE (cluster, dimension) running
    (sum, count) pair, so memory stays bounded no matter how many vectors a
    hot cluster attracts (a collect_list-of-vectors mean would materialize
    the whole cluster in one buffer).  The k×dim per-dimension means then
    reassemble into ordered arrays with a dim-bounded collect_list.
    ``localCheckpoint`` truncates lineage so the plan stays flat across
    rounds; k rows always fit on the driver.  Returns
    (centroid_id, embedding).
    """
    cents = (
        _as_double(emb.orderBy(id_col).limit(k), vec_col, "centv")
        .select(F.col(id_col).alias("centroid_id"), "centv")
        .localCheckpoint(eager=True)
    )
    vecs = _as_double(emb, vec_col, "v").select(id_col, "v").localCheckpoint(eager=True)
    for _ in range(iters):
        # single-pass matrix-fold assignment (k bounded; cents checkpointed)
        best = _nearest_centroid_matrix(
            vecs, cents.select("centroid_id", "centv").collect(), ["v"]
        )
        # element-wise mean with bounded buffers: one (sum, count) pair per
        # (centroid, dimension) — never a whole cluster's vectors in memory
        dim_means = (
            best.select("centroid_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        cents = dim_means.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("pos"), (F.col("s") / F.col("n")).alias("m"))
                    )
                ),
                lambda st: st["m"],
            ).alias("centv")
        ).localCheckpoint(eager=True)
    return cents.select("centroid_id", F.col("centv").alias(vec_col))


KMEANS_FP_SCALE = 1 << 20
"""Fixed-point scale for :func:`kmeans_fp` mean accumulation (≈6 decimal
digits — far below embedding noise, far above any drift that could flip a
nearest-centroid assignment)."""


def kmeans_fp(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = KMEANS_FP_SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means with ENGINE-PORTABLE determinism — the oracle-able
    twin of :func:`kmeans_centroids` (same seeds, same assignment rule,
    same per-(centroid, dim) bounded-memory partial aggregation).

    The one non-portable step in plain k-means is the mean: summing doubles
    is order-sensitive, and Spark's shuffle order differs from any other
    engine's.  Here each element is quantized ONCE per round's input to a
    64-bit fixed-point integer (floor(x·scale + 0.5), the quantize_int8
    rounding rule), so the per-(centroid, dim) SUM is exact integer
    arithmetic — order-independent — and the new centroid coordinate is a
    single correctly-rounded double division sum/(n·scale).  Assignment
    cosines stay sequential-fold doubles (deterministic per row, like every
    ANN operator here).  The pagerank rank_fp trick (graph.py), applied to
    vectors.

    Returns one row per (centroid_id, pos): the final round's per-dimension
    mean plus the centroid's member count — scalar columns only, so the
    result is driver-canonicalizable.  Centroids that lose all members in
    some round drop out in both engines identically.
    """
    v = F.col(vec_col).cast("array<double>")
    vecs = (
        emb.select(
            F.col(id_col),
            v.alias("v"),
            F.transform(
                v, lambda x: F.floor(x * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
            ).alias("vfp"),
        )
        .localCheckpoint(eager=True)
    )
    cents = (
        _as_double(emb.orderBy(id_col).limit(k), vec_col, "centv")
        .select(F.col(id_col).alias("centroid_id"), "centv")
        .localCheckpoint(eager=True)
    )
    dim_means = None
    for it in range(iters):
        # single-pass matrix-fold assignment (k is bounded; cents is
        # checkpointed, so the collect reads k materialized rows)
        best = _nearest_centroid_matrix(
            vecs, cents.select("centroid_id", "centv").collect(), ["vfp"]
        ).select("centroid_id", "vfp")
        dim_means = (
            best.select("centroid_id", F.posexplode("vfp").alias("pos", "x"))
            .groupBy("centroid_id", F.col("pos").cast("int").alias("pos"))
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "centroid_id",
                "pos",
                (F.col("s").cast("double") / (F.col("n") * F.lit(scale)).cast("double")).alias("m"),
                "n",
            )
        )
        if it < iters - 1:  # final round's centroids are the output itself
            cents = (
                dim_means.groupBy("centroid_id")
                .agg(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("pos"), F.col("m")))
                        ),
                        lambda st: st["m"],
                    ).alias("centv")
                )
                .localCheckpoint(eager=True)
            )
    return dim_means.select(
        "centroid_id",
        "pos",
        F.col("m").alias("mean_val"),
        F.col("n").alias("n_members"),
    )


def semantic_codebook(
    emb: DataFrame,
    cell_target: int = 64,
    k_min: int = 8,
    scale: int = KMEANS_FP_SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup codebook (Abbas et al. 2023, "SemDeDup: data-efficient
    learning at web-scale through semantic deduplication"): one fixed-point
    Lloyd round from deterministic smallest-id seeds, with the codebook
    sized so the MEAN cell holds ~``cell_target`` vectors —
    k = max(k_min, ceil(n / cell_target)).

    The auto-sized k is the scale lever: within-cell pair expansion (the
    dedup stage downstream) is O(n · cell_target) instead of O(n²/k_fixed).
    Determinism is :func:`kmeans_fp`'s — assignment cosines are sequential-
    fold doubles, the mean accumulates exact 64-bit fixed-point integers,
    one correctly-rounded double division per (centroid, dim) — so the cell
    map value-hash matches a relational replay.  Beyond ~4M vectors the
    k×dim codebook outgrows a single broadcast; production would nest this
    (coarse cells → per-cell fine codebooks), which changes the constant,
    not the shape.

    Returns (centroid_id, vec_col double-array), checkpointed.
    """
    import math as _math

    n = emb.count()
    k = max(k_min, _math.ceil(n / float(cell_target)))
    c0 = emb.orderBy(id_col).limit(k)
    a1 = assign_centroids(emb, c0, id_col, vec_col)
    vfp = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"),
    )
    dim_means = (
        a1.select("centroid_id", F.posexplode(vfp).alias("pos", "x"))
        .groupBy("centroid_id", F.col("pos").cast("int").alias("pos"))
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "centroid_id",
            "pos",
            (F.col("s").cast("double") / (F.col("n") * F.lit(scale)).cast("double")).alias("m"),
        )
    )
    return (
        dim_means.groupBy("centroid_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("m")))),
                lambda st: st["m"],
            ).alias(vec_col)
        )
        .localCheckpoint(eager=True)
    )


def semantic_cells(
    emb: DataFrame,
    cell_target: int = 64,
    k_min: int = 8,
    scale: int = KMEANS_FP_SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Assign every vector to its :func:`semantic_codebook` cell (nearest
    centroid, smallest-id tie-break).  Pass an existing ``codebook`` to
    assign against a FROZEN one (the maintained-index refresh path).

    Returns (id_col, v double-array, vec_col, *passthrough, centroid_id),
    checkpointed — the dedup stage joins it against itself.
    """
    cb = (
        codebook
        if codebook is not None
        else semantic_codebook(emb, cell_target, k_min, scale, id_col, vec_col)
    )
    a2 = assign_centroids(
        emb, cb.select(F.col("centroid_id").alias(id_col), vec_col),
        id_col, vec_col, passthrough=passthrough,
    )
    return a2.select(
        id_col,
        F.col(vec_col).cast("array<double>").alias("v"),
        vec_col,
        *passthrough,
        "centroid_id",
    ).localCheckpoint(eager=True)


def semantic_dedup(
    cells: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Within-cell greedy semantic dedup over a :func:`semantic_cells` map:
    a vector is DROPPED iff some smaller-id cell-mate scores cosine >=
    threshold (keep-first-by-id, the exact_dedup convention); ``dup_of`` is
    the highest-cosine such mate (ties → smallest id).

    The only join is an equi-join on centroid_id, so per-key fanout is
    bounded by the cell size (~cell_target by construction) — never
    corpus×corpus.  Hot cells (duplicate-heavy corpora) are the AQE
    skew-join case.  Kept vectors carry sentinels (dup_of = -1,
    dup_cosine = -2.0) instead of NULLs so the verdict table stays
    canon-friendly end-to-end.
    """
    # Per-vector norms price once per VECTOR, not once per pair (r10): an
    # inline cosine would re-fold both norms for every cell-mate pair — 3
    # array folds per pair instead of 1.  Staged sqrt(fold(x²)) is bit-
    # identical to the inlined norm and the division tree is unchanged, so
    # verdict cosines still hash-match the relational replay.
    nv = cells.select("centroid_id", F.col(id_col), "v").withColumn(
        "_n", norm(F.col("v"))
    )
    a = nv.select(
        "centroid_id", F.col(id_col).alias("dup_of"), F.col("v").alias("av"),
        F.col("_n").alias("na"),
    )
    b = nv.select("centroid_id", id_col, F.col("v").alias("bv"), F.col("_n").alias("nb"))
    pairs = (
        b.join(a, "centroid_id")
        .filter(F.col("dup_of") < F.col(id_col))
        .select(
            id_col, "dup_of",
            (dot(F.col("av"), F.col("bv")) / (F.col("na") * F.col("nb"))).alias(
                "dup_cosine"
            ),
        )
    )
    # rank-1 window → one hash aggregate (r10, best_by), and the threshold
    # moves ABOVE the aggregate: a pre-agg filter gets pushed into the
    # join condition, so the 64-dim dot fold ran once to filter and AGAIN
    # in the projection for every surviving pair (plan audit: the fold in
    # Join condition AND Project).  max commutes with thresholding — the
    # argmax over pairs >= t is the global argmax whenever that max passes
    # t, and the row is dropped otherwise — so filtering best_by's output
    # is selection-identical and the fold now evaluates exactly once per
    # cell-mate pair.  The commutation is exact for NaN cosines too
    # (zero-norm vectors): >= keeps NaN in BOTH engines' NaN-greatest
    # total order, so the pre-filtered window also picked the NaN pair —
    # ADVICE r10's pre-drop would have DIVERGED from the oracle (r11,
    # tests/test_r11_optimizations.py).
    best = (
        best_by(pairs, [id_col], "dup_cosine", "dup_of")
        .filter(F.col("dup_cosine") >= threshold)
        .select(id_col, "dup_of", "dup_cosine")
    )
    return (
        cells.select(id_col, "centroid_id", *passthrough)
        .join(best, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            *passthrough,
            F.when(F.col("dup_of").isNull(), 1).otherwise(0).cast("int").alias("is_kept"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).cast("bigint").alias("dup_of"),
            F.coalesce(F.col("dup_cosine"), F.lit(-2.0)).alias("dup_cosine"),
        )
    )


def kmeans_inertia(emb: DataFrame, centroids: DataFrame,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> float:
    """Mean best-cosine across vectors (higher = tighter clustering)."""
    cents = _as_double(centroids, vec_col, "centv").select(
        F.col("centroid_id"), "centv"
    )
    vecs = _as_double(emb, vec_col, "v").select(id_col, "v")
    best = (
        vecs.crossJoin(F.broadcast(cents))
        .select(id_col, cosine(F.col("v"), F.col("centv")).alias("sim"))
        .groupBy(id_col)
        .agg(F.max("sim").alias("best"))
    )
    return best.agg(F.avg("best")).first()[0]


def quantize_int8(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the standard 4× storage /
    bandwidth reduction for 100 TB embedding corpora (scan-side dequant is
    one multiply).  scale = max|x|/127; q_i = floor(x_i/scale + 0.5)
    (explicit half-up — engine-portable, unlike round()'s dialect-specific
    tie behavior).  Fully narrow, zero shuffle.

    Returns per-vector scalars (id, n_dims, scale, q_checksum,
    max_abs_err): the quantized array itself would be written to storage;
    the checksum + reconstruction error are the verifiable surface.
    """
    # The scale must reach each element as a zip_with ARGUMENT
    # (array_repeat), never as an outer reference inside the lambda: the
    # r10 plan audit showed CollapseProject inlining the staged `_scale`
    # alias into the lambda body — references inside higher-order-function
    # lambdas are not counted as repeated — turning the array_max fold into
    # per-ELEMENT work, O(dim²) per vector.  An argument expression
    # evaluates once per row; same doubles, same floor(x/s + 0.5).
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    staged = emb.select(F.col(id_col), v.alias("_v"), scale.alias("_scale"))
    srep = F.array_repeat(F.col("_scale"), F.size("_v"))
    q = F.zip_with(
        F.col("_v"),
        srep,
        lambda x, s: F.when(s == 0.0, F.lit(0).cast("bigint"))
        .otherwise(F.floor(x / s + F.lit(0.5)))
        .cast("bigint"),
    )
    qs = F.zip_with(F.col("_q"), srep, lambda qi, s: qi * s)
    vq = F.zip_with(F.col("_qs"), F.col("_v"), lambda a, xi: F.abs(a - xi))
    return (
        staged.withColumn("_q", q)
        .withColumn("_qs", qs)
        .select(
            id_col,
            F.size("_v").alias("n_dims"),
            F.col("_scale").alias("scale"),
            F.aggregate(F.col("_q"), F.lit(0).cast("bigint"), lambda a, b: a + b).alias(
                "q_checksum"
            ),
            F.array_max(vq).alias("max_abs_err"),
        )
    )


def quantized_vecs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, qv) int8-quantized vectors — the storage artifact behind
    ``quantize_int8``'s scalar report.  For COSINE the per-vector scale
    cancels exactly (symmetric quantization: cos ≈ dot(qa,qb) /
    (||qa||·||qb||)), so the prescore path needs only the integer arrays —
    4× less scan bandwidth than the float corpus and integer multiplies
    in the hot loop."""
    # Scale as a zip_with ARGUMENT (array_repeat), not an outer lambda
    # reference — see quantize_int8: CollapseProject inlines the staged
    # alias into the lambda and re-runs the array_max fold per ELEMENT.
    v = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    staged = emb.select(F.col(id_col), v.alias("_v"), scale.alias("_scale"))
    return staged.select(
        id_col,
        F.zip_with(
            F.col("_v"),
            F.array_repeat(F.col("_scale"), F.size("_v")),
            lambda x, s: F.when(s == 0.0, F.lit(0).cast("bigint"))
            .otherwise(F.floor(x / s + F.lit(0.5)))
            .cast("bigint"),
        ).alias("qv"),
    )


def _int_dot(a: Column, b: Column) -> Column:
    """Exact integer-fold dot product (bigint — no float reassociation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def quantized_rerank_topk(
    emb: DataFrame,
    n_query: int,
    k: int = 5,
    pool: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN over an int8-quantized corpus: integer-cosine
    prescore over the quantized table (the 4×-smaller scan — at 100 TB
    this is the stage that touches every vector, so it reads the int8
    artifact, not the floats), top-``pool`` candidates per query, then an
    exact float cosine rerank of the bounded pool.  Entirely
    deterministic: the integer dot is exact, the prescore double is one
    cast + one division, ties break on candidate id — hence fully
    value-hash oracle-able.  max|q_i| = 127 so dim 64 dots stay ~2^20,
    nowhere near bigint range."""
    # Per-vector integer norms price once per VECTOR before the crossJoin
    # (r10): inlining them in the pair projection re-folded qq·qq and cq·cq
    # for every (query, candidate) pair — 3 integer folds per pair instead
    # of 1.  The staged value is the identical exact bigint dot, so the
    # sqrt + division tree (and the oracle match) are unchanged.
    # The quantized corpus is MATERIALIZED once (r10): in production this
    # is a stored artifact read back from parquet; inline, the plan audit
    # showed the pushed-down nonzero-norm filters and the prescore
    # projection each re-inlining the whole quantize+fold chain per
    # vector.  localCheckpoint pins quantize + integer norm to exactly one
    # evaluation per vector; values are untouched, so the oracle match is
    # unchanged.
    qv = (
        quantized_vecs(emb, id_col=id_col, vec_col=vec_col)
        .withColumn("_qn2", _int_dot(F.col("qv"), F.col("qv")))
        .localCheckpoint(eager=True)
    )
    cand = qv.select(
        F.col(id_col).alias("cand_id"), F.col("qv").alias("cq"),
        F.col("_qn2").alias("_cn2"),
    )
    qry = qv.filter(F.col(id_col) < n_query).select(
        F.col(id_col).alias("query_id"), F.col("qv").alias("qq"), "_qn2"
    )
    iq = _int_dot(F.col("qq"), F.col("cq"))
    qn = F.sqrt(F.col("_qn2").cast("double"))
    cn = F.sqrt(F.col("_cn2").cast("double"))
    pre = (
        F.broadcast(qry)
        .crossJoin(cand)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", iq.alias("_iq"), qn.alias("_qn"), cn.alias("_cn"))
        # all-zero quantized vectors (scale 0) have no direction — drop
        # them HERE, with an integer predicate both engines share, rather
        # than letting 0/0 NaNs diverge between IEEE dialects
        .filter((F.col("_qn") > 0.0) & (F.col("_cn") > 0.0))
        .select(
            "query_id",
            "cand_id",
            (F.col("_iq").cast("double") / (F.col("_qn") * F.col("_cn"))).alias(
                "prescore"
            ),
        )
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("prescore").desc(), F.col("cand_id")
    )
    shortlist = (
        pre.withColumn("prerank", F.row_number().over(wp))
        .filter(F.col("prerank") <= pool)
        .select("query_id", "cand_id", "prescore")
    )
    fl = _as_double(emb, vec_col, "fv").select(F.col(id_col).alias("_id"), "fv")
    rescored = (
        shortlist.join(
            F.broadcast(fl.withColumnRenamed("fv", "qfv")),
            F.col("query_id") == F.col("_id"),
        )
        .drop("_id")
        .join(fl.withColumnRenamed("fv", "cfv"), F.col("cand_id") == F.col("_id"))
        .select(
            "query_id",
            "cand_id",
            "prescore",
            cosine(F.col("qfv"), F.col("cfv")).alias("cosine"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "prescore", "cosine", "rank")
    )


def auto_bits(corpus_rows: int, target_bucket: int = 256) -> int:
    """Recommended SRP bits per table for a given corpus size: keeps the
    expected bucket occupancy near ``target_bucket`` (so probe candidate
    sets stay bounded as the corpus grows — with fixed bits, candidates
    grow linearly with N).  Recall is then tuned by n_tables.  The tiny
    test corpora use the 4-bit floor; a 10⁹-vector corpus gets ~22 bits.

    Pure integer arithmetic (== ceil(log2(N/target)) mathematically): a
    float log2 is not guaranteed correctly rounded across libm builds, so a
    corpus size a few ulps from a power of two could flip the ceil on one
    engine but not the other and desynchronize the index from its oracle.
    ``(ceil(N/t) - 1).bit_length()`` is exact everywhere (the DuckDB oracle
    uses the matching POWER(2,..) integer ladder)."""
    c = -(-max(1, corpus_rows) // target_bucket)  # ceil-div, exact
    return max(4, (c - 1).bit_length())


def _srp_plane(table: int, bit: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane: md5 parity of 'table_bit_dim-index'.

    Reproducible on any engine that has md5 (the DuckDB oracle builds the
    identical planes), so LSH bucket assignments are portable — no RNG
    state, no seed files.
    """
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{table}_{bit}_{j}".encode()).hexdigest()[:15], 16) % 2
        == 0
        else -1.0
        for j in range(dim)
    ]


def srp_buckets(
    emb: DataFrame,
    dim: int,
    n_tables: int = 12,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Sign-random-projection LSH bucket per (vector, table) — fully narrow.

    Each of the L×H signature bits is a sequential-fold dot product against
    a literal hyperplane (bit-identical to the oracle's cross-join + fold
    formulation); the per-table buckets pack bits into an int and explode to
    (vec, table, bucket) rows.  Zero shuffles: at 100 TB the signature pass
    is pure map work, and only the (id, table, bucket) triples — not the
    vectors — need to move afterwards.
    """
    from olap_sus_spark.catalog import spread_compute

    # The signature pass is compute-heavy per row; a single-row-group
    # parquet scans as ONE task, serializing it.  Re-spread first (no-op on
    # any real multi-split table — see catalog.spread_compute).
    emb = spread_compute(emb)
    K = n_tables * n_bits
    planes = [
        _srp_plane(t, h, dim) for t in range(n_tables) for h in range(n_bits)
    ]
    # ALL K plane dots in ONE aggregate pass with a K-wide accumulator (the
    # simhash60 votes trick): per element j, acc_k += x_j·P[j][k].  One HOF
    # traversal replaces K separate folds — measured 6× faster signatures
    # at (12 tables × 8 bits); HOFs don't codegen, so per-invocation
    # overhead dominates and collapsing K traversals into one is the lever.
    # Bit-exactness: each acc_k accumulates ((0 + x₀p₀ₖ) + x₁p₁ₖ)… — the
    # identical left-to-right association as a per-plane sequential fold,
    # so signatures still match the oracle's list_reduce digit for digit.
    # The element-major plane matrix is built server-side as ONE SQL
    # literal (operators/onecall.py): F.lit(list-of-lists) expands
    # CLIENT-side to dim·K scalar-lit py4j round trips (6144 for the
    # occupancy-8 signatures; 9216 at the sf0.1 dedup width) per QUERY
    # CONSTRUCTION, degrading as the py4j object registry grows — the r10
    # nested-lit rewrite did not change that mechanism (ADVICE r10;
    # re-measured r11: 4–15 s per construction via F.lit vs ~15 ms via
    # one F.expr).  Same literal value, same constant folding.
    pmat = lit_double_matrix([[planes[k][j] for k in range(K)] for j in range(dim)])
    v = F.col(vec_col).cast("array<double>")
    dots = F.aggregate(
        F.zip_with(v, pmat, lambda x, prow: F.transform(prow, lambda p: x * p)),
        F.array_repeat(F.lit(0.0), K),
        lambda acc, prods: F.zip_with(acc, prods, lambda a, b: a + b),
    )
    # Stage the dots as a REAL column: the bucket projection references it
    # n_tables×n_bits times, and an inlined aggregate would re-run the
    # whole pass per reference (CollapseProject only duplicates cheap
    # expressions, so staging pins single evaluation).
    staged = emb.select(
        F.col(id_col),
        F.col(vec_col),
        *[F.col(c) for c in passthrough],
        dots.alias("_dots"),
    )
    buckets = []
    for t in range(n_tables):
        acc = F.lit(0)
        for h in range(n_bits):
            acc = acc + F.when(
                F.col("_dots").getItem(t * n_bits + h) >= 0, F.lit(1 << h)
            ).otherwise(F.lit(0))
        buckets.append(acc)
    return staged.select(
        id_col,
        vec_col,
        *passthrough,
        F.posexplode(F.array(*buckets)).alias("t", "bucket"),
    )


def lsh_probe(
    b: DataFrame,
    n_query: int = 5,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allowed: DataFrame | None = None,
    multiprobe_bits: int | None = None,
) -> DataFrame:
    """Query-path half of SRP-LSH: given the bucket table ``b`` =
    (id, vec, t, bucket) rows (from :func:`srp_buckets`, live or loaded from
    a maintained index table), join bucket collisions and rerank the deduped
    candidates by exact cosine.  The collision join is an equi-join on
    (table, bucket) — the corpus shuffles its *signatures*, vectors move
    only for the deduped candidate pairs.

    ``allowed`` (optional, a frame of permitted ``id_col`` values) makes
    this a FILTERED vector search: the predicate semi-joins the candidate
    stream BEFORE the exact-cosine rerank — pre-filtering, so the top-k is
    taken over allowed candidates only (post-filtering a plain top-k would
    silently return fewer than k).  The filter is applied after the bucket
    collision, so the index itself stays predicate-agnostic.

    ``multiprobe_bits=H`` turns on MULTI-PROBE: each query additionally
    probes every bucket at Hamming distance 1 from its signature (flip
    each of the H bits) in every table — (H+1)× the probe keys for recall
    that would otherwise cost more tables, with the INDEX unchanged.  Only
    the tiny broadcast query side expands; the corpus-sized bucket table
    is joined exactly as before."""
    qb = b.filter(F.col(id_col) < n_query).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "t", "bucket"
    )
    if multiprobe_bits:
        flips = F.explode(
            F.array(F.lit(-1), *[F.lit(i) for i in range(multiprobe_bits)])
        ).alias("f")
        qb = qb.select("query_id", "qvec", "t", "bucket", flips).select(
            "query_id",
            "qvec",
            "t",
            F.when(F.col("f") < 0, F.col("bucket"))
            .otherwise(F.expr("bucket ^ shiftleft(1, f)"))
            .cast("int")
            .alias("bucket"),
        )
    cands = b.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"), "t", "bucket"
    )
    if allowed is not None:
        cands = cands.join(
            allowed.select(F.col(id_col).alias("cand_id")), "cand_id", "left_semi"
        )
    cand = (
        F.broadcast(qb)
        .join(cands, ["t", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = cand.select(
        "query_id",
        "cand_id",
        cosine(
            F.col("qvec").cast("array<double>"), F.col("cvec").cast("array<double>")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def lsh_topk(
    emb: DataFrame,
    dim: int,
    n_query: int = 5,
    n_tables: int = 12,
    n_bits: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SRP-LSH ANN top-k: signature pass (index build) + probe in one plan.

    Complements ivf_topk: no training step, recall tuned by (L, H) instead
    of (centroids, nprobe).  :func:`lsh_probe` is the serving half when the
    bucket table is maintained as an index table
    (:func:`load_or_build_srp_index`).
    """
    b = srp_buckets(emb, dim, n_tables, n_bits, id_col, vec_col)
    return lsh_probe(b, n_query, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# Maintained index tables — incrementally refreshable
#
# Real vector-search deployments build the index ONCE per corpus version and
# amortize it over every query; only the probe is on the serving path.  The
# helpers below persist the SRP bucket table / IVF assignment+centroid tables
# as Parquet via the warehouse sink machinery (sources/sinks.py).
#
# Maintenance contract (the refresh_aggregate pattern from etl.py, applied
# to indexes): the index path is keyed by corpus LOCATION + parameters —
# never by a corpus content stamp, which would force a full rebuild on any
# ingest — and staleness is tracked by a per-part-file MANIFEST inside the
# table.  The index table is directory-partitioned by ``src`` (the corpus
# part file each row came from), so:
#
# - ``refresh_*_index`` re-signs ONLY the part files added (or rewritten)
#   since the manifest and dynamic-partition-overwrites exactly their
#   ``src=`` partitions — an append-only 100 TB corpus pays one ingest-day
#   of signature work per day, not a full re-signature pass;
# - ``load_or_build_*`` serves when the manifest matches the corpus and
#   falls back to the safe full staged rebuild when it doesn't (the caller
#   ingested without refreshing — a maintained index must never silently
#   serve stale rows);
# - within each src partition, files stay range-sorted on the probe key
#   ((t, bucket) / centroid_id) so footer min/max stats keep pruning.
#
# Deletions and in-place rewrites of old part files fall back to a full
# rebuild (for SRP a rewrite is still partition-scoped — signatures are
# per-vector); the IVF refresh additionally requires appended ids to stay
# above the centroid range (otherwise the deterministic codebook itself
# changes and every assignment must be redone).


from olap_sus_spark.operators.index_store import (
    compact_manifest as _compact_manifest,
    corpus_file_paths as _corpus_file_paths,
    corpus_files as _corpus_files,
    corpus_rows as _corpus_rows,
    index_root as _index_root,
    manifest_diff as _manifest_diff,
    manifest_is_current as _manifest_is_current,
    promote as _promote,
    read_manifest as _read_manifest,
    staging_path as _staging_path,
    sweep_stale_staging as _sweep_stale_staging,
    write_manifest as _write_manifest,
)

# Bump when the signature/assignment ALGORITHM changes (plane construction,
# hash family, bucket packing) OR the persisted physical schema changes:
# the manifest catches data changes but a persisted index built by older
# code would otherwise be silently reused.
# v2: matrix-fold assignment (centroid_id pinned BIGINT on both paths).
# v3: location-keyed paths + src-partitioned layout + manifest staleness
#     (incremental refresh); serving columns unchanged.
_INDEX_ALGO_VERSION = "v3"

_SRC = "src"  # partition column: corpus part-file basename


def srp_index_path(sf_dir: str, dim: int, n_tables: int, n_bits: int) -> str:
    import hashlib

    key = hashlib.md5(
        f"{_INDEX_ALGO_VERSION}|{os.path.abspath(sf_dir)}"
        f"|{dim}|{n_tables}|{n_bits}".encode()
    ).hexdigest()[:16]
    return os.path.join(_index_root(), f"srp_{key}")


def ivf_index_path(sf_dir: str, num_centroids: int) -> str:
    import hashlib

    key = hashlib.md5(
        f"{_INDEX_ALGO_VERSION}|{os.path.abspath(sf_dir)}"
        f"|ivf|{num_centroids}".encode()
    ).hexdigest()[:16]
    return os.path.join(_index_root(), f"ivf_{key}")


def _with_src(df: DataFrame) -> DataFrame:
    """Tag each row with the basename of the parquet part file it came
    from — evaluated at the scan (before any exchange), so it survives the
    spread_compute repartition inside the signature pass."""
    return df.withColumn(
        _SRC, F.element_at(F.split(F.input_file_name(), "/"), -1)
    )


def _serve_retry(spark, path: str) -> DataFrame:
    """Read with a bounded retry: a concurrent rebuilder's retire→promote
    window (two renames, microseconds) can make the path vanish between a
    freshness check and the read."""
    import time

    for _ in range(100):
        try:
            return spark.read.parquet(path)
        except Exception:
            if os.path.exists(path):
                raise
            time.sleep(0.05)
    return spark.read.parquet(path)


def _retire_and_promote(
    staging: str,
    path: str,
    current_files: dict | None = None,
    components: tuple[str, ...] = (),
) -> None:
    """Replace a live (stale) index with a fully-built staging copy.  The
    retire rename must not assume it wins — a concurrent rebuilder over the
    same stale manifest may have retired/re-promoted already; the loser
    falls through to `promote`, which discards its equivalent copy if a
    winner's is live (queries/incremental.py contract).  ``current_files``
    re-checks freshness immediately BEFORE retiring: if a concurrent
    builder already landed a copy whose manifest matches the current
    corpus, retiring it would yank files out from under the winner's
    in-flight scans (the race found by tools/race_probe_maintained.py) —
    discard our equivalent staging instead."""
    import shutil

    if current_files is not None and os.path.exists(path):
        man = _read_manifest(path)
        if _manifest_is_current(man, current_files) and all(
            os.path.exists(os.path.join(path, c)) for c in components
        ):
            # current AND complete (``components`` guards the detected-
            # partial rebuild: its broken copy also carries a matching
            # manifest and MUST still be replaced)
            shutil.rmtree(staging, ignore_errors=True)
            return
    if os.path.exists(path):
        tomb = _staging_path(path) + ".stale"
        try:
            os.rename(path, tomb)
        except OSError:
            tomb = None  # concurrent retire won; nothing of ours to reap
        _promote(staging, path)
        if tomb is not None:
            shutil.rmtree(tomb, ignore_errors=True)
    else:
        _promote(staging, path)


def load_or_build_srp_index(
    spark,
    sf_dir: str,
    dim: int,
    n_tables: int = 12,
    n_bits: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Return the (id, vec, t, bucket) SRP bucket table for the corpus at
    ``sf_dir``, building + persisting it on first use (index build), loading
    the Parquet table afterwards (serving path).  A manifest mismatch (the
    corpus changed and nobody called :func:`refresh_srp_index`) triggers the
    safe full rebuild.

    ``n_bits=None`` sizes the signature with :func:`auto_bits` from the
    Parquet footer row count (no corpus scan on the serving path) so bucket
    occupancy — and therefore probe candidate-set size — stays bounded as
    the corpus grows.  The registered parity queries pass an explicit 4 to
    match their fixed oracles."""
    from olap_sus_spark.catalog import load_table
    from olap_sus_spark.sources.sinks import write_sorted_partitioned

    if n_bits is None:
        n_bits = auto_bits(_corpus_rows(sf_dir))
    path = srp_index_path(sf_dir, dim, n_tables, n_bits)
    current = _corpus_files(sf_dir)
    man = _read_manifest(path)
    if not _manifest_is_current(man, current):
        _sweep_stale_staging()
        emb = _with_src(load_table(spark, sf_dir, "embeddings"))
        # Materialize the signature pass once: the range partitioner's
        # sampling job would otherwise execute the (compute-heavy)
        # signature expressions twice.
        b = srp_buckets(
            emb, dim, n_tables, n_bits, id_col, vec_col, passthrough=(_SRC,)
        ).persist()
        os.makedirs(_index_root(), exist_ok=True)
        # Stage + atomic promotion: a crash mid-build must never leave a
        # directory that existence/manifest checks mistake for an index.
        staging = _staging_path(path)
        write_sorted_partitioned(b, staging, _SRC, ["t", "bucket"], files=4)
        b.unpersist()
        _write_manifest(
            staging, {**_compact_manifest(man, current), "n_bits": n_bits}
        )
        _retire_and_promote(staging, path, current)
    return _serve_retry(spark, path).select(id_col, vec_col, "t", "bucket")


def refresh_srp_index(
    spark,
    sf_dir: str,
    dim: int,
    n_tables: int = 12,
    n_bits: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental index maintenance: re-sign ONLY the corpus part files
    added or rewritten since the last manifest and dynamic-partition-
    overwrite their ``src=`` partitions — cost is O(ingested files), never
    O(corpus).  Signatures are per-vector, so the refreshed table is
    bit-identical to a fresh full build by construction.  Removed part
    files (or a never-built index) fall back to the full staged build.

    ``n_bits=None`` keeps the EXISTING index's bit width (from its
    manifest): signatures across partitions must come from one plane
    family — resizing for corpus growth is a full re-signature by nature
    and happens on the next full (re)build."""
    from olap_sus_spark.sources.sinks import write_sorted_partitioned

    man = None
    if n_bits is None:
        # peer at the auto-sized path first; fall back to auto sizing when
        # the index was never built (full build below picks the same width)
        auto = auto_bits(_corpus_rows(sf_dir))
        man = _read_manifest(srp_index_path(sf_dir, dim, n_tables, auto))
        n_bits = (man or {}).get("n_bits", auto)
    path = srp_index_path(sf_dir, dim, n_tables, n_bits)
    man = _read_manifest(path)
    current = _corpus_files(sf_dir)
    if man is None:
        return load_or_build_srp_index(
            spark, sf_dir, dim, n_tables, n_bits, id_col, vec_col
        )
    added, changed, removed = _manifest_diff(man, current)
    if removed:
        return load_or_build_srp_index(
            spark, sf_dir, dim, n_tables, n_bits, id_col, vec_col
        )
    if added or changed:
        paths = _corpus_file_paths(sf_dir, "embeddings", added + changed)
        emb = _with_src(spark.read.parquet(*paths))
        b = srp_buckets(
            emb, dim, n_tables, n_bits, id_col, vec_col, passthrough=(_SRC,)
        )
        write_sorted_partitioned(
            b, path, _SRC, ["t", "bucket"], files=4, dynamic=True
        )
        _write_manifest(path, {**_compact_manifest(man, current), "n_bits": n_bits})
    return _serve_retry(spark, path).select(id_col, vec_col, "t", "bucket")


def _build_ivf(spark, sf_dir, num_centroids, id_col, vec_col, path, current):
    from olap_sus_spark.catalog import load_table
    from olap_sus_spark.sources.sinks import write_sorted_partitioned

    _sweep_stale_staging()
    emb = _with_src(load_table(spark, sf_dir, "embeddings"))
    centroids = emb.drop(_SRC).orderBy(id_col).limit(num_centroids)
    # persist: the range partitioner's sampling job would otherwise run the
    # assignment scoring pass a second time.  Both tables build under one
    # staging dir promoted atomically.
    assigned = assign_centroids(
        emb, centroids, id_col, vec_col, passthrough=(_SRC,)
    ).persist()
    os.makedirs(_index_root(), exist_ok=True)
    staging = _staging_path(path)
    os.makedirs(staging, exist_ok=True)
    write_sorted_partitioned(
        assigned, os.path.join(staging, "assignments"), _SRC,
        ["centroid_id"], files=4,
    )
    assigned.unpersist()
    cent_rows = centroids.coalesce(1)
    cent_rows.write.mode("overwrite").parquet(os.path.join(staging, "centroids"))
    stats = spark.read.parquet(os.path.join(staging, "centroids")).agg(
        F.max(id_col), F.count(F.lit(1))
    ).first()
    _write_manifest(
        staging,
        {
            **_compact_manifest(_read_manifest(path), current),
            "num_centroids": num_centroids,
            "max_centroid_id": None if stats[0] is None else int(stats[0]),
            "n_centroids_built": int(stats[1]),
        },
    )
    _retire_and_promote(staging, path, current, ("assignments", "centroids"))


def load_or_build_ivf_index(
    spark,
    sf_dir: str,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Return (assignments, centroids) for the IVF index over the corpus at
    ``sf_dir``, building + persisting both tables on first use.  Staleness
    via the corpus manifest (full rebuild on mismatch — the caller ingested
    without :func:`refresh_ivf_index`); assignments are src-partitioned +
    sorted on centroid_id so a probe of a few lists prunes most files via
    footer stats."""
    path = ivf_index_path(sf_dir, num_centroids)
    apath = os.path.join(path, "assignments")
    cpath = os.path.join(path, "centroids")
    current = _corpus_files(sf_dir)
    man = _read_manifest(path)
    if not _manifest_is_current(man, current) or not (
        os.path.exists(apath) and os.path.exists(cpath)
    ):
        _build_ivf(spark, sf_dir, num_centroids, id_col, vec_col, path, current)
    a = _serve_retry(spark, apath).select(id_col, vec_col, "centroid_id")
    return a, spark.read.parquet(cpath)


def refresh_ivf_index(
    spark,
    sf_dir: str,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Incremental IVF maintenance: assign ONLY newly-appended part files
    against the EXISTING codebook and overwrite their ``src=`` partitions.

    Exactness guard: the deterministic codebook is the ``num_centroids``
    smallest-id vectors, so the refresh is identical to a full rebuild iff
    (a) the codebook was complete at build time and (b) every appended id
    is above the codebook's max id.  Appends that intrude into the codebook
    range, rewrites/removals of old files, or a short codebook all fall
    back to the full rebuild — the index must never diverge from what a
    fresh build would produce."""
    from olap_sus_spark.sources.sinks import write_sorted_partitioned

    path = ivf_index_path(sf_dir, num_centroids)
    apath = os.path.join(path, "assignments")
    cpath = os.path.join(path, "centroids")
    man = _read_manifest(path)
    current = _corpus_files(sf_dir)
    if man is None or not (os.path.exists(apath) and os.path.exists(cpath)):
        return load_or_build_ivf_index(spark, sf_dir, num_centroids, id_col, vec_col)
    added, changed, removed = _manifest_diff(man, current)
    if changed or removed or man.get("n_centroids_built", 0) < num_centroids:
        return load_or_build_ivf_index(spark, sf_dir, num_centroids, id_col, vec_col)
    if added:
        paths = _corpus_file_paths(sf_dir, "embeddings", added)
        emb = _with_src(spark.read.parquet(*paths))
        min_new = emb.agg(F.min(id_col)).first()[0]
        if min_new is not None and min_new <= man["max_centroid_id"]:
            # appended ids intrude into the deterministic codebook: the
            # centroids themselves change — full rebuild.
            return load_or_build_ivf_index(
                spark, sf_dir, num_centroids, id_col, vec_col
            )
        centroids = spark.read.parquet(cpath)
        assigned = assign_centroids(
            emb, centroids, id_col, vec_col, passthrough=(_SRC,)
        )
        write_sorted_partitioned(
            assigned, apath, _SRC, ["centroid_id"], files=4, dynamic=True
        )
        _write_manifest(path, {**man, **_compact_manifest(man, current)})
    a = _serve_retry(spark, apath).select(id_col, vec_col, "centroid_id")
    return a, spark.read.parquet(cpath)


# ---------------------------------------------------------------------------
# Maintained semantic-dedup index (SemDeDup as a serving table).
#
# Three components under one staged, manifest-guarded root:
#   codebook/    — the frozen cell centroids (semantic_codebook output);
#   assignments/ — (vec_id, embedding, centroid_id), src=partitioned and
#                  sorted on centroid_id (the refresh's candidate side);
#   verdicts/    — the dedup_semantic_clusters output rows, src=partitioned
#                  and sorted on vec_id (the serving surface — a pure scan).
#
# Incremental refresh leans on a structural property of the greedy
# keep-first-by-id rule: with the codebook FROZEN and every appended id
# ABOVE the existing corpus, old verdicts can never flip (a vector's
# verdict depends only on smaller-id cell-mates, and appends only add
# larger ids).  So a refresh assigns ONLY the batch, pairs it against
# (existing ∪ smaller-id-batch) cell-mates, and appends the new src=
# partitions — O(batch · cell_target) work.  Id-interleaved appends,
# rewrites, and removals all fall back to the full rebuild.  Like
# refresh_srp_index's n_bits, the refresh keeps the BUILT codebook width:
# re-sizing k for corpus growth is a semantic change by nature and happens
# on the next full (re)build (manifest staleness forces one when anything
# but a clean append occurs).
# ---------------------------------------------------------------------------


def semantic_index_path(sf_dir: str, cell_target: int, threshold: float) -> str:
    import hashlib

    key = hashlib.md5(
        f"{_INDEX_ALGO_VERSION}|{os.path.abspath(sf_dir)}"
        f"|sem|{cell_target}|{threshold}".encode()
    ).hexdigest()[:16]
    return os.path.join(_index_root(), f"sem_{key}")


def _build_semantic(spark, sf_dir, cell_target, threshold, path, current,
                    id_col="vec_id", vec_col="embedding"):
    from olap_sus_spark.catalog import load_table
    from olap_sus_spark.sources.sinks import write_sorted_partitioned

    _sweep_stale_staging()
    emb = _with_src(load_table(spark, sf_dir, "embeddings"))
    cb = semantic_codebook(
        emb.drop(_SRC), cell_target, id_col=id_col, vec_col=vec_col
    )
    cells = semantic_cells(
        emb, cell_target, id_col=id_col, vec_col=vec_col,
        codebook=cb, passthrough=(_SRC,),
    )
    verdicts = semantic_dedup(cells, threshold, id_col, passthrough=(_SRC,))
    os.makedirs(_index_root(), exist_ok=True)
    staging = _staging_path(path)
    os.makedirs(staging, exist_ok=True)
    write_sorted_partitioned(
        cells.select(id_col, vec_col, "centroid_id", _SRC),
        os.path.join(staging, "assignments"), _SRC, ["centroid_id"], files=4,
    )
    write_sorted_partitioned(
        verdicts, os.path.join(staging, "verdicts"), _SRC, [id_col], files=4,
    )
    cb.coalesce(1).write.mode("overwrite").parquet(os.path.join(staging, "codebook"))
    max_id = emb.agg(F.max(id_col)).first()[0]
    _write_manifest(
        staging,
        {
            **_compact_manifest(_read_manifest(path), current),
            "cell_target": cell_target,
            "threshold": threshold,
            "max_vec_id": None if max_id is None else int(max_id),
        },
    )
    _retire_and_promote(
        staging, path, current, ("assignments", "verdicts", "codebook")
    )


def load_or_build_semantic_index(
    spark,
    sf_dir: str,
    cell_target: int = 64,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Return the maintained semantic-dedup verdict table for the corpus at
    ``sf_dir`` (vec_id, centroid_id, is_kept, dup_of, dup_cosine), building
    and persisting the three index components on first use.  Staleness via
    the corpus manifest — a corpus change without :func:`
    refresh_semantic_index` triggers the safe full rebuild."""
    path = semantic_index_path(sf_dir, cell_target, threshold)
    current = _corpus_files(sf_dir)
    man = _read_manifest(path)
    if not _manifest_is_current(man, current) or not all(
        os.path.exists(os.path.join(path, c))
        for c in ("assignments", "verdicts", "codebook")
    ):
        _build_semantic(
            spark, sf_dir, cell_target, threshold, path, current, id_col, vec_col
        )
    return _serve_retry(spark, os.path.join(path, "verdicts")).select(
        id_col, "centroid_id", "is_kept", "dup_of", "dup_cosine"
    )


def _semantic_verdicts(
    b_frame: DataFrame,
    cand: DataFrame,
    threshold: float,
    id_col: str,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """The verdict join shared by append-refresh and purge-refresh:
    ``b_frame`` = vectors needing verdicts (centroid_id, id, bv double-array,
    *extra); ``cand`` = candidate mates (centroid_id, dup_of, av) — the
    greedy rule only consumes smaller-id same-cell mates, enforced here.

    Per-vector norms price once per VECTOR, not once per pair (r10, same
    staging as :func:`semantic_dedup`): an inline cosine would re-fold both
    norms for every cell-mate pair.  sqrt(fold(x²)) staged pre-join is
    bit-identical and the division tree is unchanged, so the refresh still
    equals the rebuild verdict-for-verdict."""
    pairs = (
        b_frame.select("centroid_id", id_col, "bv")
        .withColumn("_nb", norm(F.col("bv")))
        .join(cand.withColumn("_na", norm(F.col("av"))), "centroid_id")
        .filter(F.col("dup_of") < F.col(id_col))
        .select(
            id_col, "dup_of",
            (dot(F.col("av"), F.col("bv")) / (F.col("_na") * F.col("_nb"))).alias(
                "dup_cosine"
            ),
        )
    )
    # rank-1 window → one hash aggregate with the threshold ABOVE it (r10,
    # best_by) — same rewrite and same max-commutes-with-threshold argument
    # as semantic_dedup (exact for NaN cosines too — see semantic_dedup),
    # so refresh still equals rebuild verdict-for-verdict.
    best = (
        best_by(pairs, [id_col], "dup_cosine", "dup_of")
        .filter(F.col("dup_cosine") >= threshold)
        .select(id_col, "dup_of", "dup_cosine")
    )
    return (
        b_frame.select(id_col, "centroid_id", *extra)
        .join(best, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            *extra,
            F.when(F.col("dup_of").isNull(), 1).otherwise(0).cast("int").alias("is_kept"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).cast("bigint").alias("dup_of"),
            F.coalesce(F.col("dup_cosine"), F.lit(-2.0)).alias("dup_cosine"),
        )
    )


def refresh_semantic_index(
    spark,
    sf_dir: str,
    cell_target: int = 64,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Absorb an append-only ingest in O(batch · cell_target): assign the
    batch against the FROZEN codebook, pair it with (existing ∪ smaller-id
    batch) cell-mates, and append the new ``src=`` partitions.  The big
    side never shuffles — the batch's cells broadcast onto one scan of the
    existing assignments.  Old verdicts are untouched bytes (provably
    stable: verdicts depend only on smaller-id cell-mates).  Interleaved
    ids, rewrites, removals, or a missing index fall back to the full
    rebuild.

    EPOCH-PINNED contract (unlike SRP/IVF, whose codebooks are corpus-
    independent): the Lloyd-trained codebook depends on the training
    corpus, so a from-scratch rebuild over the GROWN corpus would
    legitimately re-train and re-cluster.  The refresh therefore equals a
    rebuild UNDER THE BUILT CODEBOOK (test_index_refresh.py pins exactly
    that), and re-clustering is the scheduled full-rebuild path — the same
    trade every production SemDeDup deployment makes (re-embedding/
    re-clustering epochs, incremental verdicts in between)."""
    from olap_sus_spark.sources.sinks import write_sorted_partitioned

    path = semantic_index_path(sf_dir, cell_target, threshold)
    apath = os.path.join(path, "assignments")
    vpath = os.path.join(path, "verdicts")
    cpath = os.path.join(path, "codebook")
    man = _read_manifest(path)
    current = _corpus_files(sf_dir)
    if man is None or not all(os.path.exists(p) for p in (apath, vpath, cpath)):
        return load_or_build_semantic_index(
            spark, sf_dir, cell_target, threshold, id_col, vec_col
        )
    added, changed, removed = _manifest_diff(man, current)
    if removed or (changed and added):
        return load_or_build_semantic_index(
            spark, sf_dir, cell_target, threshold, id_col, vec_col
        )
    if changed:
        out = _semantic_purge_refresh(
            spark, sf_dir, path, man, current, changed,
            threshold, id_col, vec_col,
        )
        if out is None:  # not a pure removal — safe full rebuild
            return load_or_build_semantic_index(
                spark, sf_dir, cell_target, threshold, id_col, vec_col
            )
        return out
    if added:
        paths = _corpus_file_paths(sf_dir, "embeddings", added)
        batch = _with_src(spark.read.parquet(*paths))
        min_new = batch.agg(F.min(id_col)).first()[0]
        max_old = man.get("max_vec_id")
        if min_new is not None and max_old is not None and min_new <= max_old:
            # an interleaved id could become a smaller-id cell-mate of an
            # EXISTING vector and flip its verdict — full rebuild.
            return load_or_build_semantic_index(
                spark, sf_dir, cell_target, threshold, id_col, vec_col
            )
        cb = spark.read.parquet(cpath)
        bcells = semantic_cells(
            batch, cell_target, id_col=id_col, vec_col=vec_col,
            codebook=cb, passthrough=(_SRC,),
        )
        old = _serve_retry(spark, apath).select(
            F.col(id_col).alias("dup_of"),
            F.col(vec_col).cast("array<double>").alias("av"),
            "centroid_id",
        )
        batch_a = bcells.select(
            "centroid_id", F.col(id_col).alias("dup_of"), F.col("v").alias("av")
        )
        b = bcells.select("centroid_id", id_col, F.col("v").alias("bv"), _SRC)
        verdicts_new = _semantic_verdicts(
            b, old.unionByName(batch_a), threshold, id_col, extra=(_SRC,)
        )
        write_sorted_partitioned(
            bcells.select(id_col, vec_col, "centroid_id", _SRC),
            apath, _SRC, ["centroid_id"], files=4, dynamic=True,
        )
        write_sorted_partitioned(
            verdicts_new, vpath, _SRC, [id_col], files=4, dynamic=True
        )
        new_max = batch.agg(F.max(id_col)).first()[0]
        _write_manifest(
            path,
            {
                **man,
                **_compact_manifest(man, current),
                "max_vec_id": max(
                    x for x in (man.get("max_vec_id"), None if new_max is None else int(new_max))
                    if x is not None
                ),
            },
        )
    return _serve_retry(spark, vpath).select(
        id_col, "centroid_id", "is_kept", "dup_of", "dup_cosine"
    )


def _semantic_purge_refresh(
    spark,
    sf_dir: str,
    path: str,
    man: dict,
    current: dict,
    changed: list[str],
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame | None:
    """O(affected) RTBF for the semantic index — the family's analogue of
    the gram chain's un-scrub.

    purge_table_ids rewrites corpus part files IN PLACE, so a purge shows
    up as CHANGED files.  Removal has a one-sided effect under the greedy
    keep-first-by-id rule: it can only shrink a vector's candidate set, so
    previously-KEPT rows stay kept, and the only rows needing re-verdict
    are those whose recorded ``dup_of`` was purged (they either fall back
    to their next-best surviving mate or flip to kept).  The refresh
    therefore: (1) verifies the change is a PURE removal (surviving rows
    byte-identical — anything else returns None for the safe full
    rebuild); (2) drops purged rows from the changed ``src=`` assignment
    partitions (survivor cells are frozen-codebook assignments —
    unchanged); (3) re-verdicts exactly the ``dup_of``-orphaned rows
    against surviving smaller-id cell-mates; (4) rewrites only the verdict
    partitions holding purged or orphaned rows.  Cost: O(changed files +
    orphans · cell), never O(corpus).
    """
    from olap_sus_spark.operators.purge import _drop, _match
    from olap_sus_spark.sources.sinks import write_sorted_partitioned

    apath = os.path.join(path, "assignments")
    vpath = os.path.join(path, "verdicts")

    new_files = _corpus_file_paths(sf_dir, "embeddings", changed)
    new_rows = _with_src(spark.read.parquet(*new_files)).select(
        F.col(id_col), F.col(vec_col).alias("_nv"), _SRC
    )
    old_changed = (
        _serve_retry(spark, apath)
        .filter(F.col(_SRC).isin(list(changed)))
        .select(id_col, vec_col, "centroid_id", _SRC)
        .localCheckpoint(eager=True)  # materialize BEFORE overwriting below
    )
    j = old_changed.join(new_rows, [id_col, _SRC], "left")
    survivors = j.filter(F.col("_nv").isNotNull())
    if survivors.filter(F.col("_nv") != F.col(vec_col)).count() > 0:
        return None  # surviving vector mutated — not a purge
    pids = [r[0] for r in j.filter(F.col("_nv").isNull()).select(id_col).collect()]
    if (
        new_rows.join(
            old_changed.select(id_col, _SRC), [id_col, _SRC], "left_anti"
        ).count()
        > 0
    ):
        return None  # a changed file gained rows — not a purge
    if not pids:
        _write_manifest(path, {**man, **_compact_manifest(man, current)})
        return _serve_retry(spark, vpath).select(
            id_col, "centroid_id", "is_kept", "dup_of", "dup_cosine"
        )

    # (2) assignments: drop purged rows, rewrite the changed partitions only.
    # A fully-purged src writes ZERO rows — dynamic overwrite would leave its
    # stale partition behind (the orphaned-partition class ADVICE r08 found
    # in gramfreq/inverted), so drop those partitions explicitly.
    surv_assign = _drop(old_changed, id_col, pids).select(
        id_col, vec_col, "centroid_id", _SRC
    )
    live_srcs = {r[0] for r in surv_assign.select(_SRC).distinct().collect()}
    emptied = set(changed) - live_srcs
    if emptied:
        from olap_sus_spark.operators.index_store import drop_src_partitions

        drop_src_partitions(apath, emptied)
        drop_src_partitions(vpath, emptied)
    write_sorted_partitioned(
        surv_assign, apath, _SRC, ["centroid_id"], files=4, dynamic=True,
    )

    # (3) orphans: surviving rows whose recorded dup_of was purged
    verd = _serve_retry(spark, vpath)
    orphans = (
        _drop(_match(verd, "dup_of", pids), id_col, pids)
        .select(id_col, _SRC)
        .localCheckpoint(eager=True)
    )
    orphan_srcs = [r[0] for r in orphans.select(_SRC).distinct().collect()]
    parts = sorted(set(changed) | set(orphan_srcs))

    # candidates = ALL surviving assignments (post-rewrite), cell-bounded
    alive = _serve_retry(spark, apath)
    cand = alive.select(
        "centroid_id",
        F.col(id_col).alias("dup_of"),
        F.col(vec_col).cast("array<double>").alias("av"),
    )
    b = (
        alive.join(orphans.select(id_col), id_col)
        .select(
            "centroid_id", id_col, F.col(vec_col).cast("array<double>").alias("bv"),
            _SRC,
        )
    )
    new_verd = _semantic_verdicts(b, cand, threshold, id_col, extra=(_SRC,)).select(
        id_col, "centroid_id", _SRC, "is_kept", "dup_of", "dup_cosine"
    )

    # (4) rewrite only the touched verdict partitions: purged rows out,
    # orphan verdicts replaced, everything else carried through unchanged
    old_parts = (
        verd.filter(F.col(_SRC).isin(parts)).localCheckpoint(eager=True)
    )
    carried = _drop(old_parts, id_col, pids).join(
        orphans.select(id_col), id_col, "left_anti"
    ).select(id_col, "centroid_id", _SRC, "is_kept", "dup_of", "dup_cosine")
    write_sorted_partitioned(
        carried.unionByName(new_verd), vpath, _SRC, [id_col], files=4, dynamic=True
    )
    _write_manifest(path, {**man, **_compact_manifest(man, current)})
    return _serve_retry(spark, vpath).select(
        id_col, "centroid_id", "is_kept", "dup_of", "dup_cosine"
    )
