"""Distributed distinct-count sketches with exact, engine-portable arithmetic.

KMV (k-minimum-values): the sketch of a set is the k smallest distinct
48-bit hash values of its members; the estimator is

    distinct ≈ (k-1) · 2^48  DIV  h_k        (h_k = k-th smallest hash)

with the exact count returned whenever fewer than k distinct hashes exist
(Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM 2002).  Standard error is ~1/sqrt(k-2).

Why KMV and not HyperLogLog here: Spark 4 ships datasketches HLL
(``hll_sketch_agg``), but the sketch binary and its float harmonic-mean
estimator are opaque to any SQL oracle.  KMV state is a plain sorted list
of BIGINTs — integer-exact, mergeable by union-then-retruncate, and the
estimator is one integer division — so a DuckDB oracle can replay the
WHOLE construction (same md5 prefixes, same row_number cutoff, same DIV)
and the driver's value-hash gate proves the distributed fold bit-exact.
48-bit hashes keep (k-1)·2^48 inside BIGINT for any practical k (k ≤ 2^15).

Mergeability is what makes the sketch warehouse-shaped: any hash among the
global k smallest is among its own partition's k smallest, so per-day
(or per-shard) partials of size ≤ k union-merge into exactly the global
sketch — see queries/sketches.py for the maintained per-day partial table
with O(day) refresh.

Scale shape of the fold: a naive per-group ``collect_list`` materialises
every distinct hash of a group in one aggregation buffer (OOM at 10^9+
distinct).  The fold here is two-phase: hashes are first truncated to the
k smallest within each of S disjoint salt buckets (``pmod(h, S)`` — a
partition of hash space, so no value is counted twice), then the ≤ S·k
survivors fold to the final k.  Buffer size is bounded by
distinct/(groups·S) in phase 1 and S·k in phase 2; S is a knob sized like
``auto_bits`` (S ≥ distinct_per_group / 10^6 keeps buffers ~1M).  The
result is provably independent of S — pinned by a test — because the
global k smallest survive any bucketing.

No counterpart in the reference (its summaries are exact GROUP BYs,
e.g. /root/reference/dags/queries-scripts.py); this extends the engine's
approximate family (approx_aggregates) with a sketch whose maintenance
and serving follow the incremental-aggregate contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 48
HASH_SPACE = 1 << HASH_BITS  # 2^48


def hash48(col: Column | str) -> Column:
    """48-bit hash: first 12 hex digits of md5 of the value's canonical
    string form — `CAST(x AS STRING)` renders BIGINTs identically in Spark
    and DuckDB, so both engines derive the same hash for the same value
    (collisions included: at 2^48, ~n²/2^49 per group, and a collision is
    mirrored exactly on the oracle side rather than being an error)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast("bigint")


def kmv_fold(
    h_df: DataFrame,
    group_cols: list[str],
    k: int,
    salt_buckets: int = 64,
) -> DataFrame:
    """Fold hashes to the per-group KMV sketch.

    ``h_df`` carries (group cols, h); duplicate hashes are fine — phase 1
    dedups with ``collect_set`` INSIDE the salt-bucket aggregation, so no
    separate ``.distinct()`` exchange precedes the fold (2 shuffles total:
    salt grain, then group grain).  Returns one row per group with
    ``khashes``: the sorted array of the group's k smallest distinct
    hashes (shorter when the group has fewer distinct values)."""
    salt = F.pmod(F.col("h"), F.lit(salt_buckets)).alias("_salt")
    phase1 = h_df.groupBy(*group_cols, salt).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs")
    )
    return (
        phase1.select(*group_cols, F.explode("hs").alias("h"))
        .groupBy(*group_cols)
        # phase-2 input is already duplicate-free: the salt buckets
        # partition hash space, so no value survives in two buckets
        .agg(F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("khashes"))
    )


def kmv_estimate(k: int, alias: str, khashes: str = "khashes") -> Column:
    """Integer-exact estimator column over a :func:`kmv_fold` result.

    ``(k-1)·2^48 DIV h_k`` — BIGINT division (`DIV`), no float anywhere,
    so the DuckDB twin (`//` on the same numerator) is bit-identical.
    Fewer than k distinct hashes means the sketch IS the set: return its
    exact size.  `try_element_at` (not `element_at`) guards the under-full
    branch under ANSI mode, and NULLIF guards the measure-zero h_k = 0."""
    num = (k - 1) * HASH_SPACE
    return F.expr(
        f"CAST(CASE WHEN size({khashes}) < {k} THEN size({khashes}) "
        f"ELSE {num} DIV nullif(try_element_at({khashes}, {k}), 0) END AS BIGINT)"
    ).alias(alias)


def kmv_pair_overlap(sk: DataFrame, seg_col: str, k: int) -> DataFrame:
    """Set algebra over per-segment sketches: for every unordered segment
    pair, estimate |A|, |B|, |A∪B| and |A∩B| from the two k-min arrays
    alone (Beyer et al., "On synopses for distinct-value estimation under
    multiset operations", SIGMOD 2007).

    The union sketch is merge-then-retruncate (k smallest of A∪B's
    hashes); with p = members of the merged sketch present in BOTH input
    sketches, ρ = p/k estimates the Jaccard similarity and
    |A∩B| ≈ p·est(A∪B) DIV k — all integer arithmetic, so an SQL twin
    replays it bit-for-bit.  When the merged sketch is under-full it IS
    the exact union set (both inputs were exact), and every output
    degrades to the exact count.  The seg_a < seg_b pair join is a
    nested loop over |segments| sketch ROWS — bounded by segment
    cardinality, never data volume.

    ``sk`` is a :func:`kmv_fold` result: (seg_col, khashes)."""
    a = sk.select(F.col(seg_col).alias("seg_a"), F.col("khashes").alias("ka"))
    b = sk.select(F.col(seg_col).alias("seg_b"), F.col("khashes").alias("kb"))
    return (
        a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
        .withColumn("m", F.expr(f"slice(array_sort(array_union(ka, kb)), 1, {k})"))
        .withColumn(
            "p",
            F.expr("size(array_intersect(array_intersect(m, ka), kb))").cast(
                "bigint"
            ),
        )
        .select(
            "seg_a",
            "seg_b",
            kmv_estimate(k, "est_a", "ka"),
            kmv_estimate(k, "est_b", "kb"),
            kmv_estimate(k, "est_union", "m"),
            "p",
            F.expr(f"size(m) < {k}").alias("_uf"),
        )
        .select(
            "seg_a",
            "seg_b",
            "est_a",
            "est_b",
            "est_union",
            F.expr(
                f"CAST(CASE WHEN _uf THEN p ELSE p * est_union DIV {k} END AS BIGINT)"
            ).alias("est_inter"),
        )
    )


def kmv_oracle_sql(
    k: int,
    hash_sql: str,
    from_sql: str,
    group_sql: list[str] | None = None,
    alias: str = "est_distinct",
) -> str:
    """DuckDB twin of fold+estimate: same md5-prefix hash, row_number
    cutoff at k, same integer division.  ``group_sql`` columns are carried
    through under their own names."""
    num = (k - 1) * HASH_SPACE
    gs = group_sql or []
    sel = (", ".join(gs) + ", ") if gs else ""
    part = ("PARTITION BY " + ", ".join(gs)) if gs else ""
    grp = ("GROUP BY " + ", ".join(gs)) if gs else ""
    return f"""
WITH h AS (SELECT DISTINCT {sel}{hash_sql} AS h {from_sql}),
r AS (SELECT {sel}h, row_number() OVER ({part} ORDER BY h) AS rn FROM h),
s AS (SELECT {sel}COUNT(*) AS n,
             MAX(CASE WHEN rn = {k} THEN h END) AS hk
      FROM r WHERE rn <= {k} {grp})
SELECT {sel}CAST(CASE WHEN n < {k} THEN n ELSE {num} // NULLIF(hk, 0) END AS BIGINT)
       AS {alias} FROM s
"""
