"""Count-Min frequency sketch with exact, engine-portable arithmetic — the
frequency twin of the KMV distinct sketch (operators/sketches.py).

CMS (Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications", J. Algorithms 2005): a depth×width
counter grid; item x adds its weight to slot h_j(x) of every row j, and the
point estimate for x is min_j grid[j][h_j(x)] — always ≥ the true count,
and within ε·N (ε = e/width) with probability 1 − e^(−depth).

Representation here is RELATIONAL, not an array blob: the sketch is a
DataFrame of (j, slot, cnt) rows — only touched slots materialise, the
whole grid is bounded by depth·width rows, and merging sketches (across
days, shards, engines) is a plain additive GROUP BY.  That additivity is
what makes CMS warehouse-shaped: per-day partials sum to exactly the
global sketch, so a maintained partial table refreshes O(day) and serves
point-frequency queries with no fact scan (queries/cms.py).

All arithmetic is integer (md5-prefix row hashes, modulo, SUM, MIN) so a
DuckDB oracle replays the entire construction bit-for-bit — same reason
KMV was chosen over the opaque datasketches HLL binary.

Scale shape: the build explodes depth rows per input row BUT feeds them
straight into a partial (map-side) aggregation whose key space is at most
depth·width — the shuffle carries ≤ depth·width rows per mapper no matter
how many facts were scanned.  The estimate joins candidates against the
≤ depth·width-row sketch (broadcast), never against the facts.

No counterpart in the reference (its summaries are exact GROUP BYs); this
extends the approximate family alongside kmv_* (distinct counts) with
point frequencies / heavy hitters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4


def _slot(j: str, key: str, width: int):
    """Row-j slot of a key: 48-bit md5-prefix hash of "j:key", mod width.
    `CAST(x AS STRING)` renders BIGINT keys exactly as DuckDB's
    CAST(x AS VARCHAR), so both engines land every item in the same slot —
    including NULL keys: `concat` (unlike `concat_ws`) propagates NULL the
    way SQL `||` does, so a NULL key gets a NULL slot on BOTH engines and
    falls out of the slot equi-joins identically instead of hashing as the
    bare row index on one side only."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(j).cast("string"), F.lit(":"), F.col(key).cast("string")
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    return h % width


def cms_build(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    weight: str | None,
    depth: int,
    width: int,
) -> DataFrame:
    """Fold (group cols, key, weight) rows into per-group CMS grids.

    Returns (group cols..., j, slot, cnt) with at most depth·width rows
    per group.  ``weight=None`` counts occurrences.  The explode-by-depth
    happens AFTER projecting to (key, weight) only, and the groupBy's
    map-side combine caps what reaches the shuffle at depth·width rows per
    task regardless of input volume."""
    w = F.col(weight) if weight else F.lit(1)
    rows = df.select(
        *group_cols,
        F.col(key).alias("_k"),
        w.cast("bigint").alias("_w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    )
    return (
        rows.withColumn("slot", _slot("j", "_k", width))
        .groupBy(*group_cols, "j", "slot")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key: str,
    depth: int,
    width: int,
    alias: str = "est",
) -> DataFrame:
    """Point-frequency estimates for every candidate key: min over the
    depth rows of the key's slot counters.  Absent slots count 0, so an
    unseen key estimates 0 whenever at least one of its slots was never
    touched (the usual case in a non-saturated grid); if every slot
    collides with inserted mass it gets the standard one-sided CMS
    overestimate — never an undercount, but not exact-zero.

    ``sketch`` is a :func:`cms_build` result (ungrouped: j, slot, cnt);
    ``candidates`` carries one row per key to probe — a dimension table,
    never the facts.  The join broadcasts the ≤ depth·width-row sketch."""
    probes = candidates.select(
        F.col(key),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    ).withColumn("slot", _slot("j", key, width))
    return (
        probes.join(F.broadcast(sketch), ["j", "slot"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias(alias))
    )


def cms_oracle_sql(
    depth: int,
    width: int,
    key_sql: str,
    from_sql: str,
    cand_sql: str,
    key_alias: str,
    alias: str = "est",
    weight_sql: str = "1",
) -> str:
    """DuckDB twin of build+estimate: same md5-prefix row hashes, same
    modulo, same additive fold, same min-over-rows — bit-identical.
    ``cand_sql`` is a SELECT producing one column named ``k``;
    ``key_sql``/``weight_sql`` are expressions over ``from_sql``; the
    output key column is renamed to ``key_alias`` to match the Spark side."""
    return f"""
WITH src AS (SELECT {key_sql} AS k, CAST({weight_sql} AS BIGINT) AS w {from_sql}),
rows_j AS (SELECT k, w, j FROM src CROSS JOIN range(0, {depth}) t(j)),
sk AS (SELECT j,
              CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 12)) AS BIGINT) % {width} AS slot,
              SUM(w) AS cnt
       FROM rows_j GROUP BY 1, 2),
cand AS ({cand_sql}),
probes AS (SELECT c.*, t.j,
                  CAST(concat('0x', substr(md5(CAST(t.j AS VARCHAR) || ':' || CAST(c.k AS VARCHAR)), 1, 12)) AS BIGINT) % {width} AS slot
           FROM cand c CROSS JOIN range(0, {depth}) t(j))
SELECT p.k AS {key_alias}, CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS {alias}
FROM probes p LEFT JOIN sk ON sk.j = p.j AND sk.slot = p.slot
GROUP BY p.k
"""
