"""Bloom-filtered semi-join: prune a fact scan with a compact bitmap of
the build-side keys BEFORE any join or shuffle, then restore exactness
with the real (broadcast) semi-join over the survivors.

This is the runtime-filter technique warehouse engines apply to
selective star joins: at 100 TB the win is that the probe side drops
non-matching rows AT THE SCAN (a narrow per-row expression, no exchange),
so the downstream join/shuffle sees orders of magnitude fewer rows.
False positives are harmless — the exact semi-join after the bloom
removes them — so the final result is bit-identical to the plain
semi-join, which is exactly what the DuckDB oracle checks (the oracle
never needs to replay the bloom).

Construction is deterministic double hashing (h_i = h1 + i·h2 mod m,
the standard Kirsch–Mitzenmacher scheme) over ``xxhash64`` — the bloom
is engine-INTERNAL (no oracle ever replays it; exactness comes from the
final join), so it uses the cheapest whole-stage-codegen hash Spark
has, not the portable-but-heavy md5 of the sketch family: with md5 the
probe expression cost exceeded the entire broadcast hash join it was
meant to assist (13.6 s vs 1.3 s at the ×100 facts probe).  Bitmap
sized m = next_pow2(16·n) for k = 4 probes (≈ 1/16 load → FP rate
≈ (1 − e^{−kn/m})^k < 1%).  The bitmap folds distributedly —
positions → per-word bit_or — and only the ≤ m/32-row word table is
collected (bounded driver literal, same contract as the k-means
codebooks and dim maps)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olap_sus_spark.operators.onecall import lit_bigints

_K = 4  # probes per key


def _h1h2(col: str) -> tuple[Column, Column]:
    """Two independent non-negative hashes from seeded xxhash64 (JVM
    whole-stage codegen — the probe must be cheaper than the join it
    prunes)."""
    h1 = F.pmod(F.xxhash64(F.col(col)), F.lit(1 << 40)).cast("bigint")
    h2 = F.pmod(F.xxhash64(F.col(col), F.lit(7)), F.lit(1 << 40)).cast("bigint")
    # odd h2 so the double-hash probes cycle through a power-of-two m
    return h1, h2 * 2 + 1


def bloom_bits(keys: DataFrame, key_col: str, m: int) -> list[int]:
    """Fold the build side into an m-bit bloom bitmap; returns the
    m/32-word table (index-ordered, 32-bit words so every mask fits
    comfortably in BIGINT arithmetic).  Distributed: each key explodes
    to its _K probe positions, words fold with bit_or at word grain;
    only the bounded word table reaches the driver."""
    h1, h2 = _h1h2(key_col)
    pos = keys.select(
        F.explode(
            F.array(*[((h1 + F.lit(i) * h2) % m).alias(f"p{i}") for i in range(_K)])
        ).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 32).cast("int").alias("w"),
            # pyspark's shiftleft() only takes a literal count; the SQL
            # form shifts by an expression (pos exists as a real column)
            F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    table = [0] * (m // 32)
    for r in words.collect():
        table[r["w"]] = r["word"]
    return table


_POW2 = [1 << b for b in range(32)]


def might_contain(col: str, table: list[int], m: int) -> Column:
    """Per-row bloom membership test against the literal word table —
    a narrow expression (no join, no exchange) that evaluates at the
    scan, which is the whole point.  Bit masks come from a 32-entry
    power-of-two literal array, so no shift-by-column is needed and
    every operand stays in exact BIGINT range."""
    h1, h2 = _h1h2(col)
    # one-call server-side literals (operators/onecall.py) — F.lit(list)
    # expands client-side to |table| scalar-lit py4j round trips; explicit
    # BIGINT elements keep the docstring's exact-BIGINT-range invariant
    # enforced by construction (the old lit(list) inferred array<int> when
    # every word happened to fit int32 — ADVICE r10)
    words = lit_bigints(int(w) for w in table)
    pow2 = lit_bigints(int(v) for v in _POW2)
    out = None
    for i in range(_K):
        pos = (h1 + F.lit(i) * h2) % m
        word = F.element_at(words, (pos / 32).cast("int") + 1)
        mask = F.element_at(pow2, (pos % 32).cast("int") + 1)
        check = word.bitwiseAND(mask) != 0
        out = check if out is None else (out & check)
    return out


def bloom_size(n: int) -> int:
    """m = next power of two ≥ max(1024, 16·n) — 1/16 load at k=4."""
    m = 1024
    while m < 16 * max(n, 1):
        m *= 2
    return m


def bloom_semi_join(fact: DataFrame, fact_key: str, keys: DataFrame, key_col: str) -> DataFrame:
    """Exact semi-join of ``fact`` against ``keys``, bloom-pruned at the
    scan: rows failing the bitmap test never reach the broadcast join.
    The count() sizing action runs on the (small) build side only."""
    n = keys.count()
    m = bloom_size(n)
    table = bloom_bits(keys, key_col, m)
    pruned = fact.filter(might_contain(fact_key, table, m))
    build = keys.select(F.col(key_col).alias(fact_key)).distinct()
    return pruned.join(F.broadcast(build), fact_key, "left_semi")
