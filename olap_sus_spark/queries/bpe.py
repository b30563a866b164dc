"""BPE tokenizer training: learn byte-pair merges from the corpus.

The tokenizer-induction step of an LLM data pipeline.  Like every real BPE
trainer (sentencepiece, GPT-2's encoder), training runs on the **word
frequency table**, not the raw corpus: one corpus pass collapses text to
(word, count) rows — vocabulary-sized, many orders of magnitude smaller
than the corpus — and each merge iteration is an aggregation over that
table.  At 100 TB the word table is a maintained aggregate (refreshed per
ingest day, etl.refresh_aggregate pattern) and training cost is
independent of corpus size.

Determinism contract (what makes this oracle-able when reference BPE
implementations disagree on ties):

- each word is a symbol string in wrapped form ``(h)(e)(l)(l)(o)`` —
  wrapping every symbol individually means a pair pattern ``(l)(l)``
  shares no delimiter with its neighbors, so the engines' common
  non-overlapping leftmost ``replace`` IS the textbook leftmost-greedy
  BPE merge application (``llll`` → ``ll·ll``, both pairs merged);
- the winning pair per iteration maximizes summed word frequency, ties
  broken by the lexicographically smallest pair (ASCII symbols only:
  identical collation in both engines);
- counts are exact BIGINTs; no floats anywhere.

The registered query returns the first ``_N_MERGES`` learned merges
``(ordinal, sym1, sym2, novo_simbolo, freq)``; the DuckDB oracle unrolls
the identical iterations as a CTE chain, so the driver value-hash gates
the whole training trajectory, not just the final vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators.onecall import inline_rows
from olap_sus_spark.queries.text_pipeline import _TOKENS_SQL
from olap_sus_spark.registry import register

_N_MERGES = 6
_JOIN = "+"  # merged-symbol glue; tokens are [a-z0-9] so it is unambiguous


def _pairs_col(wrapped) -> F.Column:
    """Adjacent symbol pairs of a wrapped string, as ``s1)(s2`` strings."""
    syms = F.split(F.expr(f"substring({wrapped}, 2, length({wrapped}) - 2)"), r"\)\(")
    shifted = F.slice(syms, 2, 1 << 30)
    return F.filter(
        F.zip_with(
            syms,
            shifted,
            lambda a, b: F.when(a.isNull() | b.isNull(), F.lit(None)).otherwise(
                F.concat(a, F.lit(")("), b)
            ),
        ),
        lambda x: x.isNotNull(),
    )


def _pairs_sql(wrapped: str) -> str:
    syms = f"string_split(substr({wrapped}, 2, length({wrapped}) - 2), ')(')"
    return (
        f"CASE WHEN len({syms}) >= 2 THEN "
        f"list_transform(range(1, len({syms})), "
        f"i -> {syms}[i] || ')(' || {syms}[i + 1]) "
        f"ELSE [] END"
    )


def _bpe_oracle(n_merges: int) -> str:
    toks = _TOKENS_SQL.format(t="text")
    parts = [
        f"""
WITH words AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest({toks}) AS w FROM documents WHERE text IS NOT NULL)
    GROUP BY w
),
w0 AS (
    SELECT list_aggregate(
               list_transform(regexp_extract_all(w, '.'), c -> '(' || c || ')'),
               'string_agg', '') AS s,
           freq
    FROM words
)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        parts.append(
            f""",
p{i} AS (
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS freq
    FROM (SELECT unnest({_pairs_sql('s')}) AS pair, freq FROM {prev})
    GROUP BY pair ORDER BY freq DESC, pair LIMIT 1
),
w{i} AS (
    SELECT replace(
               s,
               '(' || pair || ')',
               '(' || replace(pair, ')(', '{_JOIN}') || ')') AS s,
           {prev}.freq
    FROM {prev} CROSS JOIN p{i}
)"""
        )
    selects = [
        f"""SELECT {i} AS ordinal,
       split_part(pair, ')(', 1) AS sym1,
       split_part(pair, ')(', 2) AS sym2,
       replace(pair, ')(', '{_JOIN}') AS novo_simbolo,
       freq
FROM p{i}"""
        for i in range(1, n_merges + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def _learn_merges(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, str, str, str, int]]:
    """Run the merge-learning loop; returns (ordinal, s1, s2, merged, freq)
    rows.  Each iteration is one pair-count aggregation plus a 1-row argmax
    collect (the same driver-decision shape as kmeans' codebook), then a
    narrow per-row ``replace``."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    # The merge loop runs over the VOCAB table (distinct words), which is
    # corpus-size-independent and small (a web-scale corpus has ~10⁷ short
    # distinct words ≈ a few hundred MB — the reason real BPE trainers run
    # the merge loop on one node).  One partition means each of the
    # _N_MERGES rounds is a single-task pipeline instead of 2×|partitions|
    # tasks re-scheduled per round (r10; the corpus-sized word-extraction
    # pass above stays fully parallel — only the bounded vocab coalesces).
    wrapped = words.coalesce(1).select(
        F.array_join(
            F.transform(
                F.expr("regexp_extract_all(w, '.', 0)"),
                lambda c: F.concat(F.lit("("), c, F.lit(")")),
            ),
            "",
        ).alias("s"),
        "freq",
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, str, int]] = []
    cur = wrapped
    for i in range(1, _N_MERGES + 1):
        top = (
            cur.select(F.explode(_pairs_col("s")).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, freq = top[0].pair, top[0].freq
        s1, s2 = pair.split(")(")
        merges.append((i, s1, s2, f"{s1}{_JOIN}{s2}", freq))
        cur = cur.select(
            F.expr(
                "replace(s, '(' || {p} || ')', '(' || {m} || ')')".format(
                    p=_sql_str(pair), m=_sql_str(f"{s1}{_JOIN}{s2}")
                )
            ).alias("s"),
            "freq",
        ).localCheckpoint(eager=False)
    return merges


@register("bpe_learn_merges", oracle=_bpe_oracle(_N_MERGES))
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First {n} BPE merges over the corpus word-frequency table.

    The bounded merge list is emitted by exploding a literal struct array
    over ``spark.range(1)`` instead of ``spark.createDataFrame`` — a
    5-row literal frame costs ~0.5 s of driver round trips (CLAUDE.md
    gotcha), the inline literal is free (r10, guide §5 driver work)."""
    merges = _learn_merges(spark, sf_dir)
    if not merges:
        return spark.createDataFrame(
            [],
            "ordinal int, sym1 string, sym2 string, novo_simbolo string, freq bigint",
        )
    # one-call server-side inline literal (operators/onecall.py): the
    # scalar-lit struct array cost 5 py4j round trips per merge row
    return spark.range(1).select(
        inline_rows(
            merges,
            [
                ("ordinal", "int"),
                ("sym1", "string"),
                ("sym2", "string"),
                ("novo_simbolo", "string"),
                ("freq", "bigint"),
            ],
        )
    )


def _apply_merges_sql_duck(expr: str, n_merges: int) -> str:
    """Nested data-dependent replaces: p{i} CTEs are cross-joined 1-row
    merge choices, so the oracle re-derives the vocabulary itself."""
    out = expr
    for i in range(1, n_merges + 1):
        out = (
            f"replace({out}, '(' || p{i}.pair || ')', "
            f"'(' || replace(p{i}.pair, ')(', '{_JOIN}') || ')')"
        )
    return out


_WRAP_SQL = "regexp_replace(w, '(.)', '(\\1)', 'g')"

_BPE_ENCODE_ORACLE = (
    _bpe_oracle(_N_MERGES).split("\nSELECT 1 AS ordinal")[0]
    + f"""
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_palavras,
       CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT)
           AS n_chars,
       CAST(list_sum(list_transform(ws,
           w -> len(string_split(
               {_apply_merges_sql_duck(_WRAP_SQL, _N_MERGES)},
               ')(')))) AS BIGINT) AS n_bpe_tokens
FROM (SELECT doc_id, {_TOKENS_SQL.format(t='text')} AS ws
      FROM documents WHERE text IS NOT NULL)
CROSS JOIN """
    + " CROSS JOIN ".join(f"p{i}" for i in range(1, _N_MERGES + 1))
    + """
WHERE len(ws) > 0
"""
)


@register(
    "bpe_encode_token_counts",
    oracle=f"""
WITH enc AS ({_BPE_ENCODE_ORACLE})
SELECT doc_id, n_palavras, n_chars, n_bpe_tokens,
       CAST(n_chars AS DOUBLE) / CAST(n_bpe_tokens AS DOUBLE) AS taxa_compressao
FROM enc
""",
)
def bpe_encode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document under the learned BPE vocabulary and report
    per-doc token counts + compression (chars per BPE token).

    The encode itself is COMPLETELY NARROW — zero shuffles: learned merges
    are driver literals (at 100 TB: a maintained vocabulary table, trained
    once per corpus version) and each row applies wrap → K replaces →
    symbol-count inside higher-order functions whose lambdas touch only
    lambda variables (the sliding_concat HOF discipline).  Counts are
    exact BIGINTs; the compression ratio is the single final IEEE division.
    """
    merges = _learn_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())

    def encode_count(w):
        s = F.regexp_replace(w, "(.)", "($1)")
        for _, s1, s2, merged, _freq in merges:
            s = F.replace(
                s, F.lit(f"({s1})({s2})"), F.lit(f"({merged})")
            )
        return F.size(F.split(s, r"\)\("))

    ws = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    out = docs.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_palavras"),
        F.aggregate(
            F.transform(ws, lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("n_chars"),
        F.aggregate(
            F.transform(ws, lambda w: encode_count(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("n_bpe_tokens"),
    ).filter(F.col("n_palavras") > 0)
    return out.select(
        "*",
        (
            F.col("n_chars").cast("double") / F.col("n_bpe_tokens").cast("double")
        ).alias("taxa_compressao"),
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"
