"""Statistical language-model quality scoring (CCNet-style filtering).

The corpus-prep step the web-scale pipelines run between heuristic quality
features and dedup: train an n-gram LM on the corpus, score every document
by how predictable its text is under the model, and flag the low-fluency
tail (boilerplate, lorem-ipsum, OCR noise score low; fluent prose scores
high).  The reference engine has no text surface — this extends the
LLM-data-pipeline family (SURVEY.md §2 extensions).

Exactness discipline (queries/_util.py): transition probabilities are kept
in **integer micro-probability units** — ``(1e6·c(bigram)) div c(prefix)``
is exact BIGINT arithmetic, per-document sums of BIGINTs are
order-independent, and only the final per-row division converts to double
(one IEEE op on identical operands in both engines).  A float log-prob sum
would be partition-order-dependent and could never be value-hash gated.

Scale shape: the bigram model is two corpus-grain aggregations (map-side
combined) producing a bg-grain table — at 100 TB a maintained table
refreshed per ingest day (etl.refresh_aggregate pattern), exactly like the
inverted index's postings.  Scoring is one join of (doc, bigram, tf)
instances against the bg-grain model — shuffle volume is O(distinct
(doc, bigram) pairs), with the instance grain pre-collapsed before the
join.  No floats cross an aggregation boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators import text as tx
from olap_sus_spark.registry import register
from olap_sus_spark.queries.text_pipeline import _ngrams_expr_sql, _TOKENS_SQL

# Low-fluency flag: average transition probability < 1/50 (0.02), compared
# in cross-multiplied integers so the flag never touches a float.
_LOW_NUM, _LOW_DEN = 1, 50

_NGRAM_LM_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, {_TOKENS_SQL.format(t='text')} AS ts
    FROM documents WHERE text IS NOT NULL
),
inst AS (
    SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest({_ngrams_expr_sql('ts', 2)}) AS bg FROM docs)
    GROUP BY doc_id, bg
),
bg_stats AS (
    SELECT bg, CAST(SUM(tf) AS BIGINT) AS c_bg FROM inst GROUP BY bg
),
pre_stats AS (
    SELECT split_part(bg, ' ', 1) AS prefixo, CAST(SUM(c_bg) AS BIGINT) AS c_pre
    FROM bg_stats GROUP BY 1
),
model AS (
    SELECT bg, (1000000 * c_bg) // c_pre AS microprob
    FROM bg_stats JOIN pre_stats ON split_part(bg, ' ', 1) = prefixo
),
scored AS (
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_bigramas,
           CAST(SUM(tf * microprob) AS BIGINT) AS soma_microprob
    FROM inst JOIN model USING (bg)
    GROUP BY doc_id
)
SELECT doc_id, n_bigramas, soma_microprob,
       CAST(soma_microprob AS DOUBLE)
           / CAST(n_bigramas * 1000000 AS DOUBLE) AS fluencia,
       soma_microprob * {_LOW_DEN} < n_bigramas * 1000000 * {_LOW_NUM}
           AS baixa_fluencia
FROM scored
"""


@register("ngram_lm_fluency", oracle=_NGRAM_LM_ORACLE)
def ngram_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM fluency: average corpus transition
    probability of the document's bigrams, in exact micro-probability
    units, with the low-fluency tail flagged by an integer-only
    cross-multiplied threshold.

    Zero-bigram documents (empty / single-token) drop out — the LM has no
    evidence about them; the heuristic quality battery
    (text_quality_features) covers that tail.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    inst = (
        docs.select(
            "doc_id",
            F.explode(tx.sliding_concat(tx.tokens("text"), 2)).alias("bg"),
        )
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        # The instance grain feeds the model (twice) AND the scoring join;
        # materialize the one tokenize+explode corpus pass instead of
        # letting the optimizer re-derive it three times from the scan.
        .localCheckpoint(eager=False)
    )
    bg_stats = inst.groupBy("bg").agg(F.sum("tf").cast("bigint").alias("c_bg"))
    pre_stats = (
        bg_stats.groupBy(F.substring_index("bg", " ", 1).alias("prefixo"))
        .agg(F.sum("c_bg").cast("bigint").alias("c_pre"))
    )
    model = (
        bg_stats.join(
            pre_stats,
            F.substring_index(F.col("bg"), " ", 1) == F.col("prefixo"),
        )
        .select("bg", F.expr("(1000000 * c_bg) div c_pre").alias("microprob"))
    )
    scored = (
        inst.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigramas"),
            F.sum(F.col("tf") * F.col("microprob")).cast("bigint").alias(
                "soma_microprob"
            ),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigramas",
        "soma_microprob",
        (
            F.col("soma_microprob").cast("double")
            / (F.col("n_bigramas") * F.lit(1000000)).cast("double")
        ).alias("fluencia"),
        (
            F.col("soma_microprob") * F.lit(_LOW_DEN)
            < F.col("n_bigramas") * F.lit(1000000) * F.lit(_LOW_NUM)
        ).alias("baixa_fluencia"),
    )
