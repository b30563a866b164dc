"""Full-text relevance search: BM25 scoring over the documents corpus.

The retrieval-side complement of the corpus-prep family (tfidf_top_terms
gives per-document characteristic terms; this ranks documents for a
query).  Okapi BM25 with k1 = 6/5, b = 3/4 — the textbook constants as
exact rationals, which lets the whole score be computed from integer
corpus statistics with a FIXED number of IEEE double operations:

    idf(t)     = (2N − 2·df + 1) / (2·df + 1)          -- linear idf twin of
                                                          log((N−df+.5)/(df+.5))
    lennorm(t) = 44·tf·S / (20·tf·S + 6·S + 18·dl·N)   -- tf·(k1+1) over
                                                          tf + k1(1−b+b·dl/avgdl),
                                                          cleared of fractions
                                                          (avgdl = S/N)
    score(t)   = idf(t) · lennorm(t)
    total      = (s₁ + s₂) + s₃                         -- fixed association

Every numerator/denominator is an exact BIGINT (products stay < 2⁶³ past
×100 scale); each division and the final multiply/adds are single IEEE ops
on identical inputs in both engines, so the driver's value hash gates the
scores bit-exactly — the same exactness discipline as tfidf/quantize
(queries/_util.py).

Scale shape: term stats (df per query term, N, S) collapse to a ONE-ROW
broadcast; per-document work is one explode + one filtered aggregation on
``doc_id`` — the only shuffle.  At 100 TB the df/N/S statistics become a
maintained table refreshed per ingest day (the etl.refresh_aggregate
pattern); the per-query probe cost is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators import text as tx
from olap_sus_spark.registry import register

_QUERY_TERMS = ("window", "stream", "hash")
_TOP_K = 20


def _score_topk(scored: DataFrame) -> DataFrame:
    """Shared scoring tail: fixed-association total, then top-k via
    orderBy+limit (plans as TakeOrderedAndProject — per-partition partial
    top-k, only k rows reach the merge) and rank the k-row result — never
    a whole-corpus single-partition window."""
    t1, t2, t3 = _QUERY_TERMS
    totaled = scored.select(
        "*",
        (
            (F.col(f"score_{t1}") + F.col(f"score_{t2}")) + F.col(f"score_{t3}")
        ).alias("score"),
    )
    topk = totaled.orderBy(F.col("score").desc(), F.col("doc_id")).limit(_TOP_K)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))

_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _score_sql(term: str, tf: str) -> str:
    """Per-term BM25 score; ``tf`` is a SQL expression for the (possibly
    NULL) term frequency, dl/N/S/df_{term} in scope."""
    return f"""
        CASE WHEN {tf} IS NULL THEN 0.0 ELSE
            (CAST(2 * n_docs - 2 * df_{term} + 1 AS DOUBLE)
             / CAST(2 * df_{term} + 1 AS DOUBLE))
            * (CAST(44 * {tf} * s_tokens AS DOUBLE)
               / CAST(20 * {tf} * s_tokens + 6 * s_tokens
                      + 18 * dl * n_docs AS DOUBLE))
        END
    """


def _bm25_oracle() -> str:
    t1, t2, t3 = _QUERY_TERMS
    score_cols = ",\n".join(
        f"           {_score_sql(t, f'tf_{t}')} AS score_{t}" for t in _QUERY_TERMS
    )
    return f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
toks AS (SELECT doc_id, {_TOKS} AS ts FROM docs),
dl AS (SELECT doc_id, len(ts) AS dl FROM toks),
corpus AS (
    SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS s_tokens FROM dl
),
terms AS (SELECT doc_id, unnest(ts) AS term FROM toks),
tf AS (
    SELECT doc_id,
           MAX(CASE WHEN term = '{t1}' THEN tf END) AS tf_{t1},
           MAX(CASE WHEN term = '{t2}' THEN tf END) AS tf_{t2},
           MAX(CASE WHEN term = '{t3}' THEN tf END) AS tf_{t3}
    FROM (SELECT doc_id, term, COUNT(*) AS tf FROM terms
          WHERE term IN ('{t1}', '{t2}', '{t3}') GROUP BY doc_id, term)
    GROUP BY doc_id
),
df AS (
    SELECT CAST(COUNT(DISTINCT CASE WHEN term = '{t1}' THEN doc_id END) AS BIGINT) AS df_{t1},
           CAST(COUNT(DISTINCT CASE WHEN term = '{t2}' THEN doc_id END) AS BIGINT) AS df_{t2},
           CAST(COUNT(DISTINCT CASE WHEN term = '{t3}' THEN doc_id END) AS BIGINT) AS df_{t3}
    FROM terms WHERE term IN ('{t1}', '{t2}', '{t3}')
),
scored AS (
    SELECT tf.doc_id,
           CAST(tf_{t1} IS NOT NULL AS INT) + CAST(tf_{t2} IS NOT NULL AS INT)
                + CAST(tf_{t3} IS NOT NULL AS INT) AS n_hit_terms,
{score_cols}
    FROM tf
    JOIN dl USING (doc_id)
    CROSS JOIN corpus
    CROSS JOIN df
),
totaled AS (
    SELECT doc_id, n_hit_terms,
           score_{t1}, score_{t2}, score_{t3},
           (score_{t1} + score_{t2}) + score_{t3} AS score
    FROM scored
),
ranked AS (
    SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
    FROM totaled
)
SELECT * FROM ranked WHERE rank <= {_TOP_K}
"""


@register("bm25_search_topk", oracle=_bm25_oracle())
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} documents for the fixed 3-term query, full BM25.

    Corpus stats (N, S, per-term df) fold into a 1-row broadcast; the
    doc-side is one explode filtered to the query terms before the
    aggregation, so the shuffled volume is O(matching postings), not
    O(corpus tokens).  Ties break by doc_id.
    """
    t1, t2, t3 = _QUERY_TERMS
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select("doc_id", tx.tokens("text").alias("ts"))
    dl = toks.select("doc_id", F.size("ts").cast("bigint").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("bigint").alias("s_tokens"),
    )
    terms = toks.select(
        "doc_id", F.explode("ts").alias("term")
    ).filter(F.col("term").isin(*_QUERY_TERMS))
    tf_long = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf_long.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("tf"))).alias(f"tf_{t}")
            for t in _QUERY_TERMS
        ]
    )
    df_row = terms.agg(
        *[
            F.countDistinct(
                F.when(F.col("term") == t, F.col("doc_id"))
            ).cast("bigint").alias(f"df_{t}")
            for t in _QUERY_TERMS
        ]
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(corpus))
        .join(F.broadcast(df_row))
        .select(
            "doc_id",
            (
                F.col(f"tf_{t1}").isNotNull().cast("int")
                + F.col(f"tf_{t2}").isNotNull().cast("int")
                + F.col(f"tf_{t3}").isNotNull().cast("int")
            ).alias("n_hit_terms"),
            *[
                F.expr(_score_sql(t, f"tf_{t}")).alias(f"score_{t}")
                for t in _QUERY_TERMS
            ],
        )
    )
    return _score_topk(scored)


_PHRASE = ("fast", "table")
_PHRASE_TOP_K = 20

_PHRASE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_TOKS} AS ts FROM documents WHERE text IS NOT NULL
),
tf AS (
    SELECT doc_id,
           CAST(len(list_filter(range(1, len(ts)),
                i -> ts[i] = '{_PHRASE[0]}' AND ts[i + 1] = '{_PHRASE[1]}'))
           AS BIGINT) AS phrase_tf
    FROM toks
),
ranked AS (
    SELECT doc_id, phrase_tf,
           CAST(ROW_NUMBER() OVER (ORDER BY phrase_tf DESC, doc_id) AS INT)
               AS rank
    FROM tf WHERE phrase_tf > 0
)
SELECT * FROM ranked WHERE rank <= {_PHRASE_TOP_K}
"""


def _phrase_topk(p1: DataFrame, p2: DataFrame) -> DataFrame:
    """Adjacency join + top-k tail shared by the from-scratch and indexed
    phrase queries: ``p1``/``p2`` are (doc_id, pos) postings of the two
    phrase terms; a phrase hit is p1.pos + 1 = p2.pos in the same doc, so
    the join shuffles O(query-term postings), never corpus tokens, and the
    top-k plans as TakeOrderedAndProject (per-partition partial top-k)."""
    hits = p1.join(p2.withColumn("pos", F.col("pos") - 1), ["doc_id", "pos"])
    tf = hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("phrase_tf")
    )
    topk = tf.orderBy(F.col("phrase_tf").desc(), "doc_id").limit(_PHRASE_TOP_K)
    w = Window.orderBy(F.col("phrase_tf").desc(), "doc_id")
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


@register("phrase_search_topk", oracle=_PHRASE_ORACLE)
def phrase_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval ("{w1} {w2}" as ADJACENT tokens, not
    substring matching): top-k documents by phrase frequency.  One
    tokenize+posexplode pass filtered to the two phrase terms BEFORE any
    exchange; the adjacency equi-join on (doc_id, pos) is the classic
    positional-postings intersection — shuffled volume is O(postings of
    the query terms).  The oracle counts the same matches as bigram
    equalities over the token list; ties break by doc_id."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pos = (
        docs.select("doc_id", tx.tokens("text").alias("ts"))
        .select("doc_id", F.posexplode("ts").alias("pos", "term"))
        .filter(F.col("term").isin(*_PHRASE))
    )
    p1 = pos.filter(F.col("term") == _PHRASE[0]).select("doc_id", "pos")
    p2 = pos.filter(F.col("term") == _PHRASE[1]).select("doc_id", "pos")
    return _phrase_topk(p1, p2)


@register("phrase_search_indexed", oracle=_PHRASE_ORACLE)
def phrase_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same phrase query served from the MAINTAINED positional inverted
    index: one footer-pruned postings read for the two phrase terms,
    positions exploded back to (doc_id, pos) and intersected — the
    deployment path, O(query-term postings) with no corpus access.
    Shares the from-scratch oracle, which IS the maintained == recomputed
    proof (same contract as bm25_search_indexed)."""
    from olap_sus_spark.operators.inverted import load_or_build_inverted_index

    postings, _ = load_or_build_inverted_index(spark, sf_dir)
    hits = postings.filter(F.col("term").isin(*_PHRASE)).select(
        "doc_id", "term", F.explode("positions").alias("pos")
    )
    p1 = hits.filter(F.col("term") == _PHRASE[0]).select("doc_id", "pos")
    p2 = hits.filter(F.col("term") == _PHRASE[1]).select("doc_id", "pos")
    return _phrase_topk(p1, p2)


@register("bm25_search_indexed", oracle=_bm25_oracle())
def bm25_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query over the MAINTAINED inverted index
    (operators/inverted.py): the serving path a deployment actually runs.

    One footer-pruned postings read for the three query terms yields both
    the per-doc tf/dl rows AND (row counts — postings are unique per
    (doc, term)) the per-term document frequencies; corpus N/S fold from
    the per-src stat partials (#part-files rows).  All stored measures are
    exact BIGINTs, so scores are bit-identical to the from-scratch path —
    this query shares bm25_search_topk's from-scratch DuckDB oracle, which
    IS the maintained == recomputed proof the driver gates on.
    """
    from olap_sus_spark.operators.inverted import load_or_build_inverted_index

    t1, t2, t3 = _QUERY_TERMS
    postings, doc_stats = load_or_build_inverted_index(spark, sf_dir)
    hits = postings.filter(F.col("term").isin(*_QUERY_TERMS))
    corpus = doc_stats.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("s_tokens").cast("bigint").alias("s_tokens"),
    )
    df_row = hits.agg(
        *[
            F.count(F.when(F.col("term") == t, F.lit(1)))
            .cast("bigint")
            .alias(f"df_{t}")
            for t in _QUERY_TERMS
        ]
    )
    tf = hits.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("tf"))).alias(f"tf_{t}")
            for t in _QUERY_TERMS
        ],
        F.max("dl").alias("dl"),
    )
    scored = (
        tf.join(F.broadcast(corpus))
        .join(F.broadcast(df_row))
        .select(
            "doc_id",
            (
                F.col(f"tf_{t1}").isNotNull().cast("int")
                + F.col(f"tf_{t2}").isNotNull().cast("int")
                + F.col(f"tf_{t3}").isNotNull().cast("int")
            ).alias("n_hit_terms"),
            *[
                F.expr(_score_sql(t, f"tf_{t}")).alias(f"score_{t}")
                for t in _QUERY_TERMS
            ],
        )
    )
    return _score_topk(scored)
