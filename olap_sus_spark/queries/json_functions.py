"""JSON scalar functions (engine extension — the reference has none,
SURVEY.md §2.8, but semi-structured props columns are standard in event
pipelines).  Both path extraction (get_json_object) and full schema parsing
(from_json) are covered against DuckDB's JSON functions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.registry import register

_JSON_ORACLE = """
SELECT
    event_type,
    COUNT(*) AS n_eventos,
    CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS soma_k,
    MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


@register("json_extract_aggregate", oracle=_JSON_ORACLE)
def json_extract_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-extract a JSON property column and aggregate it."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eventos"),
        F.sum(k).alias("soma_k"),
        F.max(k).alias("max_k"),
    )


_FROM_JSON_ORACLE = """
SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
FROM events
WHERE CAST(json_extract(props, '$.k') AS INT) > 90
"""


@register("json_schema_parse", oracle=_FROM_JSON_ORACLE)
def json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed parse with a declared schema (from_json) + pushdown filter."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json(F.col("props"), "k int").alias("p")
    ).select("event_id", F.col("p.k").alias("k"))
    return parsed.filter(F.col("k") > 90)
