"""Multimodal pipeline parity query.

Runs the asset plumbing end-to-end on the ``documents`` table: text →
binary payload (JVM-side encode) → Arrow-batched mapInPandas metadata
extraction.  The metadata (byte length + MD5) is deterministic, so DuckDB
can verify the whole path — proving the binary-column plumbing, not just
the scalar math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators.multimodal import extract_metadata, text_as_assets
from olap_sus_spark.registry import register

_METADATA_ORACLE = """
SELECT
    doc_id AS asset_id,
    'text/plain' AS mime,
    strlen(text) AS n_bytes,
    md5(text) AS digest
FROM documents
WHERE text IS NOT NULL
"""


@register("multimodal_metadata", oracle=_METADATA_ORACLE)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter("text IS NOT NULL")
    assets = text_as_assets(docs, id_col="doc_id", text_col="text")
    return extract_metadata(assets)
