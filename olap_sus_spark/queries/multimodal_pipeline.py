"""Multimodal pipeline parity query.

Runs the asset plumbing end-to-end on the ``documents`` table: text →
binary payload (JVM-side encode) → Arrow-batched mapInPandas metadata
extraction.  The metadata (byte length + MD5) is deterministic, so DuckDB
can verify the whole path — proving the binary-column plumbing, not just
the scalar math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators.multimodal import (
    extract_metadata,
    image_dimensions,
    text_as_assets,
)
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


# ---------------------------------------------------------------------------
# Image-dimension extraction, end-to-end with REAL container headers: each
# document becomes a payload with a genuine PNG / GIF / JPEG header (built
# JVM-side — unhex of a computed hex string, width/height derived from
# doc_id), then operators/multimodal.py:parse_image_dimensions reads them
# back byte-by-byte inside Arrow-batched mapInPandas.  DuckDB verifies
# against the arithmetic ground truth, so the whole binary round-trip
# (big-endian u32 PNG, little-endian u16 GIF, marker-walked JPEG SOF0 with
# a preceding APP0 segment to skip) is value-hash-gated.
# ---------------------------------------------------------------------------
_DIMENSIONS_ORACLE = """
SELECT
    doc_id AS asset_id,
    CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
        ELSE 'image/jpeg' END AS mime_detected,
    CAST(1 + doc_id % 640 AS INT) AS width,
    CAST(1 + (doc_id * 7) % 480 AS INT) AS height
FROM documents
"""


def _hex_u32(c):  # big-endian u32 as 8 hex chars
    return F.lpad(F.hex(c), 8, "0")


def _hex_u16be(c):  # big-endian u16 as 4 hex chars
    return F.lpad(F.hex(c), 4, "0")


def _hex_u16le(c):  # little-endian u16: swap the two bytes
    be = _hex_u16be(c)
    return F.concat(F.substring(be, 3, 2), F.substring(be, 1, 2))


@register("multimodal_dimensions", oracle=_DIMENSIONS_ORACLE)
def multimodal_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (F.lit(1) + F.col("doc_id") % 640).cast("int")
    h = (F.lit(1) + (F.col("doc_id") * 7) % 480).cast("int")
    png = F.concat(
        F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        _hex_u32(w),
        _hex_u32(h),
        F.lit("0806000000" + "DEADBEEF"),  # bit depth/color/CRC (unparsed)
    )
    gif = F.concat(
        F.lit("474946383961"),  # "GIF89a"
        _hex_u16le(w),
        _hex_u16le(h),
        F.lit("F70000"),  # GCT flags + background + aspect
    )
    jpeg = F.concat(
        # SOI + APP0(JFIF, 16 bytes — must be length-skipped by the parser)
        F.lit("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00"
              + "0001" + "0001" + "00" + "00"),
        F.lit("FFC0" + "0011" + "08"),  # SOF0, length 17, 8-bit precision
        _hex_u16be(h),
        _hex_u16be(w),
        F.lit("03012200021101031101" + "FFD9"),  # 3 components + EOI
    )
    payload_hex = (
        F.when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, gif)
        .otherwise(jpeg)
    )
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.unhex(payload_hex).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
    return image_dimensions(assets)


# ---------------------------------------------------------------------------
# Binary-content dedup: the multimodal twin of exact text dedup — group by
# md5 of the payload BYTES (images fetched from multiple mirrors/URLs are
# byte-identical far more often than their metadata suggests).  Payloads are
# synthesized with deterministic duplicate groups (5 assets share one blob)
# on both engines; the shuffle moves 16-byte digests, never blobs.
# ---------------------------------------------------------------------------
_BINARY_DEDUP_ORACLE = """
SELECT md5('asset-' || CAST(doc_id // 5 AS VARCHAR)) AS content_hash,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


@register("multimodal_binary_dedup", oracle=_BINARY_DEDUP_ORACLE)
def multimodal_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from olap_sus_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(
            F.concat(F.lit("asset-"), F.expr("CAST(doc_id DIV 5 AS STRING)")),
            "UTF-8",
        ).alias("payload"),
    )
    return exact_dedup(assets, text_col="payload", id_col="asset_id")
