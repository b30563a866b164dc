"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as ``binary``
columns with typed metadata structs, processed by Arrow-batched Pandas
functions over ``mapInPandas`` (never row-at-a-time Python UDFs).  The
reference has no media columns, so this module is a pure extension
(BASELINE.json north star).

The decode/resize/frame-sample steps need codec libraries that are not in
this container, so they are STUBBED: each has the real Spark plumbing
(schema, batching, partition behavior) and a deterministic fake used by
tests, with the codec call isolated behind ``NotImplementedError``.

Scale notes: mapInPandas streams Arrow batches, so payloads never
materialize on the driver; per-batch work is embarrassingly parallel with
no shuffle.  Payload columns should live in their own parquet files
(column pruning means metadata-only queries never read the bytes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

# Canonical layout for a multimodal asset column.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

METADATA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def text_as_assets(df: DataFrame, id_col: str, text_col: str, mime: str = "text/plain") -> DataFrame:
    """Adapt a text table into the asset layout (UTF-8 bytes as payload).

    ``F.encode`` runs JVM-side, so building the binary column costs no
    Python round-trip; real pipelines read payloads straight from parquet
    ``binary`` columns instead.
    """
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(mime).alias("mime"),
    )


def extract_metadata(assets: DataFrame) -> DataFrame:
    """Byte length + MD5 digest per asset via Arrow-batched mapInPandas.

    This is the template every media feature-extractor follows: iterate
    Arrow batches, vectorize per-batch, yield frames with a pinned schema.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payload = pdf["payload"]
            yield pdf.assign(
                n_bytes=payload.map(lambda b: len(b) if b is not None else None),
                digest=payload.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                ),
            )[["asset_id", "mime", "n_bytes", "digest"]]

    return assets.mapInPandas(batches, METADATA_SCHEMA)


def decode_image(payload: bytes, mime: str) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    STUB — codec libraries (Pillow/libvips) are not installed here.  The
    Spark-side plumbing that calls this (schema, batching) is real and
    tested via :func:`extract_metadata`-style fakes.
    """
    raise NotImplementedError("image decode requires a codec library (Pillow/libvips)")


def sample_frames(assets: DataFrame, every_nth: int = 30) -> DataFrame:
    """Explode video payloads into sampled frames (1 row per kept frame).

    The container demuxer is stubbed; the operator shape — mapInPandas
    producing a one-to-many FRAME_SCHEMA output, partitioned by asset so
    frames of one video stay together — is the real design.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows: list[tuple[int, int, bytes | None]] = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                # Deterministic fake demuxer: one "frame" per 64-byte slice,
                # keeping every `every_nth`-th.  A real build decodes via
                # PyAV/ffmpeg here.
                n_slices = max(1, len(payload) // 64)
                for i in range(0, n_slices, every_nth):
                    rows.append((asset_id, i, bytes(payload[i * 64 : (i + 1) * 64])))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_index", "frame"])

    return assets.repartition("asset_id").mapInPandas(batches, FRAME_SCHEMA)
