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


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(assets: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize image payloads to (width, height) via Arrow-batched mapInPandas.

    The pixel work is stubbed (no codec libs in this container): the fake
    produces a deterministic payload of ``width*height//64`` digest-derived
    bytes so tests can pin batch shape, null passthrough, and output schema.
    A real build calls Pillow/libvips inside the same batch loop.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        size = max(1, width * height // 64)
        rows: list[tuple[int, int | None, int | None, bytes | None]] = []
        for pdf in it:
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    rows.append((asset_id, None, None, None))
                    continue
                fake = (hashlib.md5(bytes(payload)).digest() * (size // 16 + 1))[:size]
                rows.append((asset_id, width, height, fake))
            yield pd.DataFrame(rows, columns=["asset_id", "width", "height", "payload"])
            rows = []

    return assets.mapInPandas(batches, RESIZED_SCHEMA)


def extract_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction template: payload → float vector (fake encoder).

    The deterministic fake maps each digest byte to [0, 1); a real build
    swaps in an ONNX/torch encoder inside the same Arrow batch loop —
    the operator shape (schema ``asset_id, embedding array<float>``,
    batch-wise vectorization, no shuffle) is what matters at scale.
    """
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    out.append((asset_id, None))
                    continue
                d = hashlib.md5(bytes(payload)).digest()
                vec = [(d[i % 16]) / 255.0 for i in range(dim)]
                out.append((asset_id, vec))
            yield pd.DataFrame(out, columns=["asset_id", "embedding"])

    return assets.mapInPandas(batches, schema)


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
