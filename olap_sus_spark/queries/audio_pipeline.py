"""Audio pipeline parity queries: real WAV payloads, real RIFF parsing.

Same end-to-end discipline as ``multimodal_pipeline``: each document
becomes a GENUINE PCM16 WAV container (44-byte RIFF header + samples),
built entirely JVM-side (hex assembly + ``unhex`` — Catalyst expressions,
zero Python in the encode path), then ``operators/audio.py`` walks the
RIFF chunks and decodes the samples inside Arrow-batched ``mapInPandas``.
The waveform is a deterministic function of ``doc_id``, so DuckDB can
recompute every feature from arithmetic ground truth — the oracle verifies
the whole binary round-trip (little-endian chunk sizes, two's-complement
int16 encoding, sample order), not just the stats math.

Waveform per document (all integer, int16-safe):

    n    = 64 + doc_id % 193          (samples, 64..256)
    step = 1 + doc_id % 7
    v(i) = ((doc_id*131 + i*step) % 2001) - 1000      for i in [0, n)

a mod-2001 sawtooth: slow ramps with sign flips at the wrap and at the
zero boundary — non-trivial zero-crossing and per-frame energy structure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_sus_spark.catalog import load_table
from olap_sus_spark.operators.audio import frame_energy, wav_features
from olap_sus_spark.registry import register

_RATE = 8000  # Hz, mono PCM16 → byte rate 16000, block align 2

# Static header pieces (little-endian fields pre-encoded as hex):
#   RIFF ....sz.... WAVE  fmt_ sz=16  pcm=1 ch=1  rate=8000  byterate block bits
_FMT_HEX = (
    "57415645"  # "WAVE"
    "666D7420" + "10000000"  # "fmt ", size 16
    "0100" + "0100"  # PCM, mono
    "401F0000" + "803E0000"  # 8000 Hz, 16000 B/s
    "0200" + "1000"  # block align 2, 16 bits
    "64617461"  # "data"
)


def _u16le(c: Column) -> Column:
    be = F.lpad(F.hex(c), 4, "0")
    return F.concat(F.substring(be, 3, 2), F.substring(be, 1, 2))


def _u32le(c: Column) -> Column:
    be = F.lpad(F.hex(c), 8, "0")
    return F.concat(
        F.substring(be, 7, 2), F.substring(be, 5, 2),
        F.substring(be, 3, 2), F.substring(be, 1, 2),
    )


def synth_wav_assets(docs: DataFrame) -> DataFrame:
    """documents → (asset_id, payload: binary) of real PCM16 WAV files."""
    n = F.col("doc_id") % 193 + 64
    step = F.col("doc_id") % 7 + 1
    # int16 two's complement, little-endian, one 4-hex-char slot per sample
    sample_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: _u16le(
                ((F.col("doc_id") * 131 + i * step) % 2001 - 1000 + 65536) % 65536
            ),
        ),
        "",
    )
    payload_hex = F.concat(
        F.lit("52494646"),  # "RIFF"
        _u32le(n * 2 + 36),  # riff payload size
        F.lit(_FMT_HEX),
        _u32le(n * 2),  # data chunk size
        sample_hex,
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"), F.unhex(payload_hex).alias("payload")
    )


# Shared oracle scaffolding: expand the arithmetic waveform per document.
_WAVE_CTE = """
WITH d AS (
    SELECT doc_id,
           64 + doc_id % 193 AS n,
           1 + doc_id % 7 AS step
    FROM documents
),
s AS (
    SELECT d.doc_id, d.n, i.i,
           ((d.doc_id * 131 + i.i * d.step) % 2001) - 1000 AS v
    FROM d CROSS JOIN range(0, 256) i(i)
    WHERE i.i < d.n
)
"""

_WAV_FEATURES_ORACLE = _WAVE_CTE + """
, z AS (
    SELECT doc_id, n, i, v,
           LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
    FROM s
)
SELECT doc_id AS asset_id,
       8000 AS sample_rate,
       1 AS n_channels,
       CAST(MAX(n) AS BIGINT) AS n_samples,
       CAST(MAX(n) * 125 AS BIGINT) AS duration_us,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CAST(COUNT(*) FILTER (
           WHERE pv IS NOT NULL AND (v < 0) <> (pv < 0)) AS BIGINT
       ) AS zero_crossings,
       CAST(MAX(ABS(v)) AS INT) AS peak_abs,
       CAST(MAX(CASE WHEN i = 0 THEN v END) AS INT) AS first_sample,
       CAST(MAX(CASE WHEN i = n - 1 THEN v END) AS INT) AS last_sample
FROM z
GROUP BY doc_id
"""


@register("audio_wav_features", oracle=_WAV_FEATURES_ORACLE)
def audio_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container → features round-trip: encode JVM-side, decode in Arrow
    batches, verify against arithmetic ground truth.  Shuffle-free: one
    narrow pass, features leave the executor as ~60-byte rows however large
    the audio payloads are."""
    docs = load_table(spark, sf_dir, "documents")
    return wav_features(synth_wav_assets(docs))


_FRAME = 64  # analysis frame (samples); 64..256-sample assets → 1..4 frames

_FRAME_ENERGY_ORACLE = _WAVE_CTE + f"""
SELECT doc_id AS asset_id,
       CAST(i // {_FRAME} AS BIGINT) AS frame_idx,
       CAST(COUNT(*) AS BIGINT) AS n_in_frame,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq
FROM s
GROUP BY doc_id, i // {_FRAME}
"""


@register("audio_frame_energy", oracle=_FRAME_ENERGY_ORACLE)
def audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Short-time energy explode: each asset → ceil(n/64) frame rows, the
    per-frame reduction fully inside the executor-side numpy fold (cumsum
    difference), emitting integers, never samples."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_energy(synth_wav_assets(docs), frame=_FRAME)
