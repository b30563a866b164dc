"""Unit tests for the WAV codec (operators/audio.py): cross-checks against
the stdlib ``wave`` module, hostile-payload rejection, and exactness of the
integer feature math."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from olap_sus_spark.operators.audio import (
    _stats,
    frame_energy,
    parse_wav,
    wav_encode,
    wav_features,
)

RNG = np.random.default_rng(421)


def _stdlib_wav(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_parse_agrees_with_stdlib_wave_writer():
    samples = RNG.integers(-32768, 32768, size=1000, dtype=np.int16)
    parsed = parse_wav(_stdlib_wav(samples, 16000))
    assert parsed is not None
    assert parsed["sample_rate"] == 16000
    assert parsed["n_channels"] == 1
    assert parsed["bits"] == 16
    np.testing.assert_array_equal(parsed["samples"], samples)


def test_stdlib_wave_reads_our_encoder():
    samples = RNG.integers(-32768, 32768, size=777, dtype=np.int16)
    with wave.open(io.BytesIO(wav_encode(samples, 8000)), "rb") as w:
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        got = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    np.testing.assert_array_equal(got, samples)


def test_roundtrip_stereo():
    samples = RNG.integers(-32768, 32768, size=600, dtype=np.int16)
    parsed = parse_wav(wav_encode(samples, 44100, n_channels=2))
    assert parsed["n_channels"] == 2
    assert parsed["sample_rate"] == 44100
    np.testing.assert_array_equal(parsed["samples"], samples)


def test_odd_sized_metadata_chunk_is_padded_over():
    """RIFF rule: an odd-sized chunk is followed by a pad byte — a parser
    that forgets the pad misreads every later chunk id."""
    samples = np.arange(10, dtype=np.int16)
    base = wav_encode(samples, 8000)
    # splice an odd-length LIST chunk between "WAVE" and "fmt "
    odd = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    hacked = base[:12] + odd + base[12:]
    hacked = hacked[:4] + (len(hacked) - 8).to_bytes(4, "little") + hacked[8:]
    parsed = parse_wav(hacked)
    assert parsed is not None
    np.testing.assert_array_equal(parsed["samples"], samples)


@pytest.mark.parametrize(
    "payload",
    [
        None,
        b"",
        b"RIFF",
        b"RIFX" + bytes(40),  # wrong magic
        b"RIFF" + (100).to_bytes(4, "little") + b"AIFF" + bytes(40),
        wav_encode(np.arange(4, dtype=np.int16), 8000)[:30],  # truncated fmt
    ],
)
def test_malformed_payloads_return_none(payload):
    assert parse_wav(payload) is None


def test_declared_data_size_beyond_eof_rejected():
    b = bytearray(wav_encode(np.arange(100, dtype=np.int16), 8000))
    # inflate the data chunk's declared size past the real payload
    b[40:44] = (10_000).to_bytes(4, "little")
    assert parse_wav(bytes(b)) is None


def test_absurd_chunk_size_rejected_before_decode():
    b = bytearray(wav_encode(np.arange(4, dtype=np.int16), 8000))
    b[40:44] = (1 << 30).to_bytes(4, "little")
    assert parse_wav(bytes(b)) is None


def test_non_pcm_and_wrong_bit_depth_rejected():
    base = bytearray(wav_encode(np.arange(8, dtype=np.int16), 8000))
    ulaw = bytearray(base)
    ulaw[20:22] = (7).to_bytes(2, "little")  # audio format µ-law
    assert parse_wav(bytes(ulaw)) is None
    b24 = bytearray(base)
    b24[34:36] = (24).to_bytes(2, "little")
    assert parse_wav(bytes(b24)) is None


def test_stats_exactness():
    s = np.array([3, -4, 0, -1, 1], dtype=np.int16)
    n, ssq, zc, peak, first, last = _stats(s)
    assert (n, ssq, peak, first, last) == (5, 27, 4, 3, 1)
    # sign flips at 3→-4, -4→0, 0→-1, -1→1 (0 counts as non-negative)
    assert zc == 4


def test_stats_int16_extremes_no_overflow():
    s = np.full(1000, -32768, dtype=np.int16)
    n, ssq, zc, peak, first, last = _stats(s)
    assert ssq == 1000 * 32768 * 32768  # would overflow int32 math
    assert peak == 32768
    assert zc == 0


@pytest.mark.slow  # heavy probe: opt-in via -m slow (r11)
def test_frame_energy_conserves_total(spark):
    rows = []
    for aid in range(6):
        k = 50 + 37 * aid  # exercises ragged and exact-multiple frames
        samples = RNG.integers(-3000, 3000, size=k, dtype=np.int16)
        rows.append((aid, bytearray(wav_encode(samples, 8000))))
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    total = {
        r["asset_id"]: r["sum_sq"] for r in wav_features(assets).collect()
    }
    frames = frame_energy(assets, frame=64).collect()
    by_asset: dict[int, int] = {}
    for r in frames:
        by_asset[r["asset_id"]] = by_asset.get(r["asset_id"], 0) + r["sum_sq"]
        assert r["n_in_frame"] <= 64
    assert by_asset == total
    counts = {}
    for r in frames:
        counts[r["asset_id"]] = counts.get(r["asset_id"], 0) + r["n_in_frame"]
    for aid in range(6):
        assert counts[aid] == 50 + 37 * aid


def test_wav_features_null_triage(spark):
    assets = spark.createDataFrame(
        [(1, bytearray(wav_encode(np.arange(10, dtype=np.int16), 8000))),
         (2, bytearray(b"not a wav")),
         (3, None)],
        "asset_id long, payload binary",
    )
    rows = {r["asset_id"]: r for r in wav_features(assets).collect()}
    assert rows[1]["n_samples"] == 10
    assert rows[2]["n_samples"] is None and rows[3]["sum_sq"] is None
    assert len(rows) == 3  # malformed assets preserved for triage
