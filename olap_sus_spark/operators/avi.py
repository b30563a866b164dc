"""Motion-JPEG AVI container demux/mux (stdlib-only).

AVI is a RIFF container: `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
strf)) LIST('movi' 00dc...))` — plain struct walking, no codec involved.
With the baseline JPEG decoder (:mod:`olap_sus_spark.operators.jpeg`) real,
an MJPG AVI is fully decodable end-to-end: demux here → per-frame
``jpeg_decode``.  This replaces the deterministic fake demuxer that
``multimodal.sample_frames`` used; non-AVI containers (MP4/MKV/ffmpeg
codecs) still fall back, documented in that function.

Untrusted-payload posture (same as png/gif/jpeg): declared sizes are
validated against the actual byte range before any slice, frame count and
per-frame size are capped, and every structural violation returns ``None``
— never an exception.

The muxer writes a minimal valid MJPG AVI (hdrl with avih/strh/strf, movi
with word-aligned ``00dc`` chunks, idx1 index) so the demuxer is testable
end-to-end against files any media player could open.

MJPG quirk worth documenting: many camera MJPG streams omit the DHT
segment and expect the T.81 Annex-K default tables.  This engine's JPEG
encoder always embeds its tables, and ``jpeg_decode`` fails closed on a
missing DHT — table-less frames demux fine but decode to ``None``.
"""

from __future__ import annotations

import struct

_MAX_FRAMES = 100_000
_MAX_FRAME_BYTES = 1 << 26  # 64 MB per frame chunk ceiling


def _chunks(b: bytes, start: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) RIFF chunks in
    [start, end); stops (not raises) at the first malformed header."""
    pos = start
    while pos + 8 <= end:
        fourcc = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        if size > _MAX_FRAME_BYTES or pos + 8 + size > end:
            return
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # word alignment


def avi_demux(payload: bytes | None) -> list[bytes] | None:
    """Extract the video frame payloads of an AVI, in stream order.

    Returns the list of ``..dc``/``..db`` chunk payloads (for MJPG, each is
    a complete JPEG) or ``None`` for anything that is not a well-formed
    AVI.  Audio (``..wb``) and index chunks are skipped; frame count capped
    at ``_MAX_FRAMES``.
    """
    if payload is None:
        return None
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    riff_size = struct.unpack_from("<I", b, 4)[0]
    end = min(len(b), 8 + riff_size)
    frames: list[bytes] = []
    saw_movi = False
    for fourcc, pos, size in _chunks(b, 12, end):
        if fourcc == b"LIST" and size >= 4 and b[pos : pos + 4] == b"movi":
            saw_movi = True
            for cc, fpos, fsize in _chunks(b, pos + 4, pos + size):
                # stream data chunks: '##dc' (compressed video) / '##db'
                # (uncompressed); two leading digits are the stream id
                if cc[2:4] in (b"dc", b"db") and cc[:2].isdigit():
                    frames.append(b[fpos : fpos + fsize])
                    if len(frames) > _MAX_FRAMES:
                        return None
    return frames if saw_movi else None


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")


def _list(kind: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", kind + data)


def avi_mux(frames: list[bytes], width: int, height: int, fps: int = 30) -> bytes:
    """Wrap JPEG frame payloads as a minimal valid MJPG AVI."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # microseconds per frame
        0, 0,
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 10_000, -1)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to the start of 'movi'+4
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_metadata(payload: bytes | None) -> dict | None:
    """Header-only AVI probe → the same dict shape as
    ``mp4.parse_mp4_metadata`` (brand = 'avi ', duration from
    avih.us_per_frame × total_frames, codecs from each strh handler).
    Walks only hdrl — no frame data is touched."""
    if payload is None:
        return None
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    end = min(len(b), 8 + struct.unpack_from("<I", b, 4)[0])
    meta = {
        "brand": "avi ", "duration_ms": None, "n_tracks": 0,
        "codecs": [], "width": None, "height": None,
    }
    for fourcc, pos, size in _chunks(b, 12, end):
        if fourcc != b"LIST" or size < 4 or b[pos : pos + 4] != b"hdrl":
            continue
        for cc, q, qs in _chunks(b, pos + 4, pos + size):
            if cc == b"avih" and qs >= 40:
                uspf, _, _, _, total = struct.unpack_from("<5I", b, q)
                meta["width"], meta["height"] = struct.unpack_from("<II", b, q + 32)
                if uspf:
                    meta["duration_ms"] = uspf * total // 1000
            elif cc == b"LIST" and qs >= 4 and b[q : q + 4] == b"strl":
                for sc, r, rs in _chunks(b, q + 4, q + qs):
                    if sc == b"strh" and rs >= 8:
                        meta["n_tracks"] += 1
                        meta["codecs"].append(b[r + 4 : r + 8].decode("latin-1"))
        return meta
    return None
