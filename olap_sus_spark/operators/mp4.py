"""MP4 / ISO-BMFF metadata extraction (stdlib-only, no codec).

The metadata pass every large-scale video pipeline runs BEFORE deciding
what to decode: brand, duration, track geometry and codec fourccs are all
in the ``moov`` box tree, which is plain length-prefixed struct walking —
no entropy decoding anywhere.  Sample *data* (mdat) stays untouched; at
100 TB this is the difference between a metadata-only scan (column-pruned
parquet + header bytes) and paying a demux per asset.

Box format: u32 size + fourcc (+ u64 largesize when size == 1); container
boxes nest.  Version/flags-prefixed "full boxes" (mvhd/tkhd/mdhd) carry
32- or 64-bit time fields depending on version — both handled.

Untrusted-payload posture, as the sibling codecs: every declared size is
range-checked before slicing, recursion depth and box count are capped,
and anything malformed returns ``None`` — never an exception.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
_MAX_BOXES = 10_000


class _Stop(Exception):
    pass


def _boxes(b: bytes, start: int, end: int, budget: list[int]):
    pos = start
    while pos + 8 <= end:
        budget[0] -= 1
        if budget[0] <= 0:
            raise _Stop
        size, fourcc = struct.unpack_from(">I4s", b, pos)
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = struct.unpack_from(">Q", b, pos + 8)[0]
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            return
        yield fourcc, pos + header, pos + size
        pos += size


def parse_mp4_metadata(payload: bytes | None) -> dict | None:
    """Walk the box tree → {brand, duration_ms, n_tracks, codecs, width,
    height} (width/height from the first video track's tkhd, 16.16 fixed
    point).  Returns ``None`` unless the payload starts with a valid
    ``ftyp`` box (the ISO-BMFF signature)."""
    if payload is None:
        return None
    b = bytes(payload)
    try:
        return _parse(b)
    except Exception:
        return None


def _parse(b: bytes) -> dict | None:
    budget = [_MAX_BOXES]
    top = _boxes(b, 0, len(b), budget)
    try:
        fourcc, p0, p1 = next(top)
    except (StopIteration, _Stop):
        return None
    if fourcc != b"ftyp" or p1 - p0 < 4:
        return None
    meta: dict = {
        "brand": b[p0 : p0 + 4].decode("latin-1"),
        "duration_ms": None,
        "n_tracks": 0,
        "codecs": [],
        "width": None,
        "height": None,
    }

    def walk(start: int, end: int, path: tuple[bytes, ...]) -> None:
        for cc, q0, q1 in _boxes(b, start, end, budget):
            if cc in _CONTAINERS:
                walk(q0, q1, path + (cc,))
            elif cc == b"mvhd" and path == (b"moov",):
                v = b[q0]
                if v == 1:
                    timescale, duration = struct.unpack_from(">IQ", b, q0 + 20)
                else:
                    timescale, duration = struct.unpack_from(">II", b, q0 + 12)
                if timescale:
                    meta["duration_ms"] = int(duration * 1000 // timescale)
            elif cc == b"tkhd" and path == (b"moov", b"trak"):
                meta["n_tracks"] += 1
                v = b[q0]
                # width/height sit after matrix: payload offset 76 (v0:
                # 4 vf + 4+4 times + 4 id + 4 res + 4 dur + 8 res + 2+2+2+2
                # + 36 matrix) or 88 (v1: 64-bit times/duration)
                off = q0 + (88 if v == 1 else 76)
                if off + 8 <= q1:
                    w16, h16 = struct.unpack_from(">II", b, off)
                    if meta["width"] is None and (w16 or h16):
                        meta["width"], meta["height"] = w16 >> 16, h16 >> 16
            elif cc == b"stsd" and path == (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                n = struct.unpack_from(">I", b, q0 + 4)[0]
                pos = q0 + 8
                for _ in range(min(n, 16)):
                    if pos + 8 > q1:
                        break
                    esize, efour = struct.unpack_from(">I4s", b, pos)
                    if esize < 8 or pos + esize > q1:
                        break
                    meta["codecs"].append(efour.decode("latin-1"))
                    pos += esize

    for cc, p0, p1 in top:
        if cc == b"moov":
            walk(p0, p1, (b"moov",))
    return meta


# --------------------------------------------------------------------------
# Minimal writer (test harness): a valid moov tree any parser can read.


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), fourcc) + payload


def mp4_write(
    duration_ms: int,
    tracks: list[tuple[str, int, int]],  # (codec fourcc, width, height)
    brand: str = "isom",
    timescale: int = 1000,
) -> bytes:
    """Build a metadata-only MP4 (ftyp + moov, empty mdat) for testing the
    parser against independently constructed boxes."""
    ftyp = _box(b"ftyp", brand.encode("latin-1")[:4].ljust(4) + b"\x00\x00\x02\x00" + b"isom")
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, duration_ms * timescale // 1000)
        + b"\x00" * 80,  # rate/volume/matrix/predefined/next_track_id
    )
    traks = b""
    for codec, w, h in tracks:
        tkhd = _box(
            b"tkhd",
            b"\x00\x00\x00\x07"
            + struct.pack(">III", 0, 0, 1)  # times + track id
            + b"\x00" * 60  # reserved/duration/layer/volume/matrix
            + struct.pack(">II", w << 16, h << 16),
        )
        entry = struct.pack(">I4s", 8 + 78, codec.encode("latin-1")[:4].ljust(4)) + b"\x00" * 78
        stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", minf)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov + _box(b"mdat", b"")
