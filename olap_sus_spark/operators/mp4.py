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


# --------------------------------------------------------------------------
# Sample-table demux: per-sample (dts, offset, size) straight from the
# stts/stsc/stsz/stco tables — a REAL demuxer, still zero codec work.
# This is how a 100 TB video pipeline slices frame payloads for sampling
# without ever entropy-decoding: the sample table is a few KB of moov
# regardless of mdat size, so "every Nth frame" costs N point reads.

_MAX_SAMPLES = 100_000
_MAX_CHUNKS = 100_000


def parse_sample_table(payload: bytes | None) -> dict | None:
    """First complete track's sample table → ``{"timescale": int,
    "samples": [(index, dts_ms, offset, size), ...]}``.

    "Complete" = the trak carries stts + stsz + stco/co64 (stsc defaults
    to one-sample-per-chunk when absent, the layout :func:`mp4_write`
    emits).  Every derived (offset, size) is range-checked against the
    payload; a single out-of-range sample invalidates the track (hostile
    or truncated file) → ``None``.  Counts are capped so a forged header
    can't allocate unbounded lists."""
    if payload is None:
        return None
    b = bytes(payload)
    try:
        return _parse_samples(b)
    except Exception:
        return None


def _parse_samples(b: bytes) -> dict | None:
    budget = [_MAX_BOXES]
    top = list(_boxes(b, 0, len(b), budget))
    if not top or top[0][0] != b"ftyp":
        return None
    for cc, m0, m1 in top:
        if cc != b"moov":
            continue
        for tc, t0, t1 in _boxes(b, m0, m1, budget):
            if tc != b"trak":
                continue
            table = _track_samples(b, t0, t1, budget)
            if table is not None:
                return table
    return None


def _track_samples(b: bytes, t0: int, t1: int, budget: list[int]) -> dict | None:
    timescale = None
    spans: dict[bytes, tuple[int, int]] = {}

    def walk(start: int, end: int) -> None:
        nonlocal timescale
        for cc, q0, q1 in _boxes(b, start, end, budget):
            if cc in _CONTAINERS:
                walk(q0, q1)
            elif cc == b"mdhd":
                v = b[q0]
                timescale = struct.unpack_from(">I", b, q0 + (20 if v == 1 else 12))[0]
            elif cc in (b"stts", b"stsz", b"stsc", b"stco", b"co64"):
                spans[cc] = (q0, q1)

    walk(t0, t1)
    if not timescale or b"stts" not in spans or b"stsz" not in spans:
        return None
    if b"stco" not in spans and b"co64" not in spans:
        return None

    # stsz: uniform size or per-sample table
    z0, z1 = spans[b"stsz"]
    uniform, n_samples = struct.unpack_from(">II", b, z0 + 4)
    if n_samples > _MAX_SAMPLES:
        return None
    if uniform:
        sizes = [uniform] * n_samples
    else:
        if z0 + 12 + 4 * n_samples > z1:
            return None
        sizes = list(struct.unpack_from(f">{n_samples}I", b, z0 + 12))

    # stts: (count, delta) runs -> per-sample dts
    s0, s1 = spans[b"stts"]
    n_runs = struct.unpack_from(">I", b, s0 + 4)[0]
    if s0 + 8 + 8 * n_runs > s1 or n_runs > _MAX_SAMPLES:
        return None
    dts, t = [], 0
    for i in range(n_runs):
        count, delta = struct.unpack_from(">II", b, s0 + 8 + 8 * i)
        if count > _MAX_SAMPLES:
            return None
        for _ in range(count):
            if len(dts) >= n_samples:
                break
            dts.append(t)
            t += delta
    if len(dts) < n_samples:
        return None

    # chunk offsets
    if b"stco" in spans:
        c0, c1 = spans[b"stco"]
        n_chunks = struct.unpack_from(">I", b, c0 + 4)[0]
        if n_chunks > _MAX_CHUNKS or c0 + 8 + 4 * n_chunks > c1:
            return None
        offsets = list(struct.unpack_from(f">{n_chunks}I", b, c0 + 8))
    else:
        c0, c1 = spans[b"co64"]
        n_chunks = struct.unpack_from(">I", b, c0 + 4)[0]
        if n_chunks > _MAX_CHUNKS or c0 + 8 + 8 * n_chunks > c1:
            return None
        offsets = list(struct.unpack_from(f">{n_chunks}Q", b, c0 + 8))

    # stsc: (first_chunk, samples_per_chunk) runs; absent -> 1 sample/chunk
    runs: list[tuple[int, int]] = []
    if b"stsc" in spans:
        k0, k1 = spans[b"stsc"]
        n_sc = struct.unpack_from(">I", b, k0 + 4)[0]
        if k0 + 8 + 12 * n_sc > k1 or n_sc > _MAX_CHUNKS:
            return None
        for i in range(n_sc):
            first, per, _desc = struct.unpack_from(">III", b, k0 + 8 + 12 * i)
            if first < 1 or per < 1:
                return None
            runs.append((first, per))
    if not runs:
        runs = [(1, 1)]

    # expand chunk runs -> per-sample (offset, size), range-checked
    samples: list[tuple[int, int, int, int]] = []
    si = 0
    for ci in range(n_chunks):
        per = runs[0][1]
        for first, p in runs:
            if ci + 1 >= first:
                per = p
        pos = offsets[ci]
        for _ in range(per):
            if si >= n_samples:
                break
            size = sizes[si]
            if pos + size > len(b) or size < 0:
                return None
            samples.append((si, dts[si] * 1000 // timescale, pos, size))
            pos += size
            si += 1
    if si < n_samples:
        return None
    return {"timescale": timescale, "samples": samples}


def extract_samples(
    payload: bytes | None, every_nth: int = 1
) -> list[tuple[int, int, bytes]] | None:
    """Slice every ``every_nth``-th sample's bytes out of mdat:
    ``[(sample_index, dts_ms, data), ...]`` — or ``None`` when the payload
    has no parsable sample table (callers fall through to other
    containers)."""
    table = parse_sample_table(payload)
    if table is None:
        return None
    b = bytes(payload)
    return [
        (i, dts_ms, b[off : off + size])
        for (i, dts_ms, off, size) in table["samples"][:: max(1, every_nth)]
    ]


def mp4_write_samples(
    samples: list[bytes],
    codec: str = "mjpg",
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
    delta: int = 40,
    brand: str = "isom",
) -> bytes:
    """Build a demuxable MP4: full sample table (stts/stsc/stsz/stco, one
    sample per chunk) + real mdat payload — the writer twin of
    :func:`parse_sample_table` for round-trip tests.  Two passes: moov size
    is fixed by the sample COUNT, so offsets are patched in a rebuild."""
    n = len(samples)
    duration = n * delta

    def build_moov(offsets: list[int]) -> bytes:
        mvhd = _box(
            b"mvhd",
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration)
            + b"\x00" * 80,
        )
        tkhd = _box(
            b"tkhd",
            b"\x00\x00\x00\x07"
            + struct.pack(">III", 0, 0, 1)
            + b"\x00" * 60
            + struct.pack(">II", width << 16, height << 16),
        )
        mdhd = _box(
            b"mdhd",
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration)
            + b"\x00" * 4,
        )
        entry = struct.pack(">I4s", 8 + 78, codec.encode("latin-1")[:4].ljust(4)) + b"\x00" * 78
        stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
        stts = _box(b"stts", b"\x00\x00\x00\x00" + struct.pack(">III", 1, n, delta))
        stsc = _box(b"stsc", b"\x00\x00\x00\x00" + struct.pack(">IIII", 1, 1, 1, 1))
        stsz = _box(
            b"stsz",
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
        stco = _box(
            b"stco",
            b"\x00\x00\x00\x00"
            + struct.pack(">I", n)
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", brand.encode("latin-1")[:4].ljust(4) + b"\x00\x00\x02\x00" + b"isom")
    moov_size = len(build_moov([0] * n))
    base = len(ftyp) + moov_size + 8  # first byte inside mdat
    offsets, pos = [], base
    for s in samples:
        offsets.append(pos)
        pos += len(s)
    moov = build_moov(offsets)
    assert len(moov) == moov_size
    return ftyp + moov + _box(b"mdat", b"".join(samples))
