"""Matroska/WebM (EBML) container demux/mux (stdlib-only).

Matroska is an EBML document: every element is a variable-length id, a
variable-length size, and a payload — plain struct walking, the same
no-codec work as the RIFF walk in :mod:`operators.avi` and the box walk in
:mod:`operators.mp4`.  With the JPEG decoder real, an MJPEG-in-MKV asset
is fully decodable end-to-end: demux here → per-frame ``jpeg_decode``.
This closes the last container fallback ``multimodal.sample_frames``
carried (the fake slicer now fires only for truly unknown containers).

Scope: SimpleBlock / Block(Group) frames WITHOUT lacing (one frame per
block — what intra-coded streams like MJPEG use); laced or damaged streams
return ``None`` and callers fall back.  Unknown-size Segment/Cluster
elements (streamed files) are handled by letting them extend to the
parent's end.

Untrusted-payload posture mirrors avi.py: every declared size is
range-checked before any slice, frame count and per-frame bytes are
capped, every structural violation returns ``None`` — never an exception.

The muxer writes a minimal valid Matroska file (EBML header with
doctype "matroska", Segment with Info/Tracks and one Cluster of
SimpleBlocks, codec ``V_MS/VFW/MJPEG`` equivalent id ``V_MJPEG``) so the
demuxer is testable end-to-end without fixture binaries, exactly like
``avi.avi_mux``.

Element ids follow the public Matroska specification (matroska.org / RFC
9559).
"""

from __future__ import annotations

_MAX_FRAMES = 100_000
_MAX_FRAME_BYTES = 1 << 26  # 64 MB per block ceiling

# Element ids (stored form, including the EBML length marker bits).
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TIMECODE = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1

_VIDEO_TRACK_TYPE = 1


class _MkvError(Exception):
    pass


def _read_id(b: bytes, pos: int) -> tuple[int, int]:
    """EBML id: 1–4 bytes, marker bits KEPT (ids are quoted with them)."""
    if pos >= len(b):
        raise _MkvError("truncated id")
    first = b[pos]
    if first == 0:
        raise _MkvError("invalid id")
    ln = 8 - first.bit_length() + 1
    if ln > 4 or pos + ln > len(b):
        raise _MkvError("bad id length")
    return int.from_bytes(b[pos : pos + ln], "big"), ln


def _read_size(b: bytes, pos: int) -> tuple[int | None, int]:
    """EBML size: 1–8 bytes, marker CLEARED; all-ones payload = unknown
    size (returns None)."""
    if pos >= len(b):
        raise _MkvError("truncated size")
    first = b[pos]
    if first == 0:
        raise _MkvError("invalid size")
    ln = 8 - first.bit_length() + 1
    if ln > 8 or pos + ln > len(b):
        raise _MkvError("bad size length")
    raw = int.from_bytes(b[pos : pos + ln], "big")
    val = raw - (1 << (7 * ln))  # clear the marker bit
    if val == (1 << (7 * ln)) - 1:
        return None, ln  # reserved all-ones: unknown size
    return val, ln


def _walk(b: bytes, start: int, end: int):
    """Yield (element id, payload start, payload end) for the children of
    [start, end).  Unknown-size children extend to ``end`` (legal for
    Segment/Cluster in streamed files) — they are always the last child
    this walk yields."""
    pos = start
    while pos < end:
        eid, n = _read_id(b, pos)
        pos += n
        size, n = _read_size(b, pos)
        pos += n
        if size is None:
            yield eid, pos, end
            return
        if pos + size > end:
            raise _MkvError("element overruns parent")
        yield eid, pos, pos + size
        pos += size


def _uint(b: bytes, s: int, e: int) -> int:
    if e - s > 8:
        raise _MkvError("oversized uint")
    return int.from_bytes(b[s:e], "big")


def _float(b: bytes, s: int, e: int) -> float:
    import struct

    if e - s == 4:
        return struct.unpack(">f", b[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", b[s:e])[0]
    raise _MkvError("bad float width")


def _segment_bounds(b: bytes) -> tuple[int, int]:
    saw_ebml = False
    for eid, s, e in _walk(b, 0, len(b)):
        if eid == _EBML:
            saw_ebml = True
        elif eid == _SEGMENT:
            if not saw_ebml:
                raise _MkvError("segment before EBML header")
            return s, e
    raise _MkvError("no segment")


def _video_track(b: bytes, s: int, e: int) -> tuple[int | None, str | None, int | None, int | None, int]:
    """(track number, codec id, width, height, n_tracks) from a Tracks
    payload; the FIRST video track wins."""
    num = codec = width = height = None
    n_tracks = 0
    for eid, ts, te in _walk(b, s, e):
        if eid != _TRACK_ENTRY:
            continue
        n_tracks += 1
        t_num = t_type = t_codec = t_w = t_h = None
        for fid, fs, fe in _walk(b, ts, te):
            if fid == _TRACK_NUMBER:
                t_num = _uint(b, fs, fe)
            elif fid == _TRACK_TYPE:
                t_type = _uint(b, fs, fe)
            elif fid == _CODEC_ID:
                t_codec = b[fs:fe].decode("ascii", "replace")
            elif fid == _VIDEO:
                for vid, vs, ve in _walk(b, fs, fe):
                    if vid == _PIXEL_WIDTH:
                        t_w = _uint(b, vs, ve)
                    elif vid == _PIXEL_HEIGHT:
                        t_h = _uint(b, vs, ve)
        if t_type == _VIDEO_TRACK_TYPE and num is None:
            num, codec, width, height = t_num, t_codec, t_w, t_h
    return num, codec, width, height, n_tracks


def _block_frame(b: bytes, s: int, e: int, want_track: int) -> bytes | None:
    """Frame bytes of a SimpleBlock/Block payload when it belongs to
    ``want_track`` and is unlaced; None for other tracks."""
    size, n = _read_size(b, s)
    if size is None:
        raise _MkvError("unknown-size track number")
    track = size
    pos = s + n
    if pos + 3 > e:
        raise _MkvError("short block header")
    flags = b[pos + 2]
    if track != want_track:
        return None
    if flags & 0x06:
        raise _MkvError("laced block unsupported")
    if e - (pos + 3) > _MAX_FRAME_BYTES:
        raise _MkvError("frame past ceiling")
    return b[pos + 3 : e]


def mkv_demux(payload: bytes | None) -> list[bytes] | None:
    """Frame bytes of the first video track, in stream order, or None for
    anything that isn't a clean unlaced Matroska stream."""
    if payload is None:
        return None
    b = bytes(payload)
    try:
        s, e = _segment_bounds(b)
        track = None
        frames: list[bytes] = []
        for eid, cs, ce in _walk(b, s, e):
            if eid == _TRACKS and track is None:
                track = _video_track(b, cs, ce)[0]
            elif eid == _CLUSTER:
                if track is None:
                    raise _MkvError("cluster before tracks")
                for cid, bs, be in _walk(b, cs, ce):
                    if cid == _SIMPLE_BLOCK:
                        f = _block_frame(b, bs, be, track)
                    elif cid == _BLOCK_GROUP:
                        f = None
                        for gid, gs, ge in _walk(b, bs, be):
                            if gid == _BLOCK:
                                f = _block_frame(b, gs, ge, track)
                    else:
                        continue
                    if f is not None:
                        frames.append(f)
                        if len(frames) > _MAX_FRAMES:
                            raise _MkvError("frame count past ceiling")
        return frames if frames else None
    except Exception:
        return None


def mkv_metadata(payload: bytes | None) -> dict | None:
    """Container-level triage without touching any frame bytes: doctype,
    duration (Duration × TimecodeScale), track count, first video codec
    and geometry.  Same dict shape as ``avi.avi_metadata``."""
    if payload is None:
        return None
    b = bytes(payload)
    try:
        doctype = "matroska"
        for eid, s, e in _walk(b, 0, len(b)):
            if eid == _EBML:
                for hid, hs, he in _walk(b, s, e):
                    if hid == _DOCTYPE:
                        doctype = b[hs:he].decode("ascii", "replace")
                break
        s, e = _segment_bounds(b)
        scale = 1_000_000  # ns per timecode tick (spec default)
        duration = None
        codec = width = height = None
        n_tracks = 0
        for eid, cs, ce in _walk(b, s, e):
            if eid == _INFO:
                for iid, i_s, i_e in _walk(b, cs, ce):
                    if iid == _TIMECODE_SCALE:
                        scale = _uint(b, i_s, i_e)
                    elif iid == _DURATION:
                        duration = _float(b, i_s, i_e)
            elif eid == _TRACKS:
                _, codec, width, height, n_tracks = _video_track(b, cs, ce)
        return {
            "brand": doctype,
            "duration_ms": None
            if duration is None
            else int(duration * scale / 1_000_000),
            "n_tracks": n_tracks,
            "codecs": [codec] if codec else [],
            "width": width,
            "height": height,
        }
    except Exception:
        return None


# --------------------------------------------------------------------------
# Muxer (test harness for the demuxer; writes a minimal valid Matroska).


def _enc_size(n: int) -> bytes:
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:  # all-ones is reserved (unknown)
            return (n | (1 << (7 * ln))).to_bytes(ln, "big")
    raise ValueError("size too large")


def _el(eid: int, payload: bytes) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big") + _enc_size(len(payload)) + payload


def _uint_el(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def mkv_mux(frames: list[bytes], width: int, height: int, fps: int = 30) -> bytes:
    """Write an MJPEG Matroska: one video track, one Cluster, one unlaced
    SimpleBlock per frame (keyframe flag set — MJPEG is all-intra)."""
    import struct

    head = _el(
        _EBML,
        _uint_el(0x4286, 1)  # EBMLVersion
        + _uint_el(0x42F7, 1)  # EBMLReadVersion
        + _uint_el(0x42F2, 4)  # EBMLMaxIDLength
        + _uint_el(0x42F3, 8)  # EBMLMaxSizeLength
        + _el(_DOCTYPE, b"matroska")
        + _uint_el(0x4287, 2)  # DocTypeVersion
        + _uint_el(0x4285, 2),  # DocTypeReadVersion
    )
    tick_ms = max(1, 1000 // fps)
    info = _el(
        _INFO,
        _uint_el(_TIMECODE_SCALE, 1_000_000)
        + _el(_DURATION, struct.pack(">d", float(len(frames) * tick_ms))),
    )
    video = _el(_VIDEO, _uint_el(_PIXEL_WIDTH, width) + _uint_el(_PIXEL_HEIGHT, height))
    track = _el(
        _TRACKS,
        _el(
            _TRACK_ENTRY,
            _uint_el(_TRACK_NUMBER, 1)
            + _uint_el(0x73C5, 1)  # TrackUID
            + _uint_el(_TRACK_TYPE, _VIDEO_TRACK_TYPE)
            + _el(_CODEC_ID, b"V_MJPEG")
            + video,
        ),
    )
    blocks = b"".join(
        _el(
            _SIMPLE_BLOCK,
            _enc_size(1)  # track number as a VINT
            + struct.pack(">h", i * tick_ms)  # relative timecode
            + bytes([0x80])  # keyframe, no lacing
            + f,
        )
        for i, f in enumerate(frames)
    )
    cluster = _el(_CLUSTER, _uint_el(_CLUSTER_TIMECODE, 0) + blocks)
    return head + _el(_SEGMENT, info + track + cluster)
