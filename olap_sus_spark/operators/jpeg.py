"""JPEG codec — baseline AND progressive (stdlib + numpy, no codec library).

Sequential baseline JPEG (SOF0/SOF1) is mechanically decodable without
libjpeg: marker walk → quant/Huffman table state → per-MCU canonical-Huffman
entropy decode → dequantize → 8×8 IDCT → chroma upsample → YCbCr→RGB.  The
reference has no media columns at all (this module is part of the engine's
multimodal extension, BASELINE.json north star); the pixel math here follows
the public JPEG specification (ITU-T T.81) the way ``png_decode`` follows
the PNG spec.

Progressive JPEG (SOF2, T.81 Annex G) decodes through the same Huffman/IDCT
machinery with a per-component coefficient accumulator: each scan deposits
one (spectral band × successive-approximation bit) slice — DC first/refine,
AC first with EOB runs, AC refinement with correction bits — and the pixels
materialize in ONE dequantize+IDCT pass after the last scan.  The control
flow mirrors the published T.81 G.2 decoding procedures (the same ones
libjpeg's phuff decoder implements).

Decoder scope (anything else returns ``None`` and the caller falls back,
same contract as :func:`multimodal.png_decode`):

- SOF0/SOF1 (sequential) and SOF2 (progressive), 8-bit precision, 1
  (grayscale) or 3 (YCbCr) components;
- sampling factors 1–2 per axis (4:4:4, 4:2:2, 4:4:0, 4:2:0), restart
  markers, 8/16-bit quant tables, per-scan Huffman redefinition;
- lossless (SOF3+), arithmetic coding, 12-bit, hierarchical, and CMYK are
  refused.

Untrusted-payload posture mirrors the PNG/GIF paths: a declared-dimension
ceiling before any allocation (``_JPEG_MAX_PIXELS`` — also bounds the
Python-side entropy loop, which is the expensive part), every structural
violation → ``None``, never an exception out of the decoder.

The encoder exists so the decoder is testable end-to-end without fixture
binaries: it writes valid baseline files (flat quant tables, fixed-length
canonical Huffman tables — valid but unoptimized codes, so no dependence on
the Annex-K "typical" tables) that any JPEG decoder can read.  Round-trip
tests (tests/test_band_and_multimodal.py) pin known-pixel decodes and
bounded reconstruction error.

Per-block number crunching (IDCT/FDCT, color convert, upsample) is numpy;
only the inherently serial Huffman bit loop is pure Python, which is why
``_JPEG_MAX_PIXELS`` is tighter than the PNG ceiling.
"""

from __future__ import annotations

import math

import numpy as np

# Zigzag index -> raster index (row-major v*8+u), ITU-T T.81 Figure 5.
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# 1M px: the entropy loop is pure Python; past this the decode stops being
# an executor-friendly per-row cost (PNG's 4M ceiling assumes the cheaper
# zlib+unfilter path).  Oversized images -> None -> caller's fallback.
_JPEG_MAX_PIXELS = 1 << 20

# Orthonormal 2-D DCT basis: f = M @ F @ M.T (decode), F = M.T @ f @ M
# (encode), with F[v][u] in raster order.
_M = np.array(
    [
        [
            (math.sqrt(0.5) if u == 0 else 1.0) / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


class _JpegError(Exception):
    pass


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 Annex C: (code length, code) -> symbol."""
    if len(counts) != 16 or sum(counts) != len(symbols) or sum(counts) > 256:
        raise _JpegError("bad huffman spec")
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        if code >= (1 << ln):
            raise _JpegError("huffman code overflow")
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 stuffing.

    A non-stuffing marker byte ends the readable stream (the scan loop
    consumes RSTn itself via :meth:`restart`)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.buf):
                raise _JpegError("entropy data truncated")
            c = self.buf[self.pos]
            self.pos += 1
            if c == 0xFF:
                if self.pos < len(self.buf) and self.buf[self.pos] == 0x00:
                    self.pos += 1  # stuffed 0xFF data byte
                else:
                    self.pos -= 1  # a real marker: unread, signal end
                    raise _JpegError("marker inside entropy data")
            self.acc = c
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.n = 0
        if (
            self.pos + 2 > len(self.buf)
            or self.buf[self.pos] != 0xFF
            or not 0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            raise _JpegError("missing restart marker")
        self.pos += 2


def _huffdecode(bits: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise _JpegError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _decode_block(
    bits: _BitReader,
    dc_table: dict[tuple[int, int], int],
    ac_table: dict[tuple[int, int], int],
    pred: int,
    quant: np.ndarray,
) -> tuple[np.ndarray, int]:
    """One 8×8 block: DC diff + run-length AC, dequantized, raster order."""
    coeff = np.zeros(64, dtype=np.float64)
    s = _huffdecode(bits, dc_table)
    if s > 11:
        raise _JpegError("DC category out of baseline range")
    diff = _extend(bits.receive(s), s) if s else 0
    pred += diff
    coeff[0] = pred * quant[0]
    k = 1
    while k < 64:
        rs = _huffdecode(bits, ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        if s > 10:
            raise _JpegError("AC size out of baseline range")
        k += r
        if k > 63:
            raise _JpegError("AC run past block end")
        coeff[ZIGZAG[k]] = _extend(bits.receive(s), s) * quant[ZIGZAG[k]]
        k += 1
    return coeff, pred


def jpeg_decode(payload: bytes | None) -> tuple[int, int, int, bytearray] | None:
    """Decode a baseline JPEG to (width, height, channels, row-major bytes).

    channels is 1 (grayscale) or 3 (RGB after JFIF YCbCr conversion).
    Returns ``None`` for anything outside the supported envelope or any
    malformed/hostile payload — never raises.
    """
    if payload is None:
        return None
    try:
        return _jpeg_decode(bytes(payload))
    except Exception:
        return None


def _jpeg_decode(b: bytes) -> tuple[int, int, int, bytearray] | None:
    if b[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}  # (class, id)
    frame = None  # (H, W, [(comp_id, h, v, tq)])
    restart_interval = 0
    progressive = False
    coefs: list[np.ndarray] | None = None  # per-comp (by, bx, 64) zigzag ints
    nscans = 0
    i = 2
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            if progressive and nscans:
                return _progressive_finish(frame, qt, coefs)
            return None  # EOI before any (complete) image
        if 0xD0 <= marker <= 0xD8:  # RST/SOI stray: no length field
            i += 2
            continue
        if i + 4 > len(b):
            return None
        ln = int.from_bytes(b[i + 2 : i + 4], "big")
        if ln < 2 or i + 2 + ln > len(b):
            return None
        seg = b[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq not in (0, 1) or tq > 3:
                    return None
                n = 64 * (2 if pq else 1)
                if p + n > len(seg):
                    return None
                if pq:
                    vals = [int.from_bytes(seg[p + 2 * j : p + 2 * j + 2], "big") for j in range(64)]
                else:
                    vals = list(seg[p : p + 64])
                raster = np.zeros(64, dtype=np.float64)
                for j in range(64):
                    raster[ZIGZAG[j]] = vals[j]
                qt[tq] = raster
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                if tc not in (0, 1) or th > 3:
                    return None
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                if p + 17 + total > len(seg):
                    return None
                huff[(tc, th)] = _build_huffman(counts, seg[p + 17 : p + 17 + total])
                p += 17 + total
            if p != len(seg):
                return None
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 prog
            if frame is not None or len(seg) < 6 or seg[0] != 8:
                return None
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3) or len(seg) != 6 + 3 * ncomp:
                return None
            if not width or not height or width * height > _JPEG_MAX_PIXELS:
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 2 and 1 <= v <= 2) or tq > 3:
                    return None
                comps.append((cid, h, v, tq))
            frame = (height, width, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            if len(seg) != 2:
                return None
            restart_interval = int.from_bytes(seg, "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            if not progressive:
                return _decode_scan(b, i + 2 + ln, seg, frame, qt, huff, restart_interval)
            if coefs is None:
                coefs = _alloc_coefs(frame)
            i = _progressive_scan(
                b, i + 2 + ln, seg, frame, huff, restart_interval, coefs
            )
            nscans += 1
            continue
        # APPn / COM / others: skip
        i += 2 + ln
    return None  # ran out of data without EOI: truncated file


def _decode_scan(
    b: bytes,
    data_pos: int,
    seg: bytes,
    frame: tuple[int, int, list[tuple[int, int, int, int]]],
    qt: dict[int, np.ndarray],
    huff: dict[tuple[int, int], dict[tuple[int, int], int]],
    restart_interval: int,
) -> tuple[int, int, int, bytearray] | None:
    height, width, comps = frame
    ns = seg[0]
    if ns != len(comps) or len(seg) != 1 + 2 * ns + 3:
        return None  # baseline: single interleaved scan covering all comps
    # Spectral-selection / approximation bytes must be the sequential ones.
    if seg[1 + 2 * ns] != 0 or seg[2 + 2 * ns] != 63 or seg[3 + 2 * ns] != 0:
        return None
    tables = {}
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        tables[cs] = (tt >> 4, tt & 0x0F)
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = []
    meta = []  # (h, v, dc_table, ac_table, quant, plane)
    for cid, h, v, tq in comps:
        if cid not in tables or tq not in qt:
            return None
        dc_id, ac_id = tables[cid]
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            return None
        plane = np.zeros((mcus_y * 8 * v, mcus_x * 8 * h), dtype=np.float64)
        planes.append(plane)
        meta.append((h, v, huff[(0, dc_id)], huff[(1, ac_id)], qt[tq], plane))
    bits = _BitReader(b, data_pos)
    preds = [0] * len(comps)
    since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_restart == restart_interval:
                bits.restart()
                preds = [0] * len(comps)
                since_restart = 0
            for ci, (h, v, dct, act, quant, plane) in enumerate(meta):
                for by in range(v):
                    for bx in range(h):
                        coeff, preds[ci] = _decode_block(bits, dct, act, preds[ci], quant)
                        block = _M @ coeff.reshape(8, 8) @ _M.T + 128.0
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = block
            since_restart += 1
    return _to_pixels(
        [(h, v, plane) for (h, v, _, _, _, plane) in meta], width, height, hmax, vmax
    )


def _to_pixels(
    planes: list[tuple[int, int, np.ndarray]],
    width: int,
    height: int,
    hmax: int,
    vmax: int,
) -> tuple[int, int, int, bytearray]:
    """Shared decode tail: per-component upsample (nearest) + JFIF
    YCbCr→RGB, identical for the sequential and progressive paths."""
    ys = np.arange(height)
    xs = np.arange(width)
    full = [plane[np.ix_(ys * v // vmax, xs * h // hmax)] for (h, v, plane) in planes]
    if len(full) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return (width, height, 1, bytearray(out.tobytes()))
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return (width, height, 3, bytearray(out.tobytes()))


# --------------------------------------------------------------------------
# Progressive decode (T.81 Annex G.2): scans accumulate QUANTIZED zigzag
# coefficients per block; dequantize + IDCT happen once at EOI.


def _grid_dims(frame) -> tuple[int, int, int, int]:
    height, width, comps = frame
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    return -(-width // (8 * hmax)), -(-height // (8 * vmax)), hmax, vmax


def _alloc_coefs(frame) -> list[np.ndarray]:
    """Per-component coefficient store at the MCU-padded block grid (the
    grid interleaved DC scans cover); non-interleaved scans address the
    true-dimension prefix of it."""
    mcus_x, mcus_y, _, _ = _grid_dims(frame)
    return [
        np.zeros((mcus_y * v, mcus_x * h, 64), dtype=np.int32)
        for (_, h, v, _) in frame[2]
    ]


def _comp_blocks(frame, ci: int) -> tuple[int, int]:
    """True (non-interleaved) block-grid dims of component ``ci``."""
    height, width, comps = frame
    _, _, hmax, vmax = _grid_dims(frame)
    _, h, v, _ = comps[ci]
    comp_w = -(-width * h // hmax)
    comp_h = -(-height * v // vmax)
    return -(-comp_w // 8), -(-comp_h // 8)


def _dec_dc_prog(bits, dct, zz, preds, ci: int, ah: int, al: int) -> None:
    if ah == 0:  # first DC scan: Huffman diff of the point-transformed DC
        s = _huffdecode(bits, dct)
        if s > 11:
            raise _JpegError("DC category out of range")
        diff = _extend(bits.receive(s), s) if s else 0
        preds[ci] += diff
        zz[0] = preds[ci] << al
    else:  # refinement: one raw bit appends bit Al (two's-complement OR)
        if bits.read_bit():
            zz[0] = int(zz[0]) | (1 << al)


def _dec_ac_first(bits, act, zz, ss: int, se: int, al: int, state: dict) -> None:
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huffdecode(bits, act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eob = 1 << r
            if r:
                eob += bits.receive(r)
            state["eobrun"] = eob - 1  # current block is run member #1
            return
        k += r
        if k > se:
            raise _JpegError("AC run past band end")
        if s > 10:
            raise _JpegError("AC size out of range")
        zz[k] = _extend(bits.receive(s), s) << al
        k += 1


def _dec_ac_refine(bits, act, zz, ss: int, se: int, al: int, state: dict) -> None:
    """T.81 G.2 AC successive-approximation refinement (the libjpeg
    decode_mcu_AC_refine control flow): new ±1<<Al significances interleave
    with one correction bit per already-nonzero coefficient passed over,
    and EOB runs carry correction bits for every remaining nonzero."""
    p1 = 1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huffdecode(bits, act)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eob = 1 << r
                    if r:
                        eob += bits.receive(r)
                    state["eobrun"] = eob
                    break  # rest of block handled by the EOB logic below
                # r == 15: run of 16 zero-history coefficients
            else:
                if s != 1:
                    raise _JpegError("refinement size must be 1")
                val = p1 if bits.read_bit() else -p1
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if bits.read_bit() and (abs(c) & p1) == 0:
                        zz[k] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise _JpegError("refinement run past band end")
                zz[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:  # tail corrections for this EOB-run member
            c = int(zz[k])
            if c != 0:
                if bits.read_bit() and (abs(c) & p1) == 0:
                    zz[k] = c + (p1 if c > 0 else -p1)
            k += 1
        state["eobrun"] -= 1


def _progressive_scan(
    b: bytes,
    pos: int,
    seg: bytes,
    frame,
    huff: dict,
    restart_interval: int,
    coefs: list[np.ndarray],
) -> int:
    """Consume one progressive scan, mutating ``coefs``; returns the byte
    offset of the next marker."""
    height, width, comps = frame
    ns = seg[0]
    if not 1 <= ns <= len(comps) or len(seg) != 1 + 2 * ns + 3:
        raise _JpegError("bad scan header")
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
    dc_scan = ss == 0
    if se > 63 or (not dc_scan and se < ss) or al > 13 or ah > 13:
        raise _JpegError("bad spectral/approximation params")
    if dc_scan and se != 0:
        raise _JpegError("DC scan must have Se=0")
    if not dc_scan and ns != 1:
        raise _JpegError("AC scans are single-component")
    if ah and ah != al + 1:
        raise _JpegError("successive approximation must step by one bit")
    cindex = {cid: k for k, (cid, _, _, _) in enumerate(comps)}
    scan_comps = []  # (ci, dc_table | None, ac_table | None)
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        if cs not in cindex:
            raise _JpegError("scan names unknown component")
        ci = cindex[cs]
        if dc_scan:
            dct = huff.get((0, tt >> 4))
            if ah == 0 and dct is None:
                raise _JpegError("missing DC table")
            scan_comps.append((ci, dct, None))
        else:
            act = huff.get((1, tt & 0x0F))
            if act is None:
                raise _JpegError("missing AC table")
            scan_comps.append((ci, None, act))
    mcus_x, mcus_y, _, _ = _grid_dims(frame)
    bits = _BitReader(b, pos)
    preds = [0] * len(comps)
    state = {"eobrun": 0}
    since = 0
    if ns > 1:  # interleaved (DC only): full MCU-padded grid
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and since == restart_interval:
                    bits.restart()
                    preds = [0] * len(comps)
                    state["eobrun"] = 0
                    since = 0
                for ci, dct, _ in scan_comps:
                    _, h, v, _ = comps[ci]
                    for by in range(v):
                        for bx in range(h):
                            zz = coefs[ci][my * v + by, mx * h + bx]
                            _dec_dc_prog(bits, dct, zz, preds, ci, ah, al)
                since += 1
    else:  # non-interleaved: the component's true block grid
        ci, dct, act = scan_comps[0]
        bw, bh = _comp_blocks(frame, ci)
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and since == restart_interval:
                    bits.restart()
                    preds = [0] * len(comps)
                    state["eobrun"] = 0
                    since = 0
                zz = coefs[ci][by, bx]
                if dc_scan:
                    _dec_dc_prog(bits, dct, zz, preds, ci, ah, al)
                elif ah == 0:
                    _dec_ac_first(bits, act, zz, ss, se, al, state)
                else:
                    _dec_ac_refine(bits, act, zz, ss, se, al, state)
                since += 1
    # skip entropy padding to the next marker (stray RSTn consumed)
    pos = bits.pos
    while pos + 1 < len(b):
        if b[pos] == 0xFF and b[pos + 1] != 0x00:
            if 0xD0 <= b[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise _JpegError("no marker after scan")


def _progressive_finish(
    frame, qt: dict[int, np.ndarray], coefs: list[np.ndarray]
) -> tuple[int, int, int, bytearray]:
    """One vectorized dequantize + IDCT pass over the accumulated
    coefficients, then the shared upsample/color tail."""
    height, width, comps = frame
    _, _, hmax, vmax = _grid_dims(frame)
    zig = np.array(ZIGZAG)
    planes = []
    for (cid, h, v, tq), cf in zip(comps, coefs):
        if tq not in qt:
            raise _JpegError("missing quant table")
        quant = qt[tq]  # raster order
        raster = np.zeros(cf.shape, dtype=np.float64)
        raster[..., zig] = cf.astype(np.float64) * quant[zig]
        by, bx = cf.shape[0], cf.shape[1]
        blocks = raster.reshape(by, bx, 8, 8)
        pix = np.einsum("xu,abuv,yv->abxy", _M, blocks, _M) + 128.0
        planes.append((h, v, pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)))
    return _to_pixels(planes, width, height, hmax, vmax)


# --------------------------------------------------------------------------
# Encoder (test harness for the decoder; also a valid baseline writer).

# Fixed-length canonical tables: every DC category at 4 bits (12 codes),
# every possible AC run/size symbol at 8 bits (162 codes).  Valid prefix
# codes by construction — deliberately NOT the Annex-K typical tables, so
# the decoder's table handling is exercised with nothing memorized.
_DC_SYMBOLS = bytes(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_SYMBOLS = bytes([0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0])
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8
_DC_CODES = {sym: (4, code) for code, sym in enumerate(_DC_SYMBOLS)}
_AC_CODES = {sym: (8, code) for code, sym in enumerate(_AC_SYMBOLS)}

# Progressive AC alphabet: the sequential run/size symbols plus EOBn
# (r<<4 for r=0..14 — end-of-band runs of 2^r..2^{r+1}-1 blocks).
# 176 codes, all 8 bits — canonical by construction.
_ACP_SYMBOLS = bytes(
    [r << 4 for r in range(15)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
)
_ACP_COUNTS = [0, 0, 0, 0, 0, 0, 0, 176] + [0] * 8
_ACP_CODES = {sym: (8, code) for code, sym in enumerate(_ACP_SYMBOLS)}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _category(v: int) -> int:
    return abs(v).bit_length()


def _encode_block(
    w: _BitWriter, coeff_q: np.ndarray, pred: int
) -> int:
    """Quantized raster-order int coefficients -> entropy-coded bits."""
    dc = int(coeff_q[0])
    diff = dc - pred
    s = _category(diff)
    ln, code = _DC_CODES[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    zz = [int(coeff_q[ZIGZAG[k]]) for k in range(64)]
    run = 0
    last = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            if k > last:
                break
            run += 1
            if run == 16:
                ln, code = _AC_CODES[0xF0]
                w.write(code, ln)
                run = 0
            continue
        s = _category(v)
        ln, code = _AC_CODES[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        ln, code = _AC_CODES[0x00]  # EOB
        w.write(code, ln)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _pad_to_blocks(plane: np.ndarray, bw: int, bh: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")


def _quantized_grids(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quant: int,
    subsample: tuple[int, int],
) -> tuple[list[tuple[int, int]], list[np.ndarray], int, int]:
    """Shared encoder front half: color convert, subsample, pad, FDCT,
    quantize.  Returns (samp, grids, mcus_x, mcus_y) with ``grids[ci]`` a
    (by, bx, 64) int array of ZIGZAG-order quantized coefficients at the
    MCU-padded block grid — the single coefficient source both the baseline
    and progressive writers entropy-code, which is what makes their decodes
    bit-identical."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if not 1 <= quant <= 255:
        raise ValueError("quant must fit an 8-bit table")
    sh, sv = subsample
    if channels == 1:
        sh = sv = 1
    if not (1 <= sh <= 2 and 1 <= sv <= 2):
        raise ValueError("subsample factors must be 1 or 2")
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(height, width, channels).astype(np.float64)
    if channels == 1:
        comps = [arr[:, :, 0]]
        samp = [(1, 1)]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if (sh, sv) != (1, 1):
            # Box-average chroma over sh×sv neighborhoods (edge-padded).
            ph = _pad_to_blocks(cb, -(-width // sh) * sh, -(-height // sv) * sv)
            pr = _pad_to_blocks(cr, -(-width // sh) * sh, -(-height // sv) * sv)
            cb = ph.reshape(ph.shape[0] // sv, sv, ph.shape[1] // sh, sh).mean(axis=(1, 3))
            cr = pr.reshape(pr.shape[0] // sv, sv, pr.shape[1] // sh, sh).mean(axis=(1, 3))
        comps = [y, cb, cr]
        samp = [(sh, sv), (1, 1), (1, 1)]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    zig = np.array(ZIGZAG)
    grids = []
    for c, (h, v) in zip(comps, samp):
        plane = _pad_to_blocks(c, mcus_x * 8 * h, mcus_y * 8 * v)
        by, bx = mcus_y * v, mcus_x * h
        blocks = (
            plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
        )
        coeff = np.einsum("xu,abxy,yv->abuv", _M, blocks, _M)  # Mᵀ B M
        cq = np.clip(np.rint(coeff / float(quant)), -1023, 1023).astype(np.int32)
        grids.append(cq.reshape(by, bx, 64)[..., zig])
    return samp, grids, mcus_x, mcus_y


def jpeg_encode(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quant: int = 1,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Encode raw row-major 8-bit pixels as a valid baseline JPEG (SOF0).

    ``quant`` fills a flat quantization table (1 = near-lossless up to DCT
    rounding); ``subsample=(2, 2)`` writes 4:2:0 chroma (box-average
    downsample), ``(1, 1)`` writes 4:4:4.  Grayscale input (channels=1)
    writes a single-component frame.  Inverse of :func:`jpeg_decode` up to
    quantization error.
    """
    samp, grids, mcus_x, mcus_y = _quantized_grids(
        pixels, width, height, channels, quant, subsample
    )
    comps = samp
    w = _BitWriter()
    preds = [0] * len(comps)
    since_restart = 0
    n_restarts = 0
    zig_inv = np.zeros(64, dtype=np.int64)
    zig_inv[np.array(ZIGZAG)] = np.arange(64)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_restart == restart_interval:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + (n_restarts % 8)])
                n_restarts += 1
                since_restart = 0
                preds = [0] * len(comps)
            since_restart += 1
            for ci, ((h, v), grid) in enumerate(zip(samp, grids)):
                for by in range(v):
                    for bx in range(h):
                        zz = grid[my * v + by, mx * h + bx]
                        preds[ci] = _encode_block(w, zz[zig_inv], preds[ci])
    w.flush()

    dqt = bytes([0x00]) + bytes([quant] * 64)
    ncomp = len(samp)
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([ncomp])
    sos = bytes([ncomp])
    for ci, (h, v) in enumerate(samp):
        sof += bytes([ci + 1, (h << 4) | v, 0])
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for every comp
    sos += bytes([0, 63, 0])
    dht = (
        bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS
        + bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS
    )
    dri = _seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    return (
        b"\xff\xd8"
        + dri
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht)
        + _seg(0xDA, sos)
        + bytes(w.out)
        + b"\xff\xd9"
    )


# --------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G.1, the jcphuff control flow): entropy-
# codes the SAME quantized coefficient grids as the baseline writer across a
# spectral-selection + successive-approximation scan script, so
# ``jpeg_decode(jpeg_encode_progressive(px)) ==
# jpeg_decode(jpeg_encode(px))`` exactly — the equivalence the round-trip
# tests pin (two completely different bitstream paths, one pixel answer).


def _emit_bits_val(w: _BitWriter, v: int, s: int) -> None:
    w.write(v if v >= 0 else v + (1 << s) - 1, s)


def _emit_eobrun(w: _BitWriter, st: dict) -> None:
    """Flush a pending EOBn: symbol, run-length extra bits, then every
    buffered correction bit of the run's member blocks (in order)."""
    n = st["eobrun"]
    if n <= 0:
        return
    nbits = n.bit_length() - 1
    ln, code = _ACP_CODES[nbits << 4]
    w.write(code, ln)
    if nbits:
        w.write(n & ((1 << nbits) - 1), nbits)
    for bit in st["be"]:
        w.write(bit, 1)
    st["eobrun"] = 0
    st["be"] = []


def _enc_dc_scan(
    w, samp, grids, mcus_x, mcus_y, ah: int, al: int, restart_interval: int = 0
) -> None:
    """Interleaved DC scan: first pass Huffman-codes diffs of dc>>Al;
    refinement emits one raw bit (bit Al) per block.  ``restart_interval``
    emits RSTn every that many MCUs (byte-aligned, predictors reset) —
    the per-scan restart machinery progressive decoders must handle."""
    preds = [0] * len(grids)
    since = n_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since == restart_interval:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
                n_rst += 1
                since = 0
                preds = [0] * len(grids)
            since += 1
            for ci, ((h, v), grid) in enumerate(zip(samp, grids)):
                for by in range(v):
                    for bx in range(h):
                        dc = int(grid[my * v + by, mx * h + bx][0])
                        if ah == 0:
                            t = dc >> al
                            diff = t - preds[ci]
                            preds[ci] = t
                            s = _category(diff)
                            ln, code = _DC_CODES[s]
                            w.write(code, ln)
                            if s:
                                _emit_bits_val(w, diff, s)
                        else:
                            w.write((dc >> al) & 1, 1)


def _enc_ac_first_scan(w, grid, bw: int, bh: int, ss: int, se: int, al: int) -> None:
    st = {"eobrun": 0, "be": []}
    for by in range(bh):
        for bx in range(bw):
            zz = grid[by, bx]
            r = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al  # point transform: magnitude shift
                if t == 0:
                    r += 1
                    continue
                _emit_eobrun(w, st)
                while r > 15:
                    ln, code = _ACP_CODES[0xF0]
                    w.write(code, ln)
                    r -= 16
                s = t.bit_length()
                ln, code = _ACP_CODES[(r << 4) | s]
                w.write(code, ln)
                _emit_bits_val(w, t if v >= 0 else -t, s)
                r = 0
            if r > 0:  # trailing zeros fold into the EOB run
                st["eobrun"] += 1
                if st["eobrun"] == 0x7FFF:
                    _emit_eobrun(w, st)
    _emit_eobrun(w, st)


def _enc_ac_refine_scan(w, grid, bw: int, bh: int, ss: int, se: int, al: int) -> None:
    """AC successive-approximation refinement (jcphuff encode_mcu_AC_refine
    flow): ±1 significances Huffman-coded, one buffered correction bit per
    already-nonzero coefficient, EOB runs carrying the buffered bits."""
    st = {"eobrun": 0, "be": []}
    for by in range(bh):
        for bx in range(bw):
            zz = grid[by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eobpos = -1  # last newly-significant position (relative)
            for idx, t in enumerate(absv):
                if t == 1:
                    eobpos = idx
            r = 0
            br: list[int] = []
            for idx, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and idx <= eobpos:
                    _emit_eobrun(w, st)
                    ln, code = _ACP_CODES[0xF0]
                    w.write(code, ln)
                    r -= 16
                    for bit in br:
                        w.write(bit, 1)
                    br = []
                if t > 1:  # already significant: buffer its correction bit
                    br.append(t & 1)
                    continue
                _emit_eobrun(w, st)
                ln, code = _ACP_CODES[(r << 4) | 1]
                w.write(code, ln)
                w.write(0 if int(zz[ss + idx]) < 0 else 1, 1)
                for bit in br:
                    w.write(bit, 1)
                br = []
                r = 0
            if r > 0 or br:
                st["eobrun"] += 1
                st["be"].extend(br)
                if st["eobrun"] == 0x7FFF or len(st["be"]) > 900:
                    _emit_eobrun(w, st)
    _emit_eobrun(w, st)


def jpeg_encode_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quant: int = 1,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Encode raw row-major 8-bit pixels as a valid progressive JPEG (SOF2).

    Scan script (the classic spectral-selection + one-bit successive
    approximation): interleaved DC at Al=1 → per-component AC bands (1–5,
    6–63) at Al=1 → DC refinement → per-component AC band refinements.
    Exercises every progressive decode path: DC first/refine, AC first with
    ZRL + EOBn runs, AC refinement with correction bits.
    ``restart_interval`` adds DRI + RSTn markers to the two DC scans (then
    DRI=0 before the AC scans — DRI is re-definable per scan, T.81 B.2.4.4).
    """
    samp, grids, mcus_x, mcus_y = _quantized_grids(
        pixels, width, height, channels, quant, subsample
    )
    ncomp = len(samp)
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)

    def true_dims(ci: int) -> tuple[int, int]:
        h, v = samp[ci]
        comp_w = -(-width * h // hmax)
        comp_h = -(-height * v // vmax)
        return -(-comp_w // 8), -(-comp_h // 8)

    def sos(comp_list: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        p = bytes([len(comp_list)])
        for cid in comp_list:
            p += bytes([cid, 0x00])  # DC table 0 / AC table 0 throughout
        return p + bytes([ss, se, (ah << 4) | al])

    bands = [(1, 5), (6, 63)]
    # (pre-SOS sibling segments, SOS header payload, entropy data) — the
    # DRI toggles between DC scans (restarts on) and AC scans (off);
    # per-scan DRI redefinition is T.81 B.2.4.4.
    scans: list[tuple[bytes, bytes, bytes]] = []
    dri_on = _seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    dri_off = _seg(0xDD, (0).to_bytes(2, "big")) if restart_interval else b""
    w = _BitWriter()
    _enc_dc_scan(w, samp, grids, mcus_x, mcus_y, 0, 1, restart_interval)
    w.flush()
    scans.append((dri_on, sos(list(range(1, ncomp + 1)), 0, 0, 0, 1), bytes(w.out)))
    for ci in range(ncomp):
        bw, bh = true_dims(ci)
        for ss, se in bands:
            w = _BitWriter()
            _enc_ac_first_scan(w, grids[ci], bw, bh, ss, se, 1)
            w.flush()
            scans.append((dri_off, sos([ci + 1], ss, se, 0, 1), bytes(w.out)))
            dri_off = b""  # later AC scans inherit DRI=0
    w = _BitWriter()
    _enc_dc_scan(w, samp, grids, mcus_x, mcus_y, 1, 0, restart_interval)
    w.flush()
    scans.append((dri_on, sos(list(range(1, ncomp + 1)), 0, 0, 1, 0), bytes(w.out)))
    dri_off2 = _seg(0xDD, (0).to_bytes(2, "big")) if restart_interval else b""
    for ci in range(ncomp):
        bw, bh = true_dims(ci)
        for ss, se in bands:
            w = _BitWriter()
            _enc_ac_refine_scan(w, grids[ci], bw, bh, ss, se, 0)
            w.flush()
            scans.append((dri_off2, sos([ci + 1], ss, se, 1, 0), bytes(w.out)))
            dri_off2 = b""

    dqt = bytes([0x00]) + bytes([quant] * 64)
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([ncomp])
    for ci, (h, v) in enumerate(samp):
        sof += bytes([ci + 1, (h << 4) | v, 0])
    dht = (
        bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS
        + bytes([0x10]) + bytes(_ACP_COUNTS) + _ACP_SYMBOLS
    )
    out = b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof) + _seg(0xC4, dht)
    for pre, hdr, data in scans:
        out += pre + _seg(0xDA, hdr) + data
    return out + b"\xff\xd9"
