"""Baseline JPEG codec (stdlib + numpy, no codec library).

Sequential baseline JPEG (SOF0/SOF1) is mechanically decodable without
libjpeg: marker walk → quant/Huffman table state → per-MCU canonical-Huffman
entropy decode → dequantize → 8×8 IDCT → chroma upsample → YCbCr→RGB.  The
reference has no media columns at all (this module is part of the engine's
multimodal extension, BASELINE.json north star); the pixel math here follows
the public JPEG specification (ITU-T T.81) the way ``png_decode`` follows
the PNG spec.

Decoder scope (anything else returns ``None`` and the caller falls back,
same contract as :func:`multimodal.png_decode`):

- SOF0/SOF1, 8-bit precision, 1 (grayscale) or 3 (YCbCr) components;
- sampling factors 1–2 per axis (4:4:4, 4:2:2, 4:4:0, 4:2:0), restart
  markers, 8/16-bit quant tables;
- progressive (SOF2+), arithmetic coding, 12-bit, and CMYK are refused.

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
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD9:  # EOI before any scan
            return None
        if 0xD0 <= marker <= 0xD8:  # RST/SOI stray: no length field
            i += 2
            continue
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
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended-seq
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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            if len(seg) != 2:
                return None
            restart_interval = int.from_bytes(seg, "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            return _decode_scan(b, i + 2 + ln, seg, frame, qt, huff, restart_interval)
        # APPn / COM / others: skip
        i += 2 + ln
    return None


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
    ys = np.arange(height)
    xs = np.arange(width)
    full = []
    for (h, v, _, _, _, plane) in meta:
        full.append(plane[np.ix_(ys * v // vmax, xs * h // hmax)])
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
    qraster = np.full(64, float(quant))
    padded = [
        _pad_to_blocks(c, mcus_x * 8 * h, mcus_y * 8 * v)
        for c, (h, v) in zip(comps, samp)
    ]

    w = _BitWriter()
    preds = [0] * len(comps)
    since_restart = 0
    n_restarts = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_restart == restart_interval:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + (n_restarts % 8)])
                n_restarts += 1
                since_restart = 0
                preds = [0] * len(comps)
            since_restart += 1
            for ci, ((h, v), plane) in enumerate(zip(samp, padded)):
                for by in range(v):
                    for bx in range(h):
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coeff = _M.T @ block @ _M
                        cq = np.rint(coeff / qraster.reshape(8, 8))
                        cq = np.clip(cq, -1023, 1023)  # baseline AC size <= 10
                        preds[ci] = _encode_block(w, cq.reshape(64), preds[ci])
    w.flush()

    dqt = bytes([0x00]) + bytes([quant] * 64)
    ncomp = len(comps)
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
