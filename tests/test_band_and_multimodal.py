"""Unit tests: band-join NULL-arm semantics (SURVEY.md §2.3 J4/J5) and
multimodal asset plumbing (operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from olap_sus_spark.operators.joins import band_join, band_label
from olap_sus_spark.operators.multimodal import (
    extract_metadata,
    sample_frames,
    text_as_assets,
)


def _bands(spark):
    # Mirrors dimDemografia's band layout: 'Ignorado' member has NULL ends
    # (scripts/init.sql:181-182 semantics).
    return spark.createDataFrame(
        [("Ignorado", None, None), ("0-9", 0, 9), ("10+", 10, None)],
        "banda string, lo int, hi int",
    )


def _facts(spark):
    return spark.createDataFrame(
        [(1, 5), (2, 10), (3, 999), (4, None)], "id int, idade int"
    )


@pytest.mark.slow  # heavy probe: opt-in via -m slow (r11)
def test_band_join_null_arm_matches_sentinel(spark):
    """SINASC semantics (spark_script_sinasc.py:224-227): NULL value joins
    exactly the band whose lower bound is NULL."""
    out = band_join(
        _facts(spark), _bands(spark), "idade", "lo", "hi", how="left", null_arm=True
    ).select("id", "banda")
    got = {r["id"]: r["banda"] for r in out.collect()}
    assert got == {1: "0-9", 2: "10+", 3: "10+", 4: "Ignorado"}


def test_band_join_without_null_arm_drops_null(spark):
    """SIM semantics (spark_script_sim.py:367): no NULL arm → NULL age
    matches nothing (left join leaves the key NULL)."""
    out = band_join(
        _facts(spark), _bands(spark), "idade", "lo", "hi", how="left", null_arm=False
    ).select("id", "banda")
    got = {r["id"]: r["banda"] for r in out.collect()}
    assert got[4] is None


def test_band_label_equals_band_join(spark):
    labeled = _facts(spark).select(
        "id",
        band_label(
            F.col("idade"), [("0-9", 0, 9), ("10+", 10, None)], null_label="Ignorado"
        ).alias("banda"),
    )
    got = {r["id"]: r["banda"] for r in labeled.collect()}
    assert got == {1: "0-9", 2: "10+", 3: "10+", 4: "Ignorado"}


def test_text_as_assets_and_metadata(spark):
    docs = spark.createDataFrame([(1, "olá"), (2, ""), (3, None)], "doc_id long, text string")
    meta = extract_metadata(text_as_assets(docs, "doc_id", "text")).collect()
    by_id = {r["asset_id"]: r for r in meta}
    # UTF-8: 'olá' is 4 bytes; digest matches hashlib on the same bytes.
    assert by_id[1]["n_bytes"] == 4
    assert by_id[1]["digest"] == hashlib.md5("olá".encode()).hexdigest()
    assert by_id[2]["n_bytes"] == 0
    assert by_id[3]["n_bytes"] is None and by_id[3]["digest"] is None


def test_sample_frames_shape(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 640), (2, "y" * 64)], "doc_id long, text string"
    )
    frames = sample_frames(text_as_assets(docs, "doc_id", "text"), every_nth=3).collect()
    assert {f.asset_id for f in frames} == {1, 2}
    # asset 1: 10 fake slices, every 3rd kept -> indices 0,3,6,9
    assert sorted(f.frame_index for f in frames if f.asset_id == 1) == [0, 3, 6, 9]
    assert all(isinstance(f.frame, (bytes, bytearray)) for f in frames)


def test_resize_and_features_batch_shapes(spark):
    from olap_sus_spark.operators import multimodal as mm
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "another payload")],
        "doc_id long, text string",
    )
    assets = mm.text_as_assets(docs, "doc_id", "text")

    resized = mm.resize_images(assets, width=32, height=32).collect()
    by_id = {r.asset_id: r for r in resized}
    # every input row survives (operator is total) but non-images resize
    # to NULL — no fabricated pixels (round 7)
    assert set(by_id) == {1, 2, 3}
    for r in resized:
        assert r.payload is None and r.width is None and r.height is None

    feats = {r.asset_id: r.embedding for r in mm.extract_features(assets, dim=8).collect()}
    assert feats[2] is None
    assert len(feats[1]) == 8
    # model output: L2-unit, deterministic, distinct payloads -> distinct vectors
    assert abs(sum(v * v for v in feats[1]) - 1.0) < 1e-5
    again = {r.asset_id: r.embedding for r in mm.extract_features(assets, dim=8).collect()}
    assert list(again[1]) == list(feats[1])
    assert list(feats[1]) != list(feats[3])


def test_parse_image_dimensions_edge_cases():
    """Pure-Python header parser: real headers, truncation, unknown bytes."""
    from olap_sus_spark.operators import multimodal as mm

    png = (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00" + b"\xde\xad\xbe\xef"
    )
    assert mm.parse_image_dimensions(png) == ("image/png", 640, 480)
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\xf7\x00\x00"
    assert mm.parse_image_dimensions(gif) == ("image/gif", 320, 200)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"  # APP0 skipped
        + b"\xff\xc2\x00\x11\x08"  # progressive SOF2 counts too
        + (99).to_bytes(2, "big") + (123).to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01" + b"\xff\xd9"
    )
    assert mm.parse_image_dimensions(jpeg) == ("image/jpeg", 123, 99)
    assert mm.parse_image_dimensions(None) == (None, None, None)
    assert mm.parse_image_dimensions(b"not an image") == (None, None, None)
    assert mm.parse_image_dimensions(png[:20]) == (None, None, None)  # truncated IHDR
    assert mm.parse_image_dimensions(b"\xff\xd8\xff\xd9") == ("image/jpeg", None, None)


def _hand_png(width, height, rows_with_filters, channels=3):
    """Independent PNG writer for fixtures: applies the requested per-row
    filter FORWARD by hand (separate from the operator's codec, so the
    decode test isn't self-referential)."""
    import zlib

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    stride = width * channels
    raw = b""
    prev = bytes(stride)
    for f, row in rows_with_filters:
        line = bytearray()
        for x in range(stride):
            left = row[x - channels] if x >= channels else 0
            up = prev[x]
            ul = prev[x - channels] if x >= channels else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1, 4: paeth(left, up, ul)}[f]
            line.append((row[x] - pred) & 0xFF)
        raw += bytes([f]) + bytes(line)
        prev = row
    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + bytes([8, color, 0, 0, 0])

    def chunk(typ, data):
        return len(data).to_bytes(4, "big") + typ + data + zlib.crc32(typ + data).to_bytes(4, "big")

    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    """The decoder must invert every PNG filter (None/Sub/Up/Average/Paeth)
    on a fixture whose filtered bytes were computed independently."""
    from olap_sus_spark.operators import multimodal as mm

    rows = [
        bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]),  # 4px RGB
        bytes([13, 37, 200, 255, 0, 128, 64, 32, 16, 8, 4, 2]),
        bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]),
        bytes([250, 251, 252, 253, 254, 255, 0, 1, 2, 3, 4, 5]),
        bytes([100, 99, 98, 97, 96, 95, 94, 93, 92, 91, 90, 89]),
    ]
    payload = _hand_png(4, 5, list(zip([0, 1, 2, 3, 4], rows)))
    got = mm.png_decode(payload)
    assert got is not None
    w, h, ch, pix = got
    assert (w, h, ch) == (4, 5, 3)
    assert bytes(pix) == b"".join(rows)
    # round-trip through the operator's own encoder
    again = mm.png_decode(mm.png_encode(pix, w, h, ch))
    assert again is not None and bytes(again[3]) == bytes(pix)
    # non-PNG / truncated inputs refuse cleanly
    assert mm.png_decode(b"GIF89a\x00\x00") is None
    assert mm.png_decode(payload[:40]) is None
    assert mm.png_decode(None) is None


def test_png_adam7_decodes_identical_to_sequential():
    """Round 6: Adam7 interlace is a second on-disk layout of the same
    pixels (7 independently-filtered sub-images scattered on the grid) —
    the decode must be bit-identical to the sequential decode, for every
    channel count and ragged dims (empty passes included)."""
    import numpy as np

    from olap_sus_spark.operators import multimodal as mm

    rng = np.random.default_rng(11)
    for w, h, ch in [(16, 16, 3), (17, 13, 3), (1, 1, 1), (7, 3, 4), (9, 21, 2), (2, 9, 3)]:
        pix = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
        seq = mm.png_decode(mm.png_encode(pix, w, h, ch))
        adam = mm.png_decode(mm.png_encode(pix, w, h, ch, interlace=True))
        assert seq is not None and adam is not None, (w, h, ch)
        assert bytes(seq[3]) == pix and bytes(adam[3]) == pix, (w, h, ch)


def test_png_palette_all_depths_and_interlace():
    """Indexed-color PNG (type 3) at depths 1/2/4/8, sequential and Adam7:
    decodes to exactly the palette colors; out-of-range indices refuse."""
    import numpy as np

    from olap_sus_spark.operators import multimodal as mm

    rng = np.random.default_rng(13)
    for depth in (1, 2, 4, 8):
        ncol = 1 << depth
        pal = bytes(rng.integers(0, 256, ncol * 3, dtype=np.uint8))
        for w, h in [(10, 7), (16, 16), (3, 1), (23, 9)]:
            idx = bytes(rng.integers(0, ncol, w * h, dtype=np.uint8))
            expected = b"".join(pal[3 * i : 3 * i + 3] for i in idx)
            for inter in (False, True):
                dec = mm.png_decode(
                    mm.png_encode_palette(idx, w, h, pal, depth=depth, interlace=inter)
                )
                assert dec is not None, (depth, w, h, inter)
                assert (dec[0], dec[1], dec[2]) == (w, h, 3)
                assert bytes(dec[3]) == expected, (depth, w, h, inter)
    # hostile: an index past the palette end must refuse, not wrap
    short_pal = bytes(rng.integers(0, 256, 2 * 3, dtype=np.uint8))  # 2 colors
    bad = mm.png_encode_palette(bytes([0, 1, 3, 1]), 2, 2, short_pal, depth=8)
    assert mm.png_decode(bad) is None
    # palette image with no PLTE chunk at all refuses
    import zlib as _z

    no_plte = mm.png_encode_palette(bytes([0, 1, 1, 0]), 2, 2, short_pal)
    plte_at = no_plte.index(b"PLTE") - 4
    plte_len = int.from_bytes(no_plte[plte_at : plte_at + 4], "big")
    stripped = no_plte[:plte_at] + no_plte[plte_at + 12 + plte_len :]
    assert mm.png_decode(stripped) is None


def test_gif_interlaced_decodes_identical_to_sequential():
    """GIF 4-pass interlacing is a row permutation; the decoder must undo
    it exactly (including odd heights where late passes dominate)."""
    from olap_sus_spark.operators import multimodal as mm

    R, G, B, Y = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)
    for w, h in [(4, 4), (5, 9), (3, 1), (8, 13), (2, 2)]:
        idx = [(x * 3 + y * 7) % 4 for y in range(h) for x in range(w)]
        plain = mm.gif_decode(_hand_gif(w, h, [R, G, B, Y], idx))
        inter = mm.gif_decode(_hand_gif(w, h, [R, G, B, Y], idx, interlace=True))
        assert plain is not None and inter is not None, (w, h)
        assert bytes(plain[3]) == bytes(inter[3]), (w, h)


def test_png_decode_bounded_against_hostile_payloads():
    """Untrusted-payload guards: a deflate bomb whose IDAT inflates far past
    the declared dimensions must be rejected WITHOUT materializing the bomb
    (bounded decompressobj), and absurd declared dimensions must refuse
    before allocating."""
    import zlib

    from olap_sus_spark.operators import multimodal as mm

    def chunk(typ, data):
        return len(data).to_bytes(4, "big") + typ + data + zlib.crc32(typ + data).to_bytes(4, "big")

    def png(width, height, idat_raw):
        ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(idat_raw)) + chunk(b"IEND", b"")
        )

    # Declares 2x2 RGB (expected 2*(6+1)=14 raw bytes) but the IDAT
    # inflates to 64 MB of zeros (~64000:1 ratio).  The bounded path reads
    # at most expected+1 bytes and rejects on the overrun.
    bomb = png(2, 2, b"\x00" * (64 << 20))
    assert mm.png_decode(bomb) is None

    # Valid structure but declared dimensions past the pixel ceiling:
    # refuses before decompressing (pure-Python unfilter would take minutes).
    assert mm.png_decode(png(1 << 16, 1 << 16, b"")) is None

    # Truncated raw stream (shorter than declared) also rejects.
    assert mm.png_decode(png(4, 4, b"\x00" * 10)) is None

    # A well-formed payload at the same code path still decodes.
    ok = png(2, 1, b"\x00" + bytes([1, 2, 3, 4, 5, 6]))
    got = mm.png_decode(ok)
    assert got is not None and bytes(got[3]) == bytes([1, 2, 3, 4, 5, 6])


def test_resize_real_png_known_pixels(spark):
    """resize_images on a REAL PNG: decode → nearest-neighbor → re-encode,
    asserting exact pixel values (quadrant colors survive a 4x4 → 2x2
    downsample with center sampling)."""
    from olap_sus_spark.operators import multimodal as mm

    TL, TR, BL, BR = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)

    def quad_row(l, r):
        return bytes(l) * 2 + bytes(r) * 2

    rows = [quad_row(TL, TR)] * 2 + [quad_row(BL, BR)] * 2
    payload = _hand_png(4, 4, [(0, r) for r in rows])
    assets = spark.createDataFrame(
        [(1, bytearray(payload), "image/png")], mm.ASSET_SCHEMA
    )
    out = {r.asset_id: r for r in mm.resize_images(assets, 2, 2).collect()}
    r = out[1]
    assert (r.width, r.height) == (2, 2)
    # the output is itself a well-formed PNG with real pixels
    assert mm.parse_image_dimensions(bytes(r.payload)) == ("image/png", 2, 2)
    w, h, ch, pix = mm.png_decode(bytes(r.payload))
    assert (w, h, ch) == (2, 2, 3)
    assert bytes(pix) == bytes(TL) + bytes(TR) + bytes(BL) + bytes(BR)


def test_resize_progressive_jpeg_and_interlaced_formats(spark):
    """Round 6: resize_images takes the REAL pixel path for progressive
    JPEG, Adam7 PNG, and interlaced GIF — none fall to the digest fake
    (a fake payload is not a decodable PNG, which is the discriminator)."""
    from olap_sus_spark.operators import jpeg
    from olap_sus_spark.operators import multimodal as mm

    flat = bytes([120, 200, 64]) * (16 * 16)
    prog = jpeg.jpeg_encode_progressive(flat, 16, 16, 3)
    adam = mm.png_encode(flat, 16, 16, 3, interlace=True)
    R = (255, 0, 0)
    gif = _hand_gif(8, 8, [R, R, R, R], [0] * 64, interlace=True)
    assets = spark.createDataFrame(
        [
            (1, bytearray(prog), "image/jpeg"),
            (2, bytearray(adam), "image/png"),
            (3, bytearray(gif), "image/gif"),
        ],
        mm.ASSET_SCHEMA,
    )
    out = {r.asset_id: r for r in mm.resize_images(assets, 4, 4).collect()}
    for aid, want in [(1, (120, 200, 64)), (2, (120, 200, 64)), (3, R)]:
        dec = mm.png_decode(bytes(out[aid].payload))
        assert dec is not None, aid  # real path: output is a valid PNG
        w, h, ch, pix = dec
        assert (w, h, ch) == (4, 4, 3), aid
        assert all(
            abs(pix[3 * i + c] - want[c]) <= 1 for i in range(16) for c in range(3)
        ), aid


def _hand_gif(width, height, palette, indices, min_code_size=2, interlace=False):
    """Independent GIF writer for fixtures ("uncompressed"-style LZW: every
    pixel emitted as a literal code, CLEAR inserted before the code width
    would ever need to grow — decodes through any conformant LZW decoder
    but shares no code with the operator's decoder).  ``interlace=True``
    stores rows in the GIF 4-pass order."""
    if interlace:
        order = (
            list(range(0, height, 8))
            + list(range(4, height, 8))
            + list(range(2, height, 4))
            + list(range(1, height, 2))
        )
        indices = [indices[y * width + x] for y in order for x in range(width)]
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width_bits = min_code_size + 1

    bits = []  # (value, nbits), LSB-first
    bits.append((clear, width_bits))
    # after CLEAR the table holds clear+2 codes; each literal adds one
    # entry, and once the table reaches 2^width the width grows — emit a
    # CLEAR just before that to pin the width
    room = (1 << width_bits) - (clear + 2) - 1
    n_since = 0
    for i in indices:
        if n_since >= max(1, room):
            bits.append((clear, width_bits))
            n_since = 0
        bits.append((i, width_bits))
        n_since += 1
    bits.append((eoi, width_bits))
    acc = nacc = 0
    data = bytearray()
    for v, n in bits:
        acc |= v << nacc
        nacc += n
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)

    pal_pow = max(1, (len(palette) - 1).bit_length())
    pal = bytearray()
    for rgb in palette:
        pal += bytes(rgb)
    pal += b"\x00" * (3 * (1 << pal_pow) - len(pal))
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | (pal_pow - 1), 0, 0])  # GCT flag + size
    out += pal
    out += b"\x2c" + b"\x00\x00\x00\x00"
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])  # no LCT; interlace flag
    out += bytes([min_code_size])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_known_pixels():
    from olap_sus_spark.operators import multimodal as mm

    R, G, B, Y = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)
    payload = _hand_gif(2, 2, [R, G, B, Y], [0, 1, 2, 3])
    got = mm.gif_decode(payload)
    assert got is not None
    w, h, ch, pix = got
    assert (w, h, ch) == (2, 2, 3)
    assert bytes(pix) == bytes(R) + bytes(G) + bytes(B) + bytes(Y)
    # header probe agrees
    assert mm.parse_image_dimensions(payload) == ("image/gif", 2, 2)
    # a longer run exercises the mid-stream CLEAR resets of the writer
    idx = [(i * 7) % 4 for i in range(61 * 13)]
    w2 = _hand_gif(61, 13, [R, G, B, Y], idx)
    got2 = mm.gif_decode(w2)
    assert got2 is not None and (got2[0], got2[1]) == (61, 13)
    flat = bytes(got2[3])
    pal = [R, G, B, Y]
    assert all(
        flat[3 * i : 3 * i + 3] == bytes(pal[idx[i]]) for i in range(len(idx))
    )


def test_gif_lzw_dictionary_codes_and_kwkwk():
    """Hand-packed streams that use DICTIONARY codes (not just literals):
    the classic back-reference and the KwKwK corner case."""
    from olap_sus_spark.operators import multimodal as mm

    def pack(codes, width_bits=3):
        acc = nacc = 0
        out = bytearray()
        for v in codes:
            acc |= v << nacc
            nacc += width_bits
            while nacc >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
        if nacc:
            out.append(acc & 0xFF)
        return bytes(out)

    # CLEAR,0,1,6,EOI -> 0,1 then dict code 6 = [0,1] -> pixels 0,1,0,1
    out = mm._gif_lzw_decode(pack([4, 0, 1, 6, 5]), 2, 100)
    assert bytes(out) == bytes([0, 1, 0, 1])
    # CLEAR,0,6,EOI -> KwKwK: 6 not yet defined -> [0,0]; total 0,0,0
    out = mm._gif_lzw_decode(pack([4, 0, 6, 5]), 2, 100)
    assert bytes(out) == bytes([0, 0, 0])
    # bound: stream longer than the declared area refuses
    assert mm._gif_lzw_decode(pack([4, 0, 1, 6, 5]), 2, 3) is None
    # garbage code far past the table refuses
    assert mm._gif_lzw_decode(pack([4, 7, 5]), 2, 100) is None


def test_gif_decode_rejects_hostile():
    from olap_sus_spark.operators import multimodal as mm

    ok = _hand_gif(2, 2, [(1, 2, 3)] * 4, [0, 0, 0, 0])
    assert mm.gif_decode(ok) is not None
    assert mm.gif_decode(None) is None
    assert mm.gif_decode(b"NOTAGIF") is None
    assert mm.gif_decode(ok[:20]) is None  # truncated mid-structure
    desc = ok.index(b"\x2c")
    # declared dimensions past the pixel ceiling refuse before LZW work
    huge = bytearray(ok)
    huge[6:8] = (60000).to_bytes(2, "little")
    huge[8:10] = (60000).to_bytes(2, "little")
    huge[desc + 5 : desc + 7] = (60000).to_bytes(2, "little")
    huge[desc + 7 : desc + 9] = (60000).to_bytes(2, "little")
    assert mm.gif_decode(bytes(huge)) is None


def test_resize_real_gif_known_pixels(spark):
    """resize_images on a REAL GIF goes through gif_decode -> nearest
    resize -> png_encode (output container normalized to PNG)."""
    from olap_sus_spark.operators import multimodal as mm

    TL, TR, BL, BR = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)
    idx = [0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3]
    payload = _hand_gif(4, 4, [TL, TR, BL, BR], idx)
    assets = spark.createDataFrame(
        [(1, bytearray(payload), "image/gif")], mm.ASSET_SCHEMA
    )
    r = {x.asset_id: x for x in mm.resize_images(assets, 2, 2).collect()}[1]
    assert (r.width, r.height) == (2, 2)
    w, h, ch, pix = mm.png_decode(bytes(r.payload))
    assert (w, h, ch) == (2, 2, 3)
    assert bytes(pix) == bytes(TL) + bytes(TR) + bytes(BL) + bytes(BR)


# ---------------------------------------------------------------------------
# Property-based codec round-trips (hypothesis): the stdlib PNG/GIF pixel
# paths must survive arbitrary pixel content, not just the hand fixtures.


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    ch=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
def test_png_roundtrip_random_pixels(w, h, ch, data):
    from olap_sus_spark.operators import multimodal as mm

    pix = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch))
    )
    got = mm.png_decode(mm.png_encode(pix, w, h, ch))
    assert got is not None
    assert (got[0], got[1], got[2]) == (w, h, ch)
    assert bytes(got[3]) == pix


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 8),
    h=st.integers(1, 6),
    npal=st.sampled_from([2, 4, 8]),
    data=st.data(),
)
def test_gif_roundtrip_random_indices(w, h, npal, data):
    """Random palettes + random index streams through the independent
    uncompressed-style writer must decode to exactly the palette colors."""
    from olap_sus_spark.operators import multimodal as mm

    palette = [
        tuple(data.draw(st.lists(st.integers(0, 255), min_size=3, max_size=3)))
        for _ in range(npal)
    ]
    idx = data.draw(
        st.lists(st.integers(0, npal - 1), min_size=w * h, max_size=w * h)
    )
    mcs = max(2, (npal - 1).bit_length())
    payload = _hand_gif(w, h, palette, idx, min_code_size=mcs)
    got = mm.gif_decode(payload)
    assert got is not None
    gw, gh, gch, pix = got
    assert (gw, gh, gch) == (w, h, 3)
    for i, c in enumerate(idx):
        assert tuple(pix[3 * i : 3 * i + 3]) == palette[c]


# --------------------------------------------------------------------------
# Baseline JPEG codec (operators/jpeg.py) — VERDICT r4 #3: real pixel path.


def test_jpeg_known_pixels_flat_color():
    """A flat-color RGB JPEG decodes to exactly the source color (only the
    DC coefficient is non-zero, so quant=1 round-trip is exact up to DCT
    float rounding)."""
    from olap_sus_spark.operators import jpeg

    pix = bytes([120, 200, 64]) * (16 * 16)
    for sub in [(1, 1), (2, 2), (2, 1)]:
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(pix, 16, 16, 3, subsample=sub))
        assert dec is not None
        w, h, ch, out = dec
        assert (w, h, ch) == (16, 16, 3)
        assert all(abs(out[i] - pix[i]) <= 1 for i in range(len(pix))), sub


def test_jpeg_gradient_near_lossless_444():
    """quant=1 4:4:4: reconstruction error bounded by DCT+color rounding."""
    from olap_sus_spark.operators import jpeg

    w, h = 24, 17
    pix = bytearray()
    for y in range(h):
        for x in range(w):
            pix += bytes([(x * 11) % 256, (y * 7) % 256, (x + y) % 256])
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode(bytes(pix), w, h, 3))
    assert dec is not None
    dw, dh, ch, out = dec
    assert (dw, dh, ch) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(pix, out)) <= 4


def test_jpeg_grayscale_and_odd_dims():
    from olap_sus_spark.operators import jpeg

    w, h = 13, 9  # forces edge-padded partial blocks
    pix = bytes([(3 * i) % 256 for i in range(w * h)])
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode(pix, w, h, 1))
    assert dec is not None
    dw, dh, ch, out = dec
    assert (dw, dh, ch) == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(pix, out)) <= 3


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn: predictors reset and byte alignment at every interval."""
    from olap_sus_spark.operators import jpeg

    w, h = 48, 33
    pix = bytes([(i * 37 + (i // w) * 11) % 256 for i in range(w * h * 3)])
    enc = jpeg.jpeg_encode(pix, w, h, 3, restart_interval=2)
    assert b"\xff\xd0" in enc  # restart markers actually present
    dec = jpeg.jpeg_decode(enc)
    assert dec is not None and (dec[0], dec[1], dec[2]) == (w, h, 3)
    # corrupting a restart marker must fail closed, not crash
    bad = bytearray(enc)
    bad[enc.find(b"\xff\xd0") + 1] = 0xD9
    assert jpeg.jpeg_decode(bytes(bad)) is None


def test_jpeg_rejects_hostile_payloads():
    from olap_sus_spark.operators import jpeg

    pix = bytes([9, 30, 200]) * 64
    ok = jpeg.jpeg_encode(pix, 8, 8, 3)
    assert jpeg.jpeg_decode(ok) is not None
    assert jpeg.jpeg_decode(None) is None
    assert jpeg.jpeg_decode(b"") is None
    assert jpeg.jpeg_decode(b"notjpeg") is None
    assert jpeg.jpeg_decode(ok[: len(ok) // 2]) is None  # truncated entropy data
    assert jpeg.jpeg_decode(b"\xff\xd8\xff\xd9") is None  # no frame

    # declared-dimension bomb: huge SOF dims refused BEFORE any allocation
    bomb = bytearray(ok)
    sof = bomb.find(b"\xff\xc0")
    bomb[sof + 5 : sof + 9] = (60000).to_bytes(2, "big") + (60000).to_bytes(2, "big")
    assert jpeg.jpeg_decode(bytes(bomb)) is None

    # a baseline stream relabeled SOF2: its SOS (Ss=0, Se=63) is an invalid
    # progressive scan script -> fail closed
    prog = bytearray(ok)
    prog[sof + 1] = 0xC2
    assert jpeg.jpeg_decode(bytes(prog)) is None

    # garbage entropy stream: must fail closed (None) or decode into a
    # well-formed frame — never raise out of the decoder
    garbage = bytearray(ok)
    sos = garbage.find(b"\xff\xda")
    for i in range(sos + 14, min(len(garbage) - 2, sos + 40)):
        garbage[i] = 0xB7
    out = jpeg.jpeg_decode(bytes(garbage))
    assert out is None or (out[0], out[1], out[2]) == (8, 8, 3)


def test_jpeg_progressive_decodes_identical_to_baseline():
    """Progressive (SOF2) round 6: the progressive writer entropy-codes the
    SAME quantized coefficients as the baseline writer, so the two decodes
    must be BIT-IDENTICAL — two completely different bitstream paths
    (DC first/refine, AC bands with ZRL+EOBn runs, AC refinement with
    correction bits vs one interleaved sequential scan), one pixel answer.
    Covers gray/RGB, every subsampling mode, odd dims, partial MCUs."""
    import numpy as np

    from olap_sus_spark.operators import jpeg

    rng = np.random.default_rng(7)
    for w, h, ch, sub in [
        (16, 16, 1, (1, 1)),
        (16, 16, 3, (1, 1)),
        (17, 13, 3, (2, 2)),
        (24, 9, 3, (2, 1)),
        (8, 8, 3, (1, 2)),
        (33, 21, 3, (2, 2)),
    ]:
        pix = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
        base = jpeg.jpeg_decode(jpeg.jpeg_encode(pix, w, h, ch, subsample=sub))
        prog = jpeg.jpeg_decode(
            jpeg.jpeg_encode_progressive(pix, w, h, ch, subsample=sub)
        )
        assert base is not None and prog is not None, (w, h, ch, sub)
        assert base[:3] == prog[:3] == (w, h, ch), (w, h, ch, sub)
        assert bytes(base[3]) == bytes(prog[3]), (w, h, ch, sub)


def test_jpeg_progressive_known_pixels_and_near_lossless():
    """Known-pixel progressive decode (VERDICT r05 #4 done-criterion): flat
    color reconstructs exactly (±1), a gradient within DCT rounding."""
    from olap_sus_spark.operators import jpeg

    pix = bytes([120, 200, 64]) * (16 * 16)
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode_progressive(pix, 16, 16, 3))
    assert dec is not None and (dec[0], dec[1], dec[2]) == (16, 16, 3)
    assert all(abs(dec[3][i] - pix[i]) <= 1 for i in range(len(pix)))

    w, h = 24, 17
    grad = bytearray()
    for y in range(h):
        for x in range(w):
            grad += bytes([(x * 11) % 256, (y * 7) % 256, (x + y) % 256])
    dec = jpeg.jpeg_decode(jpeg.jpeg_encode_progressive(bytes(grad), w, h, 3))
    assert dec is not None
    assert max(abs(a - b) for a, b in zip(grad, dec[3])) <= 4


def test_jpeg_progressive_rejects_hostile_payloads():
    """Same fail-closed posture as baseline: truncation anywhere in the
    multi-scan stream, dimension bombs, and garbage entropy data must
    return None (or a well-formed frame), never raise."""
    from olap_sus_spark.operators import jpeg

    pix = bytes([9, 30, 200]) * 64
    ok = jpeg.jpeg_encode_progressive(pix, 8, 8, 3)
    assert jpeg.jpeg_decode(ok) is not None
    # truncations at every region: header, mid-scan, missing EOI
    for cut in (10, len(ok) // 3, len(ok) // 2, len(ok) - 2):
        assert jpeg.jpeg_decode(ok[:cut]) is None, cut

    bomb = bytearray(ok)
    sof = bomb.find(b"\xff\xc2")
    bomb[sof + 5 : sof + 9] = (60000).to_bytes(2, "big") * 2
    assert jpeg.jpeg_decode(bytes(bomb)) is None

    garbage = bytearray(ok)
    sos = garbage.find(b"\xff\xda")
    for i in range(sos + 14, min(len(garbage) - 2, sos + 40)):
        garbage[i] = 0xB7
    out = jpeg.jpeg_decode(bytes(garbage))
    assert out is None or (out[0], out[1], out[2]) == (8, 8, 3)


def test_jpeg_progressive_restart_markers():
    """Progressive DC scans with DRI/RSTn (predictors reset, byte-aligned,
    per-scan DRI redefinition turning restarts off for the AC scans):
    decode must still be bit-identical to baseline; a corrupted RSTn fails
    closed."""
    import numpy as np

    from olap_sus_spark.operators import jpeg

    rng = np.random.default_rng(19)
    for w, h, ch, sub, ri in [(48, 33, 3, (1, 1), 2), (17, 13, 3, (2, 2), 1)]:
        px = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
        base = jpeg.jpeg_decode(jpeg.jpeg_encode(px, w, h, ch, subsample=sub))
        prog = jpeg.jpeg_encode_progressive(
            px, w, h, ch, subsample=sub, restart_interval=ri
        )
        assert b"\xff\xd0" in prog
        dec = jpeg.jpeg_decode(prog)
        assert dec is not None and bytes(dec[3]) == bytes(base[3]), (w, h, ch)
    bad = bytearray(prog)
    bad[prog.find(b"\xff\xd0") + 1] = 0xD9
    assert jpeg.jpeg_decode(bytes(bad)) is None


def test_jpeg_progressive_midstream_dht_redefinition():
    """T.81 allows DHT segments between scans; the multi-scan walk must
    pick up tables defined AFTER earlier scans.  Surgery on the writer's
    output: split the combined DHT into DC-only up front and re-emit the
    AC table just before the first AC scan — decode must be identical;
    with the AC table never defined, the first AC scan fails closed."""
    import re

    from olap_sus_spark.operators import jpeg

    px = bytes([(i * 7) % 256 for i in range(16 * 16 * 3)])
    enc = jpeg.jpeg_encode_progressive(px, 16, 16, 3)
    ref = jpeg.jpeg_decode(enc)
    b = bytearray(enc)
    dht_at = b.find(b"\xff\xc4")
    ln = int.from_bytes(b[dht_at + 2 : dht_at + 4], "big")
    seg = bytes(b[dht_at + 4 : dht_at + 2 + ln])
    dc_len = 1 + 16 + 12  # [class|id][16 counts][12 DC symbols]
    dc_seg, ac_seg = seg[:dc_len], seg[dc_len:]

    def mkseg(payload):
        return b"\xff\xc4" + (len(payload) + 2).to_bytes(2, "big") + payload

    rest = bytes(b[dht_at + 2 + ln :])
    head = bytes(b[:dht_at]) + mkseg(dc_seg)
    sos = [m.start() for m in re.finditer(b"\xff\xda", rest)]
    patched = head + rest[: sos[1]] + mkseg(ac_seg) + rest[sos[1] :]
    out = jpeg.jpeg_decode(patched)
    assert out is not None and bytes(out[3]) == bytes(ref[3])
    assert jpeg.jpeg_decode(head + rest) is None  # AC table never defined


def test_jpeg_dimension_probe_agrees_with_decoder():
    """parse_image_dimensions (header walk) and jpeg_decode (full decode)
    must report the same geometry on the same payload."""
    from olap_sus_spark.operators import jpeg
    from olap_sus_spark.operators import multimodal as mm

    pix = bytes([40, 90, 17]) * (20 * 12)
    enc = jpeg.jpeg_encode(pix, 20, 12, 3, subsample=(2, 2))
    assert mm.parse_image_dimensions(enc) == ("image/jpeg", 20, 12)
    dec = jpeg.jpeg_decode(enc)
    assert (dec[0], dec[1]) == (20, 12)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 14),
    ch=st.sampled_from([1, 3]),
    sub=st.sampled_from([(1, 1), (2, 2), (2, 1), (1, 2)]),
    data=st.data(),
)
def test_jpeg_roundtrip_random_pixels(w, h, ch, sub, data):
    """Any geometry/sampling decodes to the declared shape; 4:4:4 luma-only
    content reconstructs within the quant=1 error bound."""
    from olap_sus_spark.operators import jpeg

    pix = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch))
    )
    got = jpeg.jpeg_decode(jpeg.jpeg_encode(pix, w, h, ch, subsample=sub))
    assert got is not None
    assert (got[0], got[1], got[2]) == (w, h, ch)
    if ch == 1:  # no chroma loss: tight bound regardless of sub
        assert max(abs(a - b) for a, b in zip(pix, got[3])) <= 3


def test_resize_real_jpeg_known_pixels(spark):
    """resize_images on a REAL JPEG goes through jpeg_decode -> nearest
    resize -> png_encode (output container normalized to PNG)."""
    from olap_sus_spark.operators import jpeg
    from olap_sus_spark.operators import multimodal as mm

    # 2x2 block colors scaled to 16x16 so nearest-resize back to 2x2 is exact
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    pix = bytearray()
    for y in range(16):
        for x in range(16):
            pix += bytes(colors[(y // 8) * 2 + (x // 8)])
    payload = jpeg.jpeg_encode(bytes(pix), 16, 16, 3)
    assets = spark.createDataFrame([(1, bytearray(payload), "image/jpeg")], mm.ASSET_SCHEMA)
    r = {x.asset_id: x for x in mm.resize_images(assets, 2, 2).collect()}[1]
    assert (r.width, r.height) == (2, 2)
    w, h, ch, out = mm.png_decode(bytes(r.payload))
    assert (w, h, ch) == (2, 2, 3)
    for i, c in enumerate(colors):
        got = tuple(out[3 * i : 3 * i + 3])
        assert all(abs(a - b) <= 2 for a, b in zip(got, c)), (i, got, c)


# --------------------------------------------------------------------------
# MJPG-AVI demux (operators/avi.py) + real feature extraction.


def test_avi_mux_demux_roundtrip_and_frame_decode():
    from olap_sus_spark.operators import avi, jpeg

    frames = [
        jpeg.jpeg_encode(bytes([(k * 40 + i) % 256 for i in range(16 * 16 * 3)]), 16, 16, 3)
        for k in range(7)
    ]
    payload = avi.avi_mux(frames, 16, 16, fps=10)
    out = avi.avi_demux(payload)
    assert out == frames  # byte-exact chunk extraction, stream order
    for f in out:  # every demuxed frame is a decodable baseline JPEG
        d = jpeg.jpeg_decode(f)
        assert d is not None and (d[0], d[1], d[2]) == (16, 16, 3)


def test_avi_demux_rejects_hostile():
    from olap_sus_spark.operators import avi, jpeg

    ok = avi.avi_mux([jpeg.jpeg_encode(bytes(192), 8, 8, 3)], 8, 8)
    assert avi.avi_demux(ok) is not None
    assert avi.avi_demux(None) is None
    assert avi.avi_demux(b"notavi") is None
    assert avi.avi_demux(ok[:40]) is None  # truncated before movi
    # chunk declaring more bytes than exist: walk stops, no crash/overread
    bad = bytearray(ok)
    movi = bad.find(b"00dc")
    bad[movi + 4 : movi + 8] = (1 << 25).to_bytes(4, "little")
    assert avi.avi_demux(bytes(bad)) in (None, [])


def test_sample_frames_real_avi(spark):
    """sample_frames demuxes a REAL MJPG AVI: every_nth sampling over
    actual video chunks, frame_index = stream position, bytes decodable."""
    from olap_sus_spark.operators import avi, jpeg
    from olap_sus_spark.operators import multimodal as mm

    frames = [
        jpeg.jpeg_encode(bytes([k * 9 % 256] * (8 * 8 * 3)), 8, 8, 3) for k in range(10)
    ]
    payload = avi.avi_mux(frames, 8, 8)
    assets = spark.createDataFrame([(5, bytearray(payload), "video/avi")], mm.ASSET_SCHEMA)
    rows = sorted(
        mm.sample_frames(assets, every_nth=4).collect(), key=lambda r: r.frame_index
    )
    assert [r.frame_index for r in rows] == [0, 4, 8]
    for r in rows:
        assert bytes(r.frame) == frames[r.frame_index]
        assert jpeg.jpeg_decode(bytes(r.frame)) is not None


def test_mkv_mux_demux_roundtrip_and_frame_decode():
    """Round 6: the EBML walk is a real demux — byte-exact unlaced block
    extraction in stream order, every frame a decodable baseline JPEG."""
    from olap_sus_spark.operators import jpeg, mkv

    frames = [
        jpeg.jpeg_encode(bytes([(k * 40 + i) % 256 for i in range(16 * 16 * 3)]), 16, 16, 3)
        for k in range(7)
    ]
    payload = mkv.mkv_mux(frames, 16, 16, fps=10)
    out = mkv.mkv_demux(payload)
    assert out == frames
    for f in out:
        d = jpeg.jpeg_decode(f)
        assert d is not None and (d[0], d[1], d[2]) == (16, 16, 3)


def test_mkv_metadata_fields():
    from olap_sus_spark.operators import jpeg, mkv

    frames = [jpeg.jpeg_encode(bytes(192), 8, 8, 3)] * 4
    m = mkv.mkv_metadata(mkv.mkv_mux(frames, 8, 8, fps=10))
    assert m is not None
    assert m["brand"] == "matroska"
    assert m["n_tracks"] == 1 and m["codecs"] == ["V_MJPEG"]
    assert (m["width"], m["height"]) == (8, 8)
    assert m["duration_ms"] == 4 * 100  # 4 frames at 10 fps


def test_mkv_demux_rejects_hostile():
    from olap_sus_spark.operators import jpeg, mkv

    frame = jpeg.jpeg_encode(bytes(192), 8, 8, 3)
    ok = mkv.mkv_mux([frame], 8, 8)
    assert mkv.mkv_demux(ok) is not None
    assert mkv.mkv_demux(None) is None
    assert mkv.mkv_demux(b"notmkv") is None
    assert mkv.mkv_demux(ok[:30]) is None  # truncated inside the header
    assert mkv.mkv_demux(ok[:-10]) is None  # block overruns truncated parent
    # laced block flag: unsupported -> whole stream refused (caller falls back)
    laced = bytearray(ok)
    laced[laced.find(frame) - 1] |= 0x06  # flags byte directly precedes frame
    assert mkv.mkv_demux(bytes(laced)) is None


def test_sample_frames_and_metadata_real_mkv(spark):
    """sample_frames and video_metadata both take the real EBML path."""
    from olap_sus_spark.operators import jpeg, mkv
    from olap_sus_spark.operators import multimodal as mm

    frames = [
        jpeg.jpeg_encode(bytes([k * 9 % 256] * (8 * 8 * 3)), 8, 8, 3) for k in range(10)
    ]
    payload = mkv.mkv_mux(frames, 8, 8)
    assets = spark.createDataFrame(
        [(5, bytearray(payload), "video/x-matroska")], mm.ASSET_SCHEMA
    )
    rows = sorted(
        mm.sample_frames(assets, every_nth=4).collect(), key=lambda r: r.frame_index
    )
    assert [r.frame_index for r in rows] == [0, 4, 8]
    for r in rows:
        assert bytes(r.frame) == frames[r.frame_index]
        assert jpeg.jpeg_decode(bytes(r.frame)) is not None
    meta = mm.video_metadata(assets).collect()[0]
    assert meta.container == "mkv" and meta.codecs == "V_MJPEG"
    assert (meta.width, meta.height) == (8, 8)


def test_extract_features_real_pixels(spark):
    """Decodable payloads run pixels → grid stem → the in-repo seeded MLP;
    undecodable payloads run the byte-histogram stem through the SAME
    model (operator total, no digest fakes on any branch)."""
    import numpy as np

    from olap_sus_spark.operators import encoder, jpeg
    from olap_sus_spark.operators import multimodal as mm

    flat = bytes([255, 0, 128]) * (16 * 16)
    payload = jpeg.jpeg_encode(flat, 16, 16, 3)
    junk = b"\x00\x01undecodable"
    assets = spark.createDataFrame(
        [(1, bytearray(payload), "image/jpeg"), (2, junk, "application/octet-stream")],
        mm.ASSET_SCHEMA,
    )
    out = {r.asset_id: list(r.embedding) for r in mm.extract_features(assets, dim=12).collect()}
    # decodable branch == encoder over the decoded-pixel grid stem
    w, h, ch, pix = jpeg.jpeg_decode(payload)
    stem = mm.grid_features(pix, w, h, ch, encoder.STEM_DIM)
    expect = encoder.embed_batch(np.asarray(stem), 12)[0]
    assert out[1] == [float(v) for v in expect]
    # undecodable branch == encoder over the byte-histogram stem
    expect2 = encoder.embed_batch(encoder.byte_histogram_stem(junk), 12)[0]
    assert out[2] == [float(v) for v in expect2]
    for vec in out.values():
        assert abs(sum(v * v for v in vec) - 1.0) < 1e-5  # L2-unit rows


def test_encoder_known_vector():
    """The seeded MLP is pinned to literal outputs: any change to the
    weights' derivation (seed, shapes, init scaling, activation) breaks
    this test — the 'weights file' is effectively these 8 floats."""
    import numpy as np

    from olap_sus_spark.operators import encoder

    stem = np.linspace(0.0, 1.0, encoder.STEM_DIM)
    got = [round(float(v), 6) for v in encoder.embed_batch(stem, 8)[0]]
    assert got == [
        0.741951, 0.147632, -0.516922, 0.190396,
        0.266416, -0.00734, -0.039179, -0.227349,
    ]
    # unit-norm invariant and batch shape
    batch = encoder.embed_batch(np.vstack([stem, stem * 0.5]), 16)
    assert batch.shape == (2, 16) and batch.dtype == np.float32
    assert np.allclose(np.linalg.norm(batch, axis=1), 1.0, atol=1e-5)


def test_encoder_weight_cache_is_bounded_lru():
    """The per-dim weight cache evicts LRU past _CACHE_MAX, and an evicted
    dim regenerates bit-identical weights (pure function of (SEED, dim))."""
    import numpy as np

    from olap_sus_spark.operators import encoder

    encoder._CACHE.clear()
    first = encoder.weights(3)[0].copy()
    for d in range(4, 4 + encoder._CACHE_MAX + 2):  # overflow the cache
        encoder.weights(d)
    assert len(encoder._CACHE) == encoder._CACHE_MAX
    assert 3 not in encoder._CACHE  # oldest evicted
    assert np.array_equal(encoder.weights(3)[0], first)  # regenerated identical
    # touching an old entry protects it from the next eviction (LRU, not FIFO)
    oldest = next(iter(encoder._CACHE))
    encoder.weights(oldest)
    encoder.weights(999)
    assert oldest in encoder._CACHE


def test_mp4_metadata_parse_and_reject():
    from olap_sus_spark.operators import mp4

    p = mp4.mp4_write(125_500, [("avc1", 1920, 1080), ("mp4a", 0, 0)], brand="mp42")
    assert mp4.parse_mp4_metadata(p) == {
        "brand": "mp42", "duration_ms": 125500, "n_tracks": 2,
        "codecs": ["avc1", "mp4a"], "width": 1920, "height": 1080,
    }
    assert mp4.parse_mp4_metadata(None) is None
    assert mp4.parse_mp4_metadata(b"notmp4") is None
    # declared box size beyond the payload: fail closed before slicing
    bomb = bytearray(p)
    bomb[0:4] = (1 << 31).to_bytes(4, "big")
    assert mp4.parse_mp4_metadata(bytes(bomb)) is None
    # truncation mid-moov keeps the brand, loses the rest, never raises
    t = mp4.parse_mp4_metadata(p[: len(p) // 2])
    assert t is None or t["brand"] == "mp42"


def test_video_metadata_operator(spark):
    """video_metadata triages MP4 + AVI + junk in one batch without
    touching any sample data."""
    from olap_sus_spark.operators import avi, jpeg, mp4
    from olap_sus_spark.operators import multimodal as mm

    mp4_payload = mp4.mp4_write(60_000, [("avc1", 640, 360)])
    avi_payload = avi.avi_mux([jpeg.jpeg_encode(bytes(192), 8, 8, 3)] * 5, 8, 8, fps=25)
    assets = spark.createDataFrame(
        [
            (1, bytearray(mp4_payload), "video/mp4"),
            (2, bytearray(avi_payload), "video/avi"),
            (3, b"not a video", "application/octet-stream"),
        ],
        mm.ASSET_SCHEMA,
    )
    out = {r.asset_id: r for r in mm.video_metadata(assets).collect()}
    assert out[1].container == "mp4" and out[1].brand == "isom"
    assert out[1].duration_ms == 60000 and out[1].codecs == "avc1"
    assert (out[1].width, out[1].height) == (640, 360)
    assert out[2].container == "avi" and out[2].codecs == "MJPG"
    assert out[2].duration_ms == 200 and (out[2].width, out[2].height) == (8, 8)
    assert out[3].container is None and out[3].duration_ms is None


def test_mp4_sample_table_roundtrip():
    """parse_sample_table/extract_samples recover exactly the written
    sample bytes, timestamps, and sizes; hostile tables never overread."""
    from olap_sus_spark.operators import mp4

    frames = [bytes([k]) * (10 + 3 * k) for k in range(9)]
    b = mp4.mp4_write_samples(frames, delta=40, timescale=1000)

    t = mp4.parse_sample_table(b)
    assert t is not None and t["timescale"] == 1000
    assert [s[3] for s in t["samples"]] == [len(f) for f in frames]
    got = mp4.extract_samples(b, 1)
    assert [g[2] for g in got] == frames
    assert [g[1] for g in got] == [40 * k for k in range(9)]
    assert [g[0] for g in mp4.extract_samples(b, 4)] == [0, 4, 8]
    # the metadata pass still reads the same file
    m = mp4.parse_mp4_metadata(b)
    assert m["codecs"] == ["mjpg"] and m["duration_ms"] == 9 * 40

    # hostile: truncated mdat -> a sample would point past the end
    assert mp4.parse_sample_table(b[:-3]) is None
    # hostile: forged stsz count -> table/box bound check refuses
    bad = bytearray(b)
    i = bad.find(b"stsz")
    bad[i + 8 : i + 12] = (1 << 30).to_bytes(4, "big")
    assert mp4.parse_sample_table(bytes(bad)) is None
    # hostile: chunk offset beyond payload
    bad = bytearray(b)
    i = bad.find(b"stco")
    bad[i + 12 : i + 16] = (1 << 31).to_bytes(4, "big")
    assert mp4.parse_sample_table(bytes(bad)) is None
    # no sample table at all (metadata-only writer) -> None, not a crash
    meta_only = mp4.mp4_write(1000, [("avc1", 64, 48)])
    assert mp4.parse_sample_table(meta_only) is None


def test_sample_frames_real_mp4(spark):
    """sample_frames demuxes a REAL MP4: sample bytes sliced from mdat via
    the stts/stsz/stco tables, frame_index = sample index, decodable."""
    from olap_sus_spark.operators import jpeg, mp4
    from olap_sus_spark.operators import multimodal as mm

    frames = [
        jpeg.jpeg_encode(bytes([k * 17 % 256] * (8 * 8 * 3)), 8, 8, 3) for k in range(10)
    ]
    payload = mp4.mp4_write_samples(frames, codec="mjpg", width=8, height=8)
    assets = spark.createDataFrame([(9, bytearray(payload), "video/mp4")], mm.ASSET_SCHEMA)
    rows = sorted(
        mm.sample_frames(assets, every_nth=4).collect(), key=lambda r: r.frame_index
    )
    assert [r.frame_index for r in rows] == [0, 4, 8]
    for r in rows:
        assert bytes(r.frame) == frames[r.frame_index]
        assert jpeg.jpeg_decode(bytes(r.frame)) is not None
