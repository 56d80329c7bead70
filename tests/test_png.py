"""Always-run coverage for the stdlib PNG codec (multimodal/png.py) —
the ADVICE-r7 gap: the hand-written Sub/Up/Average/Paeth unfilter
recurrences are the likeliest off-by-one sites and previously had no
in-repo coverage (Pillow's small-image PNGs use filter 0, and Pillow
is absent in this container anyway).

Three independent pins, so an encoder/decoder bug pair can't cancel:

* golden-bytes decode — PNGs constructed BY HAND in the test (struct +
  zlib directly, per-row filter bytes chosen explicitly, expected
  reconstruction computed from the spec math in the test itself),
  which pins ``decode_png`` without touching ``encode_png``;
* encode→decode round trips over seeded random grids at both strides
  (gray bpp=1, RGB bpp=3) and heights >= 5 (the row-mod-5 filter
  cycle covers all five filter types);
* the corrupt/out-of-scope/bomb contract: ValueError on any malformed
  byte, None on valid-but-out-of-scope, and the ADVICE-r7
  decompression-bomb guard (huge declared dims and overlong deflate
  streams must fail fast without inflating).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from proglog_spark.multimodal.png import (
    MAX_PIXELS,
    _paeth,
    decode_png,
    encode_png,
)

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def ihdr(w: int, h: int, depth: int = 8, ctype: int = 0, interlace: int = 0) -> bytes:
    return chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace))


def png(w, h, raw, depth=8, ctype=0, interlace=0):
    """Assemble a syntactically valid PNG around an already-filtered
    raw scanline stream — the test's own framing, not encode_png's."""
    return SIG + ihdr(w, h, depth, ctype, interlace) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# golden decode: hand-filtered scanlines, expected recon from spec math
# ---------------------------------------------------------------------------


def test_decode_golden_gray_all_filters():
    """5x3 grayscale, one scanline per filter type, reconstruction
    hand-computed from the spec recurrences (not via encode_png)."""
    # row 0, filter 0 (None): raw == recon
    r0 = bytes([0, 10, 20, 30])
    # row 1, filter 1 (Sub): recon[x] = raw[x] + recon[x-1] (bpp=1)
    #   raw 5, 6, 7 -> 5, 11, 18
    r1 = bytes([1, 5, 6, 7])
    # row 2, filter 2 (Up): recon[x] = raw[x] + prev[x]
    #   raw 1, 2, 3 over prev 5, 11, 18 -> 6, 13, 21
    r2 = bytes([2, 1, 2, 3])
    # row 3, filter 3 (Average): recon[x] = raw[x] + (left + up) // 2
    #   x0: 4 + (0 + 6)//2 = 7; x1: 4 + (7 + 13)//2 = 14;
    #   x2: 4 + (14 + 21)//2 = 21
    r3 = bytes([3, 4, 4, 4])
    # row 4, filter 4 (Paeth): recon[x] = raw[x] + paeth(left, up, ul)
    #   x0: paeth(0, 7, 0) = 7 -> 2 + 7 = 9
    #   x1: paeth(9, 14, 7) -> p = 16, pa=7, pb=2, pc=9 -> up=14 -> 17
    #   x2: paeth(17, 21, 14) -> p = 24, pa=7, pb=3, pc=10 -> up=21 -> 24
    r4 = bytes([4, 2, 3, 3])
    out = decode_png(png(3, 5, r0 + r1 + r2 + r3 + r4))
    assert out is not None
    h, w, ch, px = out
    assert (h, w, ch) == (5, 3, 1)
    assert px.tolist() == [
        10, 20, 30,
        5, 11, 18,
        6, 13, 21,
        7, 14, 21,
        9, 17, 24,
    ]


def test_decode_golden_rgb_sub_stride():
    """2x2 RGB with a Sub row: the left neighbor is bpp=3 bytes back,
    so a stride bug (using 1) would corrupt every decoded pixel. Luma
    output is integer ITU-R 601 of the reconstructed triples."""
    # row 0 filter 0: pixels (10,20,30), (40,50,60)
    r0 = bytes([0, 10, 20, 30, 40, 50, 60])
    # row 1 filter 1 (Sub, bpp=3): raw (1,2,3),(4,5,6)
    #   px0 = (1,2,3); px1 = (1+4, 2+5, 3+6) = (5,7,9)
    r1 = bytes([1, 1, 2, 3, 4, 5, 6])
    out = decode_png(png(2, 2, r0 + r1, ctype=2))
    assert out is not None
    h, w, ch, px = out

    def luma(r, g, b):
        return (299 * r + 587 * g + 114 * b) // 1000

    assert (h, w, ch) == (2, 2, 3)
    assert px.tolist() == [
        luma(10, 20, 30), luma(40, 50, 60), luma(1, 2, 3), luma(5, 7, 9),
    ]


def test_paeth_predictor_spec_cases():
    # ties break left, then up, then up-left (PNG spec 9.4)
    assert _paeth(0, 0, 0) == 0
    assert _paeth(10, 20, 15) == 10 + 20 - 15 and _paeth(10, 20, 15) == 15  # p=15: pa=5, pb=5, pc=0 -> c
    assert _paeth(5, 5, 5) == 5
    assert _paeth(100, 50, 25) == 100  # p=125: pa=25, pb=75, pc=100 -> left
    assert _paeth(50, 100, 25) == 100  # p=125: pa=75, pb=25, pc=100 -> up


# ---------------------------------------------------------------------------
# encode -> decode round trips (both strides, all filters, extremes)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h,w", [(8, 9), (5, 1), (7, 13), (1, 4), (12, 3)])
def test_roundtrip_gray(h, w):
    rng = np.random.default_rng(h * 100 + w)
    grid = rng.integers(0, 256, size=h * w, dtype=np.int64)
    out = decode_png(encode_png(grid, h, w, channels=1))
    assert out is not None
    oh, ow, ch, px = out
    assert (oh, ow, ch) == (h, w, 1)
    assert px.tolist() == grid.tolist()


@pytest.mark.parametrize("h,w", [(8, 9), (6, 2), (11, 5)])
def test_roundtrip_rgb_luma(h, w):
    """RGB trip with per-channel random values: decoded luma must be
    the exact integer ITU-R 601 of the original triples."""
    rng = np.random.default_rng(h * 7 + w)
    rgb = rng.integers(0, 256, size=h * w * 3, dtype=np.int64)
    out = decode_png(encode_png(rgb, h, w, channels=3))
    assert out is not None
    oh, ow, ch, px = out
    t = rgb.reshape(-1, 3)
    expect = (299 * t[:, 0] + 587 * t[:, 1] + 114 * t[:, 2]) // 1000
    assert (oh, ow, ch) == (h, w, 3)
    assert px.tolist() == expect.tolist()


@settings(max_examples=120, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=14),
    w=st.integers(min_value=1, max_value=11),
    channels=st.sampled_from([1, 3]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_roundtrip_random_rasters_property(h, w, channels, seed):
    """VERDICT-r8 #6: encode→decode over RANDOM geometry × stride —
    heights >= 5 cycle through all five filter types at encode, so the
    Sub/Up/Average/Paeth unfilter recurrences are pinned across
    arbitrary widths (including w=1, where the left/upper-left taps
    vanish) and both bpp strides, not just the fixed fixtures. Gray
    trips must be pixel-exact; RGB trips must land on the exact
    integer ITU-R 601 luma of the original triples."""
    rng = np.random.default_rng(seed)
    flat = rng.integers(0, 256, size=h * w * channels, dtype=np.int64)
    out = decode_png(encode_png(flat, h, w, channels=channels))
    assert out is not None
    oh, ow, ch, px = out
    assert (oh, ow, ch) == (h, w, channels)
    if channels == 1:
        assert px.tolist() == flat.tolist()
    else:
        t = flat.reshape(-1, 3)
        expect = (299 * t[:, 0] + 587 * t[:, 1] + 114 * t[:, 2]) // 1000
        assert px.tolist() == expect.tolist()


def test_roundtrip_extremes():
    for v in (0, 255):
        grid = np.full(8 * 9, v, dtype=np.int64)
        out = decode_png(encode_png(grid, 8, 9, channels=1))
        assert out is not None and out[3].tolist() == grid.tolist()


def test_encode_rejects_out_of_range():
    with pytest.raises(ValueError):
        encode_png(np.array([0, 256, 3, 4]), 2, 2)
    with pytest.raises(ValueError):
        encode_png(np.array([0, -1, 3, 4]), 2, 2)


# ---------------------------------------------------------------------------
# corrupt / out-of-scope / bomb contract
# ---------------------------------------------------------------------------


def good_png() -> bytes:
    return encode_png(np.arange(72) % 256, 8, 9, channels=1)


def test_corrupt_crc_raises():
    data = bytearray(good_png())
    # flip one byte inside the IDAT body (after SIG + IHDR chunk + 8)
    idat_off = data.index(b"IDAT") + 4
    data[idat_off + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_truncation_raises():
    data = good_png()
    for cut in (len(data) // 3, len(data) - 3):
        with pytest.raises(ValueError):
            decode_png(data[:cut])


def test_bad_signature_and_missing_chunks():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng" + good_png())
    # IEND dropped entirely
    data = good_png()
    with pytest.raises(ValueError, match="IEND"):
        decode_png(data[: data.index(b"IEND") - 4])
    # zero dimension
    with pytest.raises(ValueError, match="zero dimension"):
        decode_png(png(0, 1, b""))


def test_short_raster_raises():
    # declared 3x5 but only 4 scanlines of data
    raw = b"".join(bytes([0, 1, 2, 3]) for _ in range(4))
    with pytest.raises(ValueError, match="raster length"):
        decode_png(png(3, 5, raw))


def test_out_of_scope_returns_none():
    raw = bytes([0, 1, 2, 3])
    assert decode_png(png(3, 1, raw, ctype=3)) is None  # palette
    assert decode_png(png(3, 1, raw, depth=16)) is None  # 16-bit
    assert decode_png(png(3, 1, raw, interlace=1)) is None  # Adam7


def test_bomb_guard_huge_dims():
    """ADVICE-r7: a tiny file declaring 20000x20000 must fail fast on
    the pixel cap — BEFORE inflating 400 MB / allocating a ~3 GB
    raster (the MemoryError would escape the corrupt:png contract and
    crash-loop Spark task retries)."""
    assert 20000 * 20000 > MAX_PIXELS
    bomb = (
        SIG
        + ihdr(20000, 20000)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 1000))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bomb"):
        decode_png(bomb)


def test_bomb_guard_overlong_stream():
    """In-cap dims but a deflate stream producing MORE than the
    declared raster: the bounded inflate must stop at expected+1
    bytes and raise, not materialize the stream."""
    raw = b"\x00" * (5 * (1 + 3) + 100_000)  # 100 KB past the raster
    with pytest.raises(ValueError, match="raster length"):
        decode_png(png(3, 5, raw))


def test_trailing_garbage_after_stream_raises():
    raw = b"".join(bytes([0, 1, 2, 3]) for _ in range(5))
    body = zlib.compress(raw) + b"garbage"
    data = SIG + ihdr(3, 5) + chunk(b"IDAT", body) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(data)


def test_multi_idat_chunks_concatenate():
    """The deflate stream may be split across any number of IDAT
    chunks (PNG spec 5.6) — framing must concatenate before inflate."""
    grid = np.arange(72) % 256
    data = encode_png(grid, 8, 9, channels=1)
    idat_start = data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", data[idat_start : idat_start + 4])
    body = data[idat_start + 8 : idat_start + 8 + length]
    tail = data[idat_start + 12 + length :]
    split = SIG + ihdr(9, 8) + chunk(b"IDAT", body[:5]) + chunk(b"IDAT", body[5:]) + tail
    out = decode_png(split)
    assert out is not None and out[3].tolist() == grid.tolist()


# ---------------------------------------------------------------------------
# the Spark stage (png_roundtrip) — NULL propagation the gate can't reach
# ---------------------------------------------------------------------------


def test_png_roundtrip_sketch_matches_composed(spark):
    """The r11 fused round-trip gate stage must be BIT-IDENTICAL to
    the composed decode_media → png_roundtrip → sums + dhash64 chain
    it replaced in docs_image_png_roundtrip — over every payload
    class (the test_decode_dhash64_matches_composed matrix): exact-72
    ramp, flat, single-bump, short/long uneven-slice payloads, empty
    (zero grid), NULL (row drops on both paths), 1-byte."""
    from pyspark.sql import functions as F

    from proglog_spark.multimodal import (
        decode_media,
        dhash64,
        png_roundtrip,
        png_roundtrip_sketch,
    )

    payloads = [
        (1, bytes(range(72))),
        (2, bytes([7]) * 72),
        (3, bytes([10] * 1 + [200] + [10] * 70)),
        (4, b"abcdefghi" * 3),
        (5, bytes(range(256)) * 3),
        (6, b""),
        (7, None),
        (8, b"x"),
    ]
    df = spark.createDataFrame(payloads, "doc_id LONG, payload BINARY")
    rt = png_roundtrip(decode_media(df, height=8, width=9))
    add = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda a, x: a + x
    )
    packed = rt.select(
        F.struct(
            F.col("doc_id"),
            add("pixels").alias("px_sum"),
            add("rgb_luma").alias("rgb_luma_sum"),
        ).alias("doc_key"),
        "height", "width", "channels", "pixels",
    )
    composed = {
        r.id.doc_id: (r.id.px_sum, r.id.rgb_luma_sum, r.simhash_lo, r.simhash_hi)
        for r in dhash64(packed, id_col="doc_key").collect()
    }
    fused = {
        r.doc_id: (r.px_sum, r.rgb_luma_sum, r.simhash_lo, r.simhash_hi)
        for r in png_roundtrip_sketch(df).collect()
    }
    assert fused == composed
    assert set(fused) == {1, 2, 3, 4, 5, 6, 8}  # NULL row dropped


def test_png_roundtrip_stage_null_propagation(spark):
    from proglog_spark.multimodal import decode_media, png_roundtrip

    df = spark.createDataFrame(
        [(1, None), (2, bytes(range(72)))], "doc_id LONG, payload BINARY"
    )
    rows = {
        r.doc_id: r
        for r in png_roundtrip(decode_media(df, height=8, width=9)).collect()
    }
    assert rows[1].pixels is None and rows[1].rgb_luma is None
    assert rows[2].pixels is not None
    assert list(rows[2].pixels) == list(rows[2].rgb_luma)
