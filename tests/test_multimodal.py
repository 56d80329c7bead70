"""Multimodal plumbing tests — schemas, batch shapes, and exact
values of the deterministic stages (frame chunking, resize index
math, histogram features), mirroring the reference's exact-round-trip
posture for opaque payloads (internal/log/log_test.go:36-45: what
goes in comes back bit-exact)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from proglog_spark.multimodal import (
    decode_image_stub,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)
from proglog_spark.operators import similarity


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [
        (1, b"a" * 200),            # 4 frames of 64 (last short)
        (2, b"xyz"),                # 1 short frame
        (3, b""),                   # empty -> no frames
        (4, bytes(range(256)) * 2),  # full byte range
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_sample_frames_matches_python_chunking(payloads):
    out = {
        (r.doc_id, r.frame_idx): (r.frame_bytes, r.frame_md5)
        for r in sample_frames(payloads, frame_bytes=64, every_n=2).collect()
    }
    data = {1: b"a" * 200, 2: b"xyz", 3: b"", 4: bytes(range(256)) * 2}
    want = {}
    for doc_id, payload in data.items():
        n = (len(payload) + 63) // 64
        for k in range(0, n, 2):
            chunk = payload[k * 64 : (k + 1) * 64]
            want[(doc_id, k)] = (len(chunk), hashlib.md5(chunk).hexdigest())
    assert out == want
    assert not any(doc_id == 3 for doc_id, _ in out)  # empty payload -> no frames


def test_decode_media_deterministic_shape(payloads):
    rows = decode_media(payloads, height=4, width=4).collect()
    assert {r.doc_id for r in rows} == {1, 2, 3, 4}
    for r in rows:
        assert (r.height, r.width, r.channels) == (4, 4, 1)
        assert len(r.pixels) == 16
        assert all(0 <= p <= 255 for p in r.pixels)
    by_id = {r.doc_id: r.pixels for r in rows}
    assert by_id[1] == [ord("a")] * 16  # constant payload -> constant intensity
    assert by_id[3] == [0] * 16  # empty payload -> black


def test_resize_media_nearest_neighbor_exact(spark):
    # known 2x2 grid upscaled to 4x4: each source pixel becomes a 2x2 block
    df = spark.createDataFrame(
        [(1, 2, 2, 1, [10, 20, 30, 40])],
        "doc_id long, height int, width int, channels int, pixels array<int>",
    )
    out = resize_media(df, out_h=4, out_w=4).collect()[0]
    grid = np.array(out.pixels).reshape(4, 4)
    assert (grid == np.array([[10, 10, 20, 20]] * 2 + [[30, 30, 40, 40]] * 2)).all()
    # identity resize is a no-op
    same = resize_media(df, out_h=2, out_w=2).collect()[0]
    assert same.pixels == [10, 20, 30, 40]


def test_extract_features_histogram(payloads):
    feats = {r.doc_id: np.array(r.feature) for r in extract_features(payloads, dim=16).collect()}
    assert all(len(v) == 16 for v in feats.values())
    # uniform byte coverage -> uniform histogram
    assert np.allclose(feats[4], np.full(16, 1 / 4.0))
    # constant payload 'a' (97 // 16 = 6) -> one-hot bucket 6
    assert feats[1][6] == 1.0 and feats[1].sum() == 1.0
    # empty payload -> zero vector (not NaN)
    assert (feats[3] == 0).all()


def test_features_compose_with_similarity(payloads):
    feats = extract_features(payloads, dim=16).select(
        F.col("doc_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    corpus = feats.where(F.col("vec_id") != 3)  # zero vector has no direction
    out = similarity.brute_force_topk(corpus, corpus.where(F.col("vec_id") == 1), k=3)
    assert [r.vec_id for r in sorted(out.collect(), key=lambda r: r.rank)][0] in (2, 4)


def test_decode_stub_is_honest():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG")


def test_media_stages_propagate_null_payload(spark):
    """Every media stage must null-propagate (meta/decode/features) or
    skip (frames) a NULL payload instead of crashing the Arrow worker
    on len(None)/bytes(None)."""
    from proglog_spark.multimodal import (
        decode_media,
        extract_features,
        extract_media_meta,
        extract_pixel_features,
        extract_pixel_histogram,
        resize_media,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"hello world, a real payload")), (2, None)],
        "doc_id LONG, payload BINARY",
    )
    meta = {r.doc_id: r for r in extract_media_meta(df).collect()}
    assert meta[2].n_bytes is None and meta[2].header_hex is None
    assert meta[1].n_bytes == 27
    assert sample_frames(df).where("doc_id = 2").count() == 0
    dec = decode_media(df, 8, 8)
    rows = {r.doc_id: r for r in dec.collect()}
    assert rows[2].pixels is None and rows[2].height is None
    res = resize_media(dec, 4, 4)
    hist = {r.doc_id: r.hist for r in extract_pixel_histogram(res.select("doc_id", "pixels")).collect()}
    assert hist[2] is None and sum(hist[1]) == 16
    feats = {r.doc_id: r.feature for r in extract_pixel_features(res.select("doc_id", "pixels")).collect()}
    assert feats[2] is None
    assert abs(sum(x * x for x in feats[1]) - 1.0) < 1e-9
    bf = {r.doc_id: r.feature for r in extract_features(df).collect()}
    assert bf[2] is None and bf[1] is not None

# ---------------------------------------------------------------------------
# REAL decoders (library-free formats): uncompressed BMP, binary
# PGM/PPM, WAV PCM — exact pixel/sample values against hand-built
# fixtures, plus the never-crash contract for everything else.
# ---------------------------------------------------------------------------


def _bmp24(pixels_rgb, bottom_up=True):
    """Minimal 24-bit BI_RGB BMP from an (h, w, 3) uint8 array."""
    import struct

    h, w, _ = pixels_rgb.shape
    row_size = ((24 * w + 31) // 32) * 4
    raster = bytearray()
    rows = pixels_rgb[::-1] if bottom_up else pixels_rgb
    for row in rows:
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))
        line += b"\x00" * (row_size - len(line))
        raster += line
    pix_off = 14 + 40
    total = pix_off + len(raster)
    header = struct.pack("<2sIHHI", b"BM", total, 0, 0, pix_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, 24, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    return bytes(header + dib + raster)


def _bmp8(pixels_idx, palette_rgb, bottom_up=True):
    """Minimal 8-bit palettized BMP from an (h, w) index array."""
    import struct

    h, w = pixels_idx.shape
    row_size = ((8 * w + 31) // 32) * 4
    raster = bytearray()
    rows = pixels_idx[::-1] if bottom_up else pixels_idx
    for row in rows:
        raster += bytes(int(v) for v in row) + b"\x00" * (row_size - w)
    pal = bytearray()
    for i in range(256):
        r, g, b = palette_rgb[i] if i < len(palette_rgb) else (0, 0, 0)
        pal += bytes((b, g, r, 0))
    pix_off = 14 + 40 + len(pal)
    total = pix_off + len(raster)
    header = struct.pack("<2sIHHI", b"BM", total, 0, 0, pix_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, 8, 0,
        len(raster), 2835, 2835, 256, 0,
    )
    return bytes(header + dib + pal + raster)


def _wav(samples, rate=8000, channels=1, width=2):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        if width == 1:
            wf.writeframes(bytes((s + 128) & 0xFF for s in samples))
        else:
            wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def _luma(r, g, b):
    return (299 * r + 587 * g + 114 * b) // 1000


def test_decode_images_bmp24_exact(spark):
    from proglog_spark.multimodal import decode_images

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(3, 5, 3)).astype(np.uint8)  # w=5: row padding
    df = spark.createDataFrame([(1, _bmp24(img))], "doc_id LONG, payload BINARY")
    row = decode_images(df).collect()[0]
    assert (row.format, row.height, row.width, row.channels) == ("bmp", 3, 5, 3)
    want = _luma(
        img[..., 0].astype(int), img[..., 1].astype(int), img[..., 2].astype(int)
    ).reshape(-1)
    assert list(row.pixels) == [int(v) for v in want]


def test_decode_images_bmp8_palette_and_topdown(spark):
    from proglog_spark.multimodal import decode_images

    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    palette = [(255, 0, 0), (0, 255, 0), (10, 20, 30)]
    want = [_luma(*palette[i]) for i in idx.reshape(-1)]
    df = spark.createDataFrame(
        [
            (1, _bmp8(idx, palette, bottom_up=True)),
            (2, _bmp8(idx, palette, bottom_up=False)),  # top-down (negative h)
        ],
        "doc_id LONG, payload BINARY",
    )
    rows = {r.doc_id: r for r in decode_images(df).collect()}
    for r in rows.values():
        assert (r.format, r.height, r.width, r.channels) == ("bmp", 2, 2, 1)
        assert list(r.pixels) == want  # identical grid either row order


def test_decode_images_pnm_with_comments(spark):
    from proglog_spark.multimodal import decode_images

    pgm = b"P5 # a comment\n2 2\n255\n" + bytes([0, 100, 200, 255])
    ppm = b"P6\n2 1 255\n" + bytes([255, 0, 0, 0, 0, 255])
    df = spark.createDataFrame(
        [(1, pgm), (2, ppm)], "doc_id LONG, payload BINARY"
    )
    rows = {r.doc_id: r for r in decode_images(df).collect()}
    assert list(rows[1].pixels) == [0, 100, 200, 255]
    assert rows[1].channels == 1
    assert list(rows[2].pixels) == [_luma(255, 0, 0), _luma(0, 0, 255)]
    assert (rows[2].height, rows[2].width, rows[2].channels) == (1, 2, 3)


def test_decode_images_never_crashes(spark):
    from proglog_spark.multimodal import decode_images

    df = spark.createDataFrame(
        [
            (1, b"\xff\xd8\xff\xe0 jpeg-ish"),     # compressed: tagged, NULL
            (2, b"BM" + b"\x00" * 20),             # truncated bmp: corrupt
            (3, b"P5 2 2 255 "),                   # truncated pnm raster
            (4, None),                              # NULL payload
            (5, b"whatever"),                       # unknown magic
        ],
        "doc_id LONG, payload BINARY",
    )
    rows = {r.doc_id: r for r in decode_images(df).collect()}
    assert rows[1].format == "jpeg" and rows[1].pixels is None
    assert rows[2].format == "corrupt:bmp" and rows[2].pixels is None
    assert rows[3].format == "corrupt:pnm" and rows[3].pixels is None
    assert rows[4].format is None and rows[4].pixels is None
    assert rows[5].format == "unknown" and rows[5].pixels is None


def test_decoded_bmp_composes_with_resize_and_histogram(spark):
    """Real decoded pixels must flow through the downstream stages the
    fake decoder feeds (same grid contract)."""
    from proglog_spark.multimodal import (
        decode_images,
        extract_pixel_histogram,
        resize_media,
    )

    img = np.full((4, 4, 3), 200, dtype=np.uint8)
    df = spark.createDataFrame([(1, _bmp24(img))], "doc_id LONG, payload BINARY")
    grid = decode_images(df).select("doc_id", "height", "width", "channels", "pixels")
    small = resize_media(grid, 2, 2)
    hist = extract_pixel_histogram(small, dim=16).collect()[0]
    lum = _luma(200, 200, 200)
    want = [0] * 16
    want[lum // 16] = 4
    assert list(hist.hist) == want


def test_decode_audio_pcm16_and_pcm8_exact(spark):
    from proglog_spark.multimodal import decode_audio

    s16 = [0, 1000, -1000, 32767, -32768, 5]
    s8 = [0, 10, -10, 127, -128]
    df = spark.createDataFrame(
        [
            (1, _wav(s16, rate=16000, channels=2, width=2)),
            (2, _wav(s8, rate=8000, channels=1, width=1)),
            (3, b"\xff\xfb mp3ish"),
            (4, None),
        ],
        "doc_id LONG, payload BINARY",
    )
    rows = {r.doc_id: r for r in decode_audio(df, prefix=8).collect()}
    r1 = rows[1]
    assert (r1.format, r1.sample_rate, r1.n_channels) == ("wav", 16000, 2)
    assert r1.n_samples == 3  # 6 interleaved samples / 2 channels
    assert r1.energy == sum(v * v for v in s16)
    assert list(r1.sample_prefix) == s16[:8]
    r2 = rows[2]
    assert (r2.format, r2.sample_rate, r2.n_channels) == ("wav", 8000, 1)
    assert r2.energy == sum(v * v for v in s8)
    assert list(r2.sample_prefix) == s8
    assert rows[3].format == "mp3" and rows[3].energy is None
    assert rows[4].format is None and rows[4].energy is None


def test_decode_audio_corrupt_wav_is_tagged(spark):
    from proglog_spark.multimodal import decode_audio

    good = _wav([1, 2, 3])
    df = spark.createDataFrame(
        [(1, good[:20]), (2, good[:12] + b"\x00" * 8)],
        "doc_id LONG, payload BINARY",
    )
    rows = {r.doc_id: r for r in decode_audio(df).collect()}
    assert all(r.format == "corrupt:wav" and r.energy is None for r in rows.values())


def test_decode_images_small_palette_and_bad_offsets(spark):
    """Review-pinned BMP/PNM edges: biClrUsed < 256 palettes decode
    (not corrupt-tagged), a pixel offset overlapping the headers is
    rejected as corrupt, a PNM without the single separator byte is
    rejected, and low-maxval PNM samples rescale to the 0..255 grid."""
    import struct

    from proglog_spark.multimodal import decode_images

    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    # hand-build a 16-color BMP: palette of 2 used entries, biClrUsed=2
    h, w = 2, 2
    row_size = ((8 * w + 31) // 32) * 4
    raster = b"".join(bytes(r) + b"\x00" * (row_size - w) for r in idx[::-1])
    pal = bytes((255, 255, 255, 0)) + bytes((0, 0, 0, 0))  # white, black (BGR0)
    pix_off = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", pix_off + len(raster), 0, 0, pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(raster), 0, 0, 2, 0)
    small_pal_bmp = hdr + dib + pal + raster

    bad_off = bytearray(small_pal_bmp)
    bad_off[10:14] = (0).to_bytes(4, "little")  # pix_off inside headers

    pgm_lowmax = b"P5\n2 1\n15\n" + bytes([15, 0])  # white, black at maxval 15
    pgm_nosep = b"P5\n2 1\n255" + bytes([7, 9])  # missing separator byte

    df = spark.createDataFrame(
        [
            (1, small_pal_bmp),
            (2, bytes(bad_off)),
            (3, pgm_lowmax),
            (4, pgm_nosep),
        ],
        "doc_id LONG, payload BINARY",
    )
    rows = {r.doc_id: r for r in decode_images(df).collect()}
    assert rows[1].format == "bmp" and list(rows[1].pixels) == [255, 0, 0, 255]
    assert rows[2].format == "corrupt:bmp" and rows[2].pixels is None
    assert rows[3].format == "pnm" and list(rows[3].pixels) == [255, 0]
    assert rows[4].format == "corrupt:pnm" and rows[4].pixels is None


def test_decode_audio_truncated_data_chunk_is_corrupt(spark):
    """A WAV whose header claims more frames than the data chunk holds
    must be tagged corrupt, not reported clean with half the energy."""
    from proglog_spark.multimodal import decode_audio

    good = _wav([1, 2, 3, 4, 5, 6, 7, 8])
    cut = good[:-6]  # drop 3 samples' bytes, header untouched
    df = spark.createDataFrame([(1, cut)], "doc_id LONG, payload BINARY")
    r = decode_audio(df).collect()[0]
    assert r.format == "corrupt:wav" and r.energy is None


def test_pixel_histogram_handles_mixed_grid_sizes(spark):
    """decode_images emits per-image geometries; the histogram stage
    must not assume uniform grid sizes within a batch."""
    from proglog_spark.multimodal import extract_pixel_histogram

    df = spark.createDataFrame(
        [
            (1, 2, 2, 1, [0, 0, 16, 255]),
            (2, 1, 2, 1, [32, 33]),
            (3, None, None, None, None),
        ],
        "doc_id LONG, height INT, width INT, channels INT, pixels ARRAY<INT>",
    )
    rows = {r.doc_id: r.hist for r in extract_pixel_histogram(df, dim=16).collect()}
    want1 = [0] * 16
    want1[0], want1[1], want1[15] = 2, 1, 1
    want2 = [0] * 16
    want2[2] = 2
    assert list(rows[1]) == want1 and list(rows[2]) == want2
    assert rows[3] is None


def test_registered_decoder_closes_the_compressed_boundary(spark):
    """The pluggable seam: a registered decoder for a sniffed
    compressed format participates in decode_images with the SAME
    never-crash contract as the built-ins — decoded rows, an
    out-of-scope None -> unsupported:<fmt>, a ValueError ->
    corrupt:<fmt> — and unregistered formats keep their tag with NULL
    fields."""
    from proglog_spark.multimodal.media import (
        _IMAGE_DECODERS,
        decode_images,
        register_image_decoder,
    )

    def fake_jpeg(data: bytes):
        # trivially "decodes" the bytes after the 3-byte magic as a
        # 1-row luma grid; 4th byte 0xFF means corrupt, 0xFE means
        # out-of-scope
        body = data[3:]
        if body[:1] == b"\xff":
            raise ValueError("bad scan")
        if body[:1] == b"\xfe":
            return None
        return 1, len(body), 1, np.frombuffer(body, np.uint8).astype(np.int64)

    register_image_decoder("jpeg", fake_jpeg)
    try:
        rows = {
            r.doc_id: r
            for r in decode_images(
                spark.createDataFrame(
                    [
                        (1, b"\xff\xd8\xff" + bytes([10, 20, 30])),
                        (2, b"\xff\xd8\xff" + b"\xff rest"),
                        (3, b"\xff\xd8\xff" + b"\xfe rest"),
                        # sniffed format with no registered decoder
                        # (png no longer qualifies — the stdlib codec
                        # registers for it at package import)
                        (4, b"ID3 mp3-ish bytes"),
                    ],
                    "doc_id LONG, payload BINARY",
                )
            ).collect()
        }
    finally:
        _IMAGE_DECODERS.pop("jpeg", None)
    assert (rows[1].format, rows[1].height, rows[1].width) == ("jpeg", 1, 3)
    assert list(rows[1].pixels) == [10, 20, 30]
    assert rows[2].format == "corrupt:jpeg" and rows[2].pixels is None
    assert rows[3].format == "unsupported:jpeg" and rows[3].pixels is None
    assert rows[4].format == "mp3" and rows[4].pixels is None


def test_pillow_auto_hook_decodes_real_png(spark):
    """ENV-GATED (skips where Pillow is absent — this container):
    the import-try auto-hook registers _pillow_luma_decoder for
    jpeg/png at module import, so a REAL compressed payload decodes
    through the same decode_images path as the built-ins, and a
    corrupt body (valid PNG header, truncated stream — Pillow raises
    OSError, not UnidentifiedImageError) maps to corrupt:png instead
    of killing the job (the decoder-contract exception set). The
    stdlib PNG codec overrides the auto-hook's "png" slot at package
    import, so this test re-registers the Pillow decoder explicitly
    to exercise the Pillow path."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")
    from proglog_spark.multimodal.media import (
        _IMAGE_DECODERS,
        _pillow_luma_decoder,
        decode_images,
    )
    from proglog_spark.multimodal.png import decode_png

    assert "jpeg" in _IMAGE_DECODERS  # the auto-hook's slot survives

    # a real 2x3 grayscale PNG with known pixel values
    im = PIL_Image.new("L", (3, 2))
    im.putdata([0, 128, 255, 10, 20, 30])
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    good = buf.getvalue()
    truncated = good[: len(good) // 2]  # valid header, corrupt body

    # restore whatever was registered BEFORE the test mutated the slot
    # (ADVICE-r7: hardcoding decode_png here would silently install the
    # wrong decoder if registration order or the default ever changes)
    prev = _IMAGE_DECODERS["png"]
    _IMAGE_DECODERS["png"] = _pillow_luma_decoder
    try:
        rows = {
            r.doc_id: r
            for r in decode_images(
                spark.createDataFrame(
                    [(1, good), (2, truncated)], "doc_id LONG, payload BINARY"
                )
            ).collect()
        }
    finally:
        _IMAGE_DECODERS["png"] = prev
    assert (rows[1].format, rows[1].height, rows[1].width) == ("png", 2, 3)
    assert list(rows[1].pixels) == [0, 128, 255, 10, 20, 30]
    assert rows[2].format == "corrupt:png" and rows[2].pixels is None

    # cross-codec agreement: the stdlib decoder reads Pillow's bytes
    h, w, ch, px = decode_png(good)
    assert (h, w, ch) == (2, 3, 1)
    assert list(px) == [0, 128, 255, 10, 20, 30]


def test_dhash64_bit_rule_and_nulls(spark):
    """dHash bit k (= r*8+c) is set iff grid[r][c+1] > grid[r][c] on
    the 8x9 luma grid; NULL-pixel rows drop (no perceptual identity).
    A strictly increasing 72-byte ramp sets every bit (lo = hi = the
    32-bit all-ones word); a constant payload sets none."""
    from proglog_spark.multimodal import decode_media, dhash64

    ramp = bytes(range(72))  # 72 bytes -> 1 byte per pixel, increasing
    flat = bytes([7]) * 72
    df = spark.createDataFrame(
        [(1, ramp), (2, flat), (3, None)], "doc_id LONG, payload BINARY"
    )
    out = {
        r.id: (r.simhash_lo, r.simhash_hi)
        for r in dhash64(decode_media(df, height=8, width=9)).collect()
    }
    assert set(out) == {1, 2}  # NULL payload row dropped
    assert out[1] == ((1 << 32) - 1, (1 << 32) - 1)
    assert out[2] == (0, 0)


def test_dhash64_single_bit(spark):
    """One bumped pixel flips exactly the expected bits: raising
    grid[0][1] above its neighbors sets bit 0 (px[0][1] > px[0][0])
    and clears bit 1 (px[0][2] > px[0][1] now false) relative to the
    flat baseline — pinning both the bit index math and the 9-wide
    row stride."""
    from proglog_spark.multimodal import decode_media, dhash64

    base = bytearray([10]) * 72
    bumped = bytearray(base)
    bumped[1] = 200  # grid[0][1]
    df = spark.createDataFrame(
        [(1, bytes(bumped))], "doc_id LONG, payload BINARY"
    )
    (row,) = dhash64(decode_media(df, height=8, width=9)).collect()
    assert row.simhash_lo == 1  # only bit 0 set
    assert row.simhash_hi == 0


def test_decode_dhash64_matches_composed(spark):
    """The r11 fused decode+hash stage must be BIT-IDENTICAL to the
    composed dhash64(decode_media(height=8, width=9)) pipeline it
    replaced in the frame-fingerprint paths — over every payload
    class: exact-72-byte rasters (the shot-frame shape), short and
    long payloads (uneven slice means), ramp/flat/single-bump
    patterns, empty payloads (zero grid), and NULL payloads (row
    drops on both paths)."""
    from proglog_spark.multimodal import decode_dhash64, decode_media, dhash64

    payloads = [
        (1, bytes(range(72))),            # exact-size ramp
        (2, bytes([7]) * 72),             # flat
        (3, bytes([10] * 1 + [200] + [10] * 70)),  # single bump
        (4, b"abcdefghi" * 3),            # short (27B -> uneven slices)
        (5, bytes(range(256)) * 3),       # long (768B -> multi-byte means)
        (6, b""),                         # empty -> zero grid
        (7, None),                        # NULL -> dropped
        (8, b"x"),                        # 1 byte
    ]
    df = spark.createDataFrame(payloads, "doc_id LONG, payload BINARY")
    composed = {
        r.id: (r.simhash_lo, r.simhash_hi)
        for r in dhash64(decode_media(df, height=8, width=9)).collect()
    }
    fused = {
        r.id: (r.simhash_lo, r.simhash_hi)
        for r in decode_dhash64(df).collect()
    }
    assert fused == composed
    assert set(fused) == {1, 2, 3, 4, 5, 6, 8}  # NULL row dropped


def test_decode_pixel_histogram_matches_composed(spark):
    """The r11 fused decode(+resize)+histogram stage must be
    BIT-IDENTICAL to the composed extract_pixel_histogram(
    resize_media?(decode_media(...))) chain it replaced in
    docs_media_pipeline / docs_image_feature_topk — over the same
    payload classes as the decode_dhash64 pin (exact-size, short,
    long, ramp/flat, empty → zero grid, NULL → NULL hist), both WITH
    the 8x8→4x4 resize in the middle and WITHOUT (8x9 direct)."""
    from proglog_spark.multimodal import (
        decode_media,
        decode_pixel_histogram,
        extract_pixel_histogram,
        resize_media,
    )

    payloads = [
        (1, bytes(range(72))),
        (2, bytes([7]) * 64),
        (3, bytes([10] + [200] + [10] * 70)),
        (4, b"abcdefghi" * 3),
        (5, bytes(range(256)) * 3),
        (6, b""),
        (7, None),
        (8, b"x"),
    ]
    df = spark.createDataFrame(payloads, "doc_id LONG, payload BINARY")

    def as_map(rows):
        return {
            r.doc_id: None if r.hist is None else tuple(r.hist) for r in rows
        }

    # with resize (the docs_media_pipeline shape)
    composed = as_map(
        extract_pixel_histogram(
            resize_media(
                decode_media(df, height=8, width=8), out_h=4, out_w=4
            ).select("doc_id", "pixels"),
            dim=16,
        ).collect()
    )
    fused = as_map(
        decode_pixel_histogram(
            df, height=8, width=8, dim=16, out_h=4, out_w=4
        ).collect()
    )
    assert fused == composed
    # without resize (the docs_image_feature_topk shape)
    composed9 = as_map(
        extract_pixel_histogram(
            decode_media(df, height=8, width=9), dim=16
        ).collect()
    )
    fused9 = as_map(decode_pixel_histogram(df, height=8, width=9, dim=16).collect())
    assert fused9 == composed9
    assert fused[7] is None and fused9[7] is None  # NULL propagates


def test_ahash64_from_energies_matches_audio_ahash64(spark):
    """The r11 split of audio_ahash64 into envelope + bit-packing
    halves must compose back to the identical fingerprint:
    ahash64_from_energies(audio_frame_energies(d)) == audio_ahash64(d)
    over short/long/empty/NULL sample arrays."""
    from proglog_spark.multimodal import (
        ahash64_from_energies,
        audio_ahash64,
        audio_frame_energies,
    )

    rows = [
        (1, list(range(200))),          # full 65*3+ samples
        (2, [5] * 10),                  # short clip (empty tail frames)
        (3, []),                        # empty signal
        (4, None),                      # NULL drops on both paths
        (5, [-7, 100, -128, 3] * 60),
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, sample_prefix ARRAY<INT>"
    )
    direct = {
        r.id: (r.simhash_lo, r.simhash_hi) for r in audio_ahash64(df).collect()
    }
    split = {
        r.id: (r.simhash_lo, r.simhash_hi)
        for r in ahash64_from_energies(audio_frame_energies(df)).collect()
    }
    assert split == direct
    assert set(direct) == {1, 2, 3, 5}


def test_image_sketch_null_and_empty_payloads(spark):
    """The image tier's NULL contract, pinned Spark-side (the fixture
    has no NULL/empty text, so the gates never exercise it): NULL
    payloads drop from the sketch (no perceptual identity — matching
    the oracle CTEs' WHERE text IS NOT NULL), while EMPTY payloads
    decode to the all-zero grid and hash to 0/0 on both engines."""
    from proglog_spark.multimodal import decode_media, dhash64

    df = spark.createDataFrame(
        [(1, None), (2, b""), (3, bytes(range(72)))],
        "doc_id LONG, payload BINARY",
    )
    out = {
        r.id: (r.simhash_lo, r.simhash_hi)
        for r in dhash64(decode_media(df, height=8, width=9)).collect()
    }
    assert set(out) == {2, 3}  # NULL dropped, empty kept
    assert out[2] == (0, 0)  # empty payload -> constant grid -> no bits


def test_decode_audio_null_payload_and_bad_wav(spark):
    """decode_audio's never-crash contract over the rows the WAV
    round-trip gate can't produce: NULL payload -> NULL-format row;
    a non-WAV payload tags its sniffed format with NULL fields; a
    truncated WAV (data chunk shorter than declared) tags corrupt."""
    from proglog_spark.multimodal import decode_audio

    def wav(samples: bytes, declared: int | None = None) -> bytes:
        n = len(samples) if declared is None else declared
        h = (
            b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVEfmt "
            + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
            + b"data" + n.to_bytes(4, "little")
        )
        return h + samples

    rows = {
        r.doc_id: r
        for r in decode_audio(
            spark.createDataFrame(
                [
                    (1, None),
                    (2, b"\x89PNG\r\n\x1a\nnot audio"),
                    (3, wav(b"\x80" * 8, declared=64)),
                    (4, wav(bytes([128, 130, 126, 128]))),
                ],
                "doc_id LONG, payload BINARY",
            )
        ).collect()
    }
    assert rows[1].format is None and rows[1].energy is None
    assert rows[2].format == "png" and rows[2].energy is None
    assert rows[3].format == "corrupt:wav" and rows[3].energy is None
    assert rows[4].format == "wav" and rows[4].n_samples == 4
    assert rows[4].energy == 0 + 4 + 4 + 0  # centered at 128


def test_pillow_png_through_resize_and_dhash(spark):
    """ENV-GATED (skips where Pillow is absent — this container): the
    REAL-decoder composition a deployment runs for image dedup —
    decode_images (PILLOW-ENCODED bytes through the stdlib PNG codec,
    a cross-codec check) → resize_media to 8x9 → dhash64 — produces
    exactly the hash computed independently from the PNG's known
    pixels with the same nearest-neighbor index math and bit rule.
    The always-run twin over encode_png lives in test_png.py."""
    import io

    import numpy as np

    PIL_Image = pytest.importorskip("PIL.Image")
    from proglog_spark.multimodal import decode_images, dhash64, resize_media

    h_in, w_in = 18, 16
    rng = np.random.default_rng(7)
    grid = rng.integers(0, 256, size=(h_in, w_in), dtype=np.uint8)
    im = PIL_Image.fromarray(grid, mode="L")
    buf = io.BytesIO()
    im.save(buf, format="PNG")

    dec = decode_images(
        spark.createDataFrame([(1, buf.getvalue())], "doc_id LONG, payload BINARY")
    ).select("doc_id", "height", "width", "channels", "pixels")
    (row,) = dhash64(resize_media(dec, out_h=8, out_w=9)).collect()

    # independent expectation from the known pixels
    rows_idx = (np.arange(8) * h_in) // 8
    cols_idx = (np.arange(9) * w_in) // 9
    small = grid.astype(np.int64)[rows_idx][:, cols_idx]
    lo = hi = 0
    for k in range(64):
        r, c = divmod(k, 8)
        bit = int(small[r, c + 1] > small[r, c])
        if k < 32:
            lo |= bit << k
        else:
            hi |= bit << (k - 32)
    assert (row.simhash_lo, row.simhash_hi) == (lo, hi)


def _ahash_model(samples):
    """Pure-Python twin of audio_ahash64's frame-energy bit rule: 65
    frames of 3 samples (missing samples past the end contribute 0),
    bit k set iff energy[k+1] > energy[k]."""
    e = [sum(x * x for x in samples[k * 3:k * 3 + 3]) for k in range(65)]
    lo = hi = 0
    for k in range(64):
        bit = int(e[k + 1] > e[k])
        if k < 32:
            lo |= bit << k
        else:
            hi |= bit << (k - 32)
    return lo, hi


def test_audio_ahash64_bit_rule_and_nulls(spark):
    """audio_ahash64 on hand-built sample arrays: a ramp of strictly
    increasing |amplitude| sets every bit, a constant signal sets
    none, NULL sample rows drop, empty/short clips pad with
    zero-energy frames — all pinned against the pure-Python model."""
    from proglog_spark.multimodal import audio_ahash64

    ramp = list(range(1, 196))          # 65 full frames, rising energy
    flat = [5] * 195
    short = [3, -4, 12, 7]              # 2 frames, then zero-energy pad
    df = spark.createDataFrame(
        [(1, ramp), (2, flat), (3, None), (4, []), (5, short)],
        "doc_id LONG, sample_prefix ARRAY<INT>",
    )
    out = {
        r.id: (r.simhash_lo, r.simhash_hi)
        for r in audio_ahash64(df).collect()
    }
    assert set(out) == {1, 2, 4, 5}     # NULL row dropped, empty kept
    assert out[1] == ((1 << 32) - 1, (1 << 32) - 1)
    assert out[2] == (0, 0)             # equal energies: strict > fails
    assert out[4] == (0, 0)
    assert out[5] == _ahash_model(short)
    # bit 0 only: frame 1 louder than frame 0, silence after
    one = [0, 0, 0, 9, 0, 0]
    (row,) = audio_ahash64(
        spark.createDataFrame([(9, one)], "doc_id LONG, sample_prefix ARRAY<INT>")
    ).collect()
    assert (row.simhash_lo, row.simhash_hi) == (1, 0)


def test_audio_ahash64_through_real_wav_decode(spark):
    """End-to-end audio fingerprint through the REAL codec path: WAV
    bytes built with the stdlib writer -> decode_audio -> ahash, vs
    the model over the known (centered) samples — plus the near-dup
    composition: a 1-sample edit in one frame stays within a small
    Hamming radius of the original while a scrambled clip does not."""
    import random

    from proglog_spark.multimodal import audio_ahash64, decode_audio
    from proglog_spark.operators import dedup

    rng = random.Random(42)
    orig = [rng.randrange(-128, 128) for _ in range(216)]
    edited = list(orig)
    edited[30] = 127                    # one loud sample: few bits flip
    scrambled = orig[::-1]
    rows = [
        (1, _wav(orig, width=1)),
        (2, _wav(edited, width=1)),
        (3, _wav(scrambled, width=1)),
    ]
    dec = decode_audio(
        spark.createDataFrame(rows, "doc_id LONG, payload BINARY"), prefix=216
    )
    out = {
        r.id: (r.simhash_lo, r.simhash_hi)
        for r in audio_ahash64(dec).collect()
    }
    assert out[1] == _ahash_model(orig)
    assert out[2] == _ahash_model(edited)
    assert out[3] == _ahash_model(scrambled)

    def ham(a, b):
        return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")

    assert 0 < ham(out[1], out[2]) <= 3    # near-dup: a frame-local edit
    assert ham(out[1], out[3]) > 3         # reversal: different envelope
    # and the blocking machinery finds exactly the near pair
    fp = audio_ahash64(dec)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.hamming_pairs(fp, max_hamming=3, blocks=4).collect()
    }
    assert set(pairs) == {(1, 2)}


def test_audio_frame_energies_values_and_nulls(spark):
    """The envelope is the exact integer per-frame Σs²: known values
    for a hand signal, zero-padding past short clips, NULL rows drop,
    and the default geometry (65 frames of 3) matches what
    audio_ahash64 and docs_audio_energy_topk consume."""
    from proglog_spark.multimodal import audio_frame_energies

    sig = [1, -2, 3, 0, 4, 0, 5]        # frames: 14, 16, 25, 0, 0...
    df = spark.createDataFrame(
        [(1, sig), (2, None), (3, [])],
        "doc_id LONG, sample_prefix ARRAY<INT>",
    )
    out = {r.id: list(r.energies) for r in audio_frame_energies(df).collect()}
    assert set(out) == {1, 3}
    assert len(out[1]) == 65
    assert out[1][:4] == [1 + 4 + 9, 16, 25, 0]
    assert all(v == 0 for v in out[1][3:])
    assert out[3] == [0] * 65


def test_parallelism_guard_skips_shuffled_and_streaming_inputs(spark, sf_dir):
    """_ensure_python_stage_parallelism must (a) widen a scan-shaped
    under-partitioned input, (b) return a shuffle-shaped input
    UNCHANGED without touching df.rdd (touching it executes the
    upstream stages eagerly under AQE), and (c) pass streaming plans
    through untouched."""
    from proglog_spark.multimodal.media import _ensure_python_stage_parallelism
    from proglog_spark.sources.tables import load_table

    scan = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    widened = _ensure_python_stage_parallelism(scan)
    assert (
        widened.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )

    d = load_table(spark, sf_dir, "documents")
    joined = d.groupBy("source").count().join(d, "source")
    assert _ensure_python_stage_parallelism(joined) is joined  # untouched

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    assert _ensure_python_stage_parallelism(stream) is stream


def test_parallelism_guard_matches_plan_nodes_not_tokens(spark, sf_dir):
    """ADVICE-r8: the shuffle-shape test matches plan NODE CLASSES, not
    raw plan-string substrings — a scan whose column is literally named
    "Join" (or whose filter literal says 'Sort') must still be widened
    (the old substring scan silently skipped it, reinstating the
    single-partition decode path), while a scan filtered through an
    IN-subquery whose inner plan aggregates must be left alone (the
    subquery's exchange would execute eagerly under the df.rdd probe)."""
    from proglog_spark.multimodal.media import _ensure_python_stage_parallelism
    from proglog_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    trap = d.select(
        F.col("doc_id").alias("Join"), F.col("text").alias("Sort")
    ).where(F.col("Sort") != "Window Aggregate Repartition")
    widened = _ensure_python_stage_parallelism(trap)
    assert (
        widened.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )

    d.createOrReplaceTempView("parallelism_guard_docs")
    sub = spark.sql(
        "SELECT doc_id, text FROM parallelism_guard_docs WHERE source IN "
        "(SELECT source FROM parallelism_guard_docs "
        "GROUP BY source HAVING count(*) > 1)"
    )
    assert _ensure_python_stage_parallelism(sub) is sub  # untouched
