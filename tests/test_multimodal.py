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
