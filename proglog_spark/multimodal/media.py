"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: media rides as an opaque
``binary`` column next to typed metadata columns; decode / resize /
feature-extract run as Arrow-batched ``mapInPandas`` stages so bytes
never materialize row-at-a-time in Python. The container has no
image/audio libraries, so the actual decoders are STUBS with real
Spark-side plumbing (schema, batch iteration, partition shape) —
swap ``decode_image_stub`` for a PIL/ffmpeg call in production.

The reference's payload model is exactly this shape: an opaque
``bytes`` value the engine never interprets (api/v1/log.proto:8) —
multimodal columns are its natural generalization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "doc_id LONG, n_bytes LONG, header_hex STRING"


def decode_image_stub(payload: bytes) -> dict:
    """STUB decoder: a real deployment decodes pixels here.

    Raises NotImplementedError for actual pixel access; metadata
    extraction (size, magic bytes) is implemented for real because it
    is what the plumbing tests and the oracle check.
    """
    raise NotImplementedError(
        "media decoding requires an image library not present in this "
        "container; metadata extraction below is the supported path"
    )


FRAME_SCHEMA = "doc_id LONG, frame_idx LONG, frame_bytes LONG, frame_md5 STRING"
DECODE_SCHEMA = "doc_id LONG, height INT, width INT, channels INT, pixels ARRAY<INT>"
FEATURE_SCHEMA = "doc_id LONG, feature ARRAY<DOUBLE>"


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video-style frame sampling over an opaque binary payload.

    Treats the payload as fixed-size ``frame_bytes`` chunks and emits
    every ``every_n``-th chunk as (doc_id, frame_idx, frame_bytes,
    frame_md5). This is the real production plumbing for frame
    extraction — mapInPandas fan-out (one input row → many frame
    rows), Arrow-batched, no driver involvement; a real deployment
    replaces byte-chunking with an ffmpeg keyframe iterator and the
    md5 with a perceptual hash.
    """
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, sizes, digests = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = max((len(data) + frame_bytes - 1) // frame_bytes, 0)
                for k in range(0, n_frames, every_n):
                    chunk = data[k * frame_bytes : (k + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(k)
                    sizes.append(len(chunk))
                    digests.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": sizes, "frame_md5": digests}
            )

    return cols.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


def decode_media(
    df: DataFrame,
    height: int = 4,
    width: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """DETERMINISTIC-FAKE decoder with real decode-stage plumbing.

    A real deployment calls PIL/ffmpeg here (see decode_image_stub for
    the honest NotImplementedError); this fake derives an h x w
    single-channel intensity grid from the payload bytes (mean byte
    value per equal slice — deterministic, library-free), so every
    downstream stage (resize, feature extract) exercises the exact
    schema/batch shape a real decoder would produce.
    """
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    n_px = height * width

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            pixels = []
            for payload in pdf["payload"]:
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(data) == 0:
                    data = np.zeros(1, dtype=np.uint8)
                # mean intensity of n_px equal slices, nearest-rank bounds
                bounds = (np.arange(n_px + 1) * len(data)) // n_px
                px = [
                    int(data[bounds[i] : max(bounds[i + 1], bounds[i] + 1)].mean())
                    for i in range(n_px)
                ]
                pixels.append(px)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "height": height,
                    "width": width,
                    "channels": 1,
                    "pixels": pixels,
                }
            )

    return cols.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


def resize_media(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize over decoded pixel grids — REAL
    implementation (pure numpy index math works on fake and real
    pixels alike). Input = decode_media output; same schema out with
    the new geometry."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for h, w, px in zip(pdf["height"], pdf["width"], pdf["pixels"]):
                grid = np.asarray(list(px), dtype=np.int64).reshape(int(h), int(w))
                rows = (np.arange(out_h) * h) // out_h
                cols_ = (np.arange(out_w) * w) // out_w
                out.append([int(v) for v in grid[np.ix_(rows, cols_)].ravel()])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "height": out_h,
                    "width": out_w,
                    "channels": pdf["channels"],
                    "pixels": out,
                }
            )

    return df.mapInPandas(resize_batches, schema=DECODE_SCHEMA)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Byte-histogram feature vector (dim buckets, L2-normalized) —
    a deterministic, library-free stand-in for a CNN/CLIP embedding
    with the real feature-stage plumbing. Output composes directly
    with operators.similarity (ANN over media features).
    """
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    assert 256 % dim == 0

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(data // (256 // dim), minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                feats.append(list(hist / norm if norm > 0 else hist))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return cols.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)


def extract_media_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    Returns (doc_id, n_bytes, header_hex) — byte length and the hex of
    the first 4 bytes (the "magic number" sniff every media pipeline
    starts with). Demonstrates the mapInPandas batch shape: each
    pandas batch holds the binary column as Python bytes; real
    decoders iterate exactly like this.
    """
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "header_hex": payloads.map(lambda b: bytes(b[:4]).hex().upper()),
                }
            )

    return cols.mapInPandas(meta_batches, schema=MEDIA_META_SCHEMA)
