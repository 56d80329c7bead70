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
                if payload is None:
                    continue  # null payload: no frames (like empty)
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
            # batch-wide vectorization: concatenate payloads, segment-mean
            # all docs' slices in ONE reduceat (empty payloads -> one 0
            # byte; empty slices of short payloads fall back to the byte
            # at the slice start, matching the per-doc nearest-rank rule)
            null_mask = np.array([p is None for p in pdf["payload"]])
            raw = [
                b"\x00" if p is None or not len(p) else bytes(p)
                for p in pdf["payload"]
            ]
            lens = np.array([len(r) for r in raw], dtype=np.int64)
            data = np.frombuffer(b"".join(raw), dtype=np.uint8).astype(np.float64)
            doc_starts = np.cumsum(lens) - lens
            bounds = doc_starts[:, None] + (np.arange(n_px) * lens[:, None]) // n_px
            starts = bounds.ravel()
            sums = np.add.reduceat(data, starts)
            counts = np.maximum(np.diff(np.append(starts, len(data))), 1)
            empty = np.diff(np.append(starts, len(data))) == 0
            means = np.where(empty, data[np.minimum(starts, len(data) - 1)], sums / counts)
            pixels = means.astype(np.int64).reshape(len(raw), n_px)
            dims = pd.Series(np.full(len(raw), height)).astype("Int32").mask(null_mask)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # null payload -> all-NULL decode row (propagate,
                    # don't crash the Arrow worker on len(None))
                    "height": dims,
                    "width": pd.Series(np.full(len(raw), width)).astype("Int32").mask(null_mask),
                    "channels": pd.Series(np.full(len(raw), 1)).astype("Int32").mask(null_mask),
                    "pixels": [
                        None if isnull else px
                        for isnull, px in zip(null_mask, pixels)
                    ],
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
            if not len(pdf):
                continue
            null_mask = pdf["pixels"].isna().to_numpy()
            # one fancy-index per (h, w) geometry group, not per row
            out = np.empty((len(pdf), out_h * out_w), dtype=np.int64)
            hw = pdf[["height", "width"]].to_numpy(dtype="float64")
            for h, w in {tuple(x) for x in hw[~null_mask]}:
                h, w = int(h), int(w)
                mask = (hw[:, 0] == h) & (hw[:, 1] == w) & ~null_mask
                grids = np.stack(pdf["pixels"][mask].to_numpy()).reshape(-1, h, w)
                rows = (np.arange(out_h) * h) // out_h
                cols_ = (np.arange(out_w) * w) // out_w
                out[mask] = grids[:, rows][:, :, cols_].reshape(-1, out_h * out_w)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "height": pd.Series(np.full(len(pdf), out_h)).astype("Int32").mask(null_mask),
                    "width": pd.Series(np.full(len(pdf), out_w)).astype("Int32").mask(null_mask),
                    "channels": pdf["channels"],
                    "pixels": [
                        None if isnull else px
                        for isnull, px in zip(null_mask, out)
                    ],
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
            if not len(pdf):
                continue
            null_mask = np.array([p is None for p in pdf["payload"]])
            raw = [b"" if p is None else bytes(p) for p in pdf["payload"]]
            lens = np.array([len(r) for r in raw], dtype=np.int64)
            data = np.frombuffer(b"".join(raw), dtype=np.uint8).astype(np.int64)
            doc_idx = np.repeat(np.arange(len(raw)), lens)
            hists = np.bincount(
                data // (256 // dim) + doc_idx * dim, minlength=dim * len(raw)
            ).reshape(len(raw), dim).astype(np.float64)
            norms = np.maximum(np.linalg.norm(hists, axis=1, keepdims=True), 1e-300)
            normed = hists / norms
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # null payload -> NULL feature (propagate, not crash)
                    "feature": [
                        None if isnull else f
                        for isnull, f in zip(null_mask, normed)
                    ],
                }
            )

    return cols.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)


def extract_pixel_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Intensity-histogram feature over decoded/resized pixel grids
    (dim buckets over 0..255, L2-normalized): the float twin of
    `extract_pixel_histogram`, implemented ON TOP of it — the bucket
    math lives once (the oracle gate relies on the integer/float twin
    relationship), and the normalization is plain JVM-side column
    arithmetic, so no second Python stage runs at all. NULL pixels
    propagate as a NULL feature."""
    h = extract_pixel_histogram(df, dim)
    norm = F.sqrt(
        F.aggregate(
            "hist", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
        )
    )
    return h.select(
        "doc_id",
        F.transform(
            "hist", lambda x: x.cast("double") / F.greatest(norm, F.lit(1e-300))
        ).alias("feature"),
    )


PIXEL_HIST_SCHEMA = "doc_id LONG, hist ARRAY<LONG>"


def extract_pixel_histogram(df: DataFrame, dim: int = 16) -> DataFrame:
    """Integer twin of `extract_pixel_features`: the raw intensity
    histogram counts (dim buckets over 0..255), UN-normalized — every
    value is an exact BIGINT, which is what lets the full
    decode→resize→feature chain sit in the hash-compared oracle gate
    (the L2-normalized float variant is built on top of this). NULL
    pixel rows propagate as NULL histograms."""
    assert 256 % dim == 0

    def hist_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            null_mask = pdf["pixels"].isna().to_numpy()
            fill = pdf["pixels"][~null_mask]
            n_px = len(fill.iloc[0]) if len(fill) else 1
            safe = [
                np.zeros(n_px, dtype=np.int64) if isnull else np.asarray(px)
                for isnull, px in zip(null_mask, pdf["pixels"])
            ]
            grids = np.stack(safe).astype(np.int64)
            buckets = grids // (256 // dim) + dim * np.arange(len(grids))[:, None]
            hists = np.bincount(buckets.ravel(), minlength=dim * len(grids)).reshape(
                len(grids), dim
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "hist": [
                        None if isnull else h
                        for isnull, h in zip(null_mask, hists)
                    ],
                }
            )

    return df.mapInPandas(hist_batches, schema=PIXEL_HIST_SCHEMA)


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
                    # null payload -> NULL metadata (propagate, not crash)
                    "n_bytes": payloads.map(
                        lambda b: None if b is None else len(b)
                    ).astype("Int64"),
                    "header_hex": payloads.map(
                        lambda b: None if b is None else bytes(b[:4]).hex().upper()
                    ),
                }
            )

    return cols.mapInPandas(meta_batches, schema=MEDIA_META_SCHEMA)
