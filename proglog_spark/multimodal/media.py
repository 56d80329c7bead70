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
