from proglog_spark.multimodal.media import (
    DECODE_SCHEMA,
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_META_SCHEMA,
    decode_image_stub,
    decode_media,
    extract_features,
    extract_pixel_features,
    extract_media_meta,
    resize_media,
    sample_frames,
)

__all__ = [
    "DECODE_SCHEMA",
    "FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "MEDIA_META_SCHEMA",
    "decode_image_stub",
    "decode_media",
    "extract_features",
    "extract_pixel_features",
    "extract_media_meta",
    "resize_media",
    "sample_frames",
]
