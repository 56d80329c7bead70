from proglog_spark.multimodal.media import (
    AUDIO_DECODE_SCHEMA,
    DECODE_SCHEMA,
    FEATURE_SCHEMA,
    IMAGE_DECODE_SCHEMA,
    PIXEL_HIST_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_META_SCHEMA,
    audio_ahash64,
    decode_audio,
    decode_image_stub,
    decode_images,
    decode_media,
    dhash64,
    extract_features,
    extract_pixel_features,
    extract_pixel_histogram,
    extract_media_meta,
    resize_media,
    sample_frames,
    sniff_media_format,
)

# imported AFTER media so its register_image_decoder("png", ...) call
# overrides the Pillow auto-hook when Pillow is present (png.py
# docstring has the override contract)
from proglog_spark.multimodal.png import decode_png, encode_png, png_roundtrip

__all__ = [
    "AUDIO_DECODE_SCHEMA",
    "DECODE_SCHEMA",
    "FEATURE_SCHEMA",
    "IMAGE_DECODE_SCHEMA",
    "PIXEL_HIST_SCHEMA",
    "FRAME_SCHEMA",
    "MEDIA_META_SCHEMA",
    "audio_ahash64",
    "decode_audio",
    "decode_image_stub",
    "decode_images",
    "decode_media",
    "dhash64",
    "extract_features",
    "extract_pixel_features",
    "extract_pixel_histogram",
    "extract_media_meta",
    "resize_media",
    "sample_frames",
    "sniff_media_format",
    "decode_png",
    "encode_png",
    "png_roundtrip",
]
