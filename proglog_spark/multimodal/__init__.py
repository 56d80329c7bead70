from proglog_spark.multimodal.media import (
    MEDIA_META_SCHEMA,
    decode_image_stub,
    extract_media_meta,
)

__all__ = ["MEDIA_META_SCHEMA", "decode_image_stub", "extract_media_meta"]
