from snapflow_spark.multimodal.columns import (
    BLOB_META_SCHEMA,
    attach_fake_blob,
    decode_image,
    extract_features,
    resize_images,
    sample_frames,
)

__all__ = [
    "BLOB_META_SCHEMA",
    "attach_fake_blob",
    "decode_image",
    "extract_features",
    "resize_images",
    "sample_frames",
]
