from snapflow_spark.multimodal.codec import (
    decode_image_bytes,
    encode_bmp,
    encode_pgm,
    encode_png,
    encode_ppm,
    resize_nearest,
    synthesize_image,
)
from snapflow_spark.multimodal.columns import (
    BLOB_META_SCHEMA,
    FEATURE_DIM,
    attach_image_blob,
    decode_images,
    extract_features,
    image_features,
    resize_images,
    sample_frames,
)

__all__ = [
    "BLOB_META_SCHEMA",
    "FEATURE_DIM",
    "attach_image_blob",
    "decode_image_bytes",
    "decode_images",
    "encode_bmp",
    "encode_pgm",
    "encode_png",
    "encode_ppm",
    "extract_features",
    "image_features",
    "resize_images",
    "resize_nearest",
    "sample_frames",
    "synthesize_image",
]
