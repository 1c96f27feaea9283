"""Multimodal columns (SURVEY.md §2.B.11): image/audio/video payloads
as opaque BINARY columns + a typed metadata struct, processed by
Arrow-batched pandas iterators (mapInPandas).

Round 2: the codec layer is REAL for uncompressed formats — blobs are
actual encoded PPM/BMP images (codec.py, pure numpy), decode parses
headers + pixel data, features are pixel statistics, and resize is a
nearest-neighbor resample re-encoded in the source format. JPEG/PNG
still raise NotImplementedError inside decode_image_bytes (no codec
library in this environment) — an explicit, not silent, gap.

At 100 TB: blobs ride in parquet binary columns (or as object-store
URIs in `meta.source_uri` with late fetching inside the mapInPandas
iterator); batches stream through python workers without ever
collecting a partition, and `spark.sql.files.maxPartitionBytes` plus
the Arrow batch size bound worker memory. Decode+featurize FUSE into
one mapInPandas stage (extract_features) so raw pixels never hit
storage or shuffle; decode_images materializing pixel arrays is for
small slices and tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snapflow_spark.multimodal.codec import (
    decode_image_bytes,
    encode_bmp,
    encode_png,
    encode_ppm,
    resize_nearest,
    synthesize_image,
)

BLOB_META_SCHEMA = (
    "struct<modality:string, mime:string, width:int, height:int, "
    "duration_ms:int, source_uri:string>"
)

# [mean_r, mean_g, mean_b, std_r, std_g, std_b, width, height]
FEATURE_DIM = 8

_MIME = {
    "ppm": "image/x-portable-pixmap",
    "bmp": "image/bmp",
    "png": "image/png",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "tiff": "image/tiff",
}


def attach_image_blob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 8,
    height: int = 8,
    modality: str = "image",
) -> DataFrame:
    """Deterministic REAL image payload per row: pixels synthesized
    from the text bytes (codec.synthesize_image), encoded round-robin
    by id as P6 PPM / 24-bit BMP / 8-bit PNG / baseline JPEG /
    PROGRESSIVE JPEG / GIF / LZW TIFF — so every downstream op
    exercises every decoder (PNG added round 3: stdlib-zlib codec;
    JPEG added round 4; progressive, GIF and TIFF round 5; the JPEGs
    are the LOSSY members —
    features downstream are statistics of the decoded pixels,
    deterministic either way). Real pipelines replace this with a
    parquet binary column or URI; everything downstream is
    unchanged."""

    def _blobs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from snapflow_spark.multimodal.gif import encode_gif
        from snapflow_spark.multimodal.jpeg import (
            encode_jpeg,
            encode_jpeg_progressive,
        )
        from snapflow_spark.multimodal.tiff import encode_tiff

        for pdf in batches:
            out = pdf.copy()
            blobs = []
            mimes = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                arr = synthesize_image(
                    str(text or "").encode("utf-8"), width=width, height=height
                )
                pick = int(doc_id) % 7
                if pick == 0:
                    blobs.append(encode_ppm(arr))
                    mimes.append(_MIME["ppm"])
                elif pick == 1:
                    blobs.append(encode_bmp(arr))
                    mimes.append(_MIME["bmp"])
                elif pick == 2:
                    blobs.append(encode_png(arr))
                    mimes.append(_MIME["png"])
                elif pick == 3:
                    blobs.append(encode_jpeg(arr, quality=95))
                    mimes.append(_MIME["jpeg"])
                elif pick == 4:
                    blobs.append(encode_jpeg_progressive(arr, quality=95))
                    mimes.append(_MIME["jpeg"])
                elif pick == 5:
                    # lossless here: an 8x8 synthesized tile has
                    # <=64 distinct colors, inside GIF's palette
                    blobs.append(encode_gif(arr))
                    mimes.append(_MIME["gif"])
                else:
                    blobs.append(encode_tiff(arr, compression="lzw"))
                    mimes.append(_MIME["tiff"])
            out["blob"] = blobs
            out["mime"] = mimes
            yield out

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["blob binary", "mime string"]
    )
    with_blob = df.mapInPandas(_blobs, schema=schema)
    return with_blob.withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.col("mime").alias("mime"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit(0).cast("int").alias("duration_ms"),
            F.concat(F.lit("mem://doc/"), F.col(id_col).cast("string")).alias(
                "source_uri"
            ),
        ),
    ).drop("mime")


def decode_images(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Decode blobs to pixel arrays: (doc_id, width, height, channels,
    pixels flat array<int>). Materializes pixels — use on bounded
    slices / tests; production pipelines fuse decode into the same
    mapInPandas stage as the consumer (extract_features) so pixels
    stay inside worker memory."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "channels": [], "pixels": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = decode_image_bytes(bytes(blob))
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                rows["doc_id"].append(doc_id)
                rows["height"].append(arr.shape[0])
                rows["width"].append(arr.shape[1])
                rows["channels"].append(arr.shape[2])
                rows["pixels"].append(arr.reshape(-1).astype(np.int32).tolist())
            yield pd.DataFrame(rows)

    inp = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))
    return inp.mapInPandas(
        _decode,
        schema="doc_id bigint, width int, height int, channels int, pixels array<int>",
    )


def image_features(arr: np.ndarray) -> list[float]:
    """FEATURE_DIM pixel statistics of one decoded image: per-channel
    mean and std scaled to [0,1], then width and height. The numpy
    reference implementation — the Spark path computes exactly this
    inside mapInPandas."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    f = arr.astype(np.float64)
    means = (f.mean(axis=(0, 1)) / 255.0).tolist()
    stds = (f.std(axis=(0, 1)) / 255.0).tolist()
    return [np.float32(x) for x in means + stds] + [
        np.float32(arr.shape[1]),
        np.float32(arr.shape[0]),
    ]


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas iterator: blob bytes -> decode -> FEATURE_DIM pixel
    statistics. Decode and featurize are FUSED per batch — raw pixels
    never leave the python worker; consumes and yields per-batch,
    never materializes the partition."""
    for pdf in batches:
        feats = [
            image_features(decode_image_bytes(bytes(blob))) for blob in pdf["blob"]
        ]
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "modality": pdf["modality"], "features": feats}
        )


def extract_features(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Feature extraction over binary image blobs via mapInPandas
    (Arrow batches through python workers — the only sane path for
    codec-bound work on Spark). Features are REAL pixel statistics of
    the decoded blob (see image_features)."""
    inp = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(blob_col).alias("blob"),
        F.col("meta.modality").alias("modality"),
    )
    return inp.mapInPandas(
        _featurize_batches,
        schema="doc_id bigint, modality string, features array<float>",
    )


def extract_features_arrow(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-native twin of ``extract_features`` via ``mapInArrow``:
    blob bytes are consumed straight off the Arrow RecordBatch buffers
    (``as_py`` per cell) and features are emitted as a
    FixedSizeList-backed Arrow array — no pandas Series/block
    materialization on either side of the UDF. For binary-heavy
    batches the pandas detour copies every blob into python object
    cells twice; this path is the one to prefer when the blob column
    dominates batch bytes. Output and semantics are identical
    (parity-tested)."""
    import pyarrow as pa

    def _featurize(batches):
        for batch in batches:
            # declared output schema says bigint; mapInArrow performs
            # no coercion (unlike the pandas path), so an int32 id
            # column must be cast here or the batch schema mismatches
            ids = batch.column(0).cast(pa.int64())
            modality = batch.column(1)
            blobs = batch.column(2)
            feats = pa.array(
                [
                    [float(x) for x in image_features(decode_image_bytes(b.as_py()))]
                    for b in blobs
                ],
                type=pa.list_(pa.float32()),
            )
            yield pa.RecordBatch.from_arrays(
                [ids, modality, feats], ["doc_id", "modality", "features"]
            )

    inp = df.select(
        F.col(id_col).alias("doc_id"),
        F.col("meta.modality").alias("modality"),
        F.col(blob_col).alias("blob"),
    )
    return inp.mapInArrow(
        _featurize,
        schema="doc_id bigint, modality string, features array<float>",
    )


def resize_images(
    df: DataFrame, width: int, height: int, blob_col: str = "blob"
) -> DataFrame:
    """Resize image blobs via mapInPandas: decode -> nearest-neighbor
    resample (codec.resize_nearest) -> re-encode in the source format
    (PPM stays PPM, BMP stays BMP); the metadata struct is rewritten
    to the target dimensions. Schema-preserving."""

    from snapflow_spark.multimodal.codec import encode_pgm

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from snapflow_spark.multimodal.gif import encode_gif
        from snapflow_spark.multimodal.jpeg import encode_jpeg
        from snapflow_spark.multimodal.tiff import encode_tiff

        for pdf in batches:
            out = pdf.copy()
            blobs = []
            for b in pdf[blob_col]:
                raw = bytes(b)
                arr = decode_image_bytes(raw)
                small = resize_nearest(arr, width, height)
                if raw[:2] == b"BM":
                    blobs.append(encode_bmp(small))
                elif raw[:2] == b"\x89P":  # PNG stays PNG (gray or RGB)
                    blobs.append(encode_png(small))
                elif raw[:3] == b"\xff\xd8\xff":  # JPEG stays JPEG
                    blobs.append(encode_jpeg(small, quality=95))
                elif raw[:4] == b"GIF8":  # GIF stays GIF
                    blobs.append(encode_gif(small))
                elif raw[:4] in (b"II*\x00", b"MM\x00*"):  # TIFF stays TIFF
                    blobs.append(encode_tiff(small, compression="lzw"))
                elif small.ndim == 2:  # grayscale PGM stays grayscale
                    blobs.append(encode_pgm(small))
                else:
                    blobs.append(encode_ppm(small))
            out[blob_col] = blobs
            yield out

    # format is preserved, so the output mime can be derived from the
    # INPUT blob's magic — keeps meta.mime truthful for grayscale PGM
    # (which would otherwise stay advertised as its old mime). Compare
    # via hex, not decode(UTF-8): PNG's \x89 lead byte is not valid
    # UTF-8 and would garble a string comparison.
    magic = F.hex(F.col(blob_col).substr(1, 2))
    out_mime = (
        F.when(magic == F.lit("424D"), F.lit("image/bmp"))  # "BM"
        .when(magic == F.lit("8950"), F.lit("image/png"))  # \x89"P"
        .when(magic == F.lit("FFD8"), F.lit("image/jpeg"))
        .when(magic == F.lit("4749"), F.lit("image/gif"))  # "GI"
        .when(magic.isin("4949", "4D4D"), F.lit("image/tiff"))  # II / MM
        .when(magic.isin("5035", "5032"), F.lit("image/x-portable-graymap"))  # P5/P2
        .otherwise(F.lit("image/x-portable-pixmap"))
    )
    resized_meta = (
        F.col("meta")
        .withField("width", F.lit(width).cast("int"))
        .withField("height", F.lit(height).cast("int"))
        .withField("mime", out_mime)
    )
    with_meta = df.withColumn("meta", resized_meta)
    return with_meta.mapInPandas(_resize, schema=with_meta.schema)


def sample_frame_offsets(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-OFFSET plan for video blobs: emits (doc_id, frame_ms)
    rows from the metadata duration without touching the payload —
    pure codegen expansion (sequence + explode), no UDF. For actual
    decoded frame sampling see video.sample_frames (real Y4M decode)."""
    return df.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )
