"""Multimodal columns (SURVEY.md §2.B.11): image/audio/video payloads
as opaque BINARY columns + a typed metadata struct, processed by
Arrow-batched pandas iterators (mapInPandas).

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. The *codec* layer (actual JPEG/PNG/WAV
decode) is STUBBED: the image/audio libraries are not in this
container, so ``decode_image`` raises NotImplementedError and tests
exercise the pipeline through ``extract_features``'s deterministic
fake featurizer instead. Swapping in a real decoder changes one
function body, not the dataflow.

At 100 TB: blobs ride in parquet binary columns (or as object-store
URIs in `meta.source_uri` with late fetching inside the mapInPandas
iterator); batches stream through python workers without ever
collecting a partition, and `spark.sql.files.maxPartitionBytes` plus
the Arrow batch size bound worker memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = (
    "struct<modality:string, mime:string, width:int, height:int, "
    "duration_ms:int, source_uri:string>"
)

FEATURE_DIM = 8


def attach_fake_blob(df: DataFrame, text_col: str = "text", modality: str = "image") -> DataFrame:
    """Deterministic stand-in payload: the utf-8 bytes of a text column
    as the BINARY blob, plus a populated metadata struct. Real
    pipelines replace this with a parquet binary column or URI."""
    return df.withColumn("blob", F.encode(F.col(text_col), "utf-8")).withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.length(text_col).cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(0).cast("int").alias("duration_ms"),
            F.concat(F.lit("mem://"), F.col(text_col).substr(1, 16)).alias("source_uri"),
        ),
    )


def decode_image(df: DataFrame, blob_col: str = "blob"):
    """STUB — image decoding needs a codec library (PIL/opencv) that is
    not in this container. The surrounding dataflow is exercised via
    extract_features; swap this body for the real decoder."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this environment; "
        "use extract_features (deterministic fake) to exercise the pipeline"
    )


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas iterator: blob bytes -> FEATURE_DIM float32 vector.
    Deterministic fake featurizer (blake2b-seeded), REAL batch shape:
    consumes and yields per-batch, never materializes the partition."""
    for pdf in batches:
        feats = []
        for blob in pdf["blob"]:
            digest = hashlib.blake2b(bytes(blob or b""), digest_size=FEATURE_DIM * 4).digest()
            vec = np.frombuffer(digest, dtype=np.uint32).astype(np.float32)
            feats.append((vec / np.float32(2**32)).tolist())
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "modality": pdf["modality"], "features": feats}
        )


def extract_features(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over binary blobs via mapInPandas (Arrow
    batches through python workers — the only sane path for
    codec-bound work on Spark)."""
    inp = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(blob_col).alias("blob"),
        F.col("meta.modality").alias("modality"),
    )
    return inp.mapInPandas(
        _featurize_batches,
        schema=f"doc_id bigint, modality string, features array<float>",
    )


def resize_images(
    df: DataFrame, width: int, height: int, blob_col: str = "blob"
) -> DataFrame:
    """Resize plan for image blobs via mapInPandas: the metadata struct
    is rewritten to the target dimensions and the blob passes through a
    per-batch transform. The pixel resample itself is STUBBED (same
    codec constraint as decode_image — a deterministic truncate/pad of
    the byte payload stands in), so tests pin the real contract: batch
    iteration, schema preservation, metadata correctness."""
    meta_t = BLOB_META_SCHEMA

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height  # stand-in payload size
        for pdf in batches:
            out = pdf.copy()
            out["blob"] = [
                bytes(b or b"")[:target].ljust(target, b"\0") for b in pdf["blob"]
            ]
            yield out

    resized_meta = F.col("meta").withField("width", F.lit(width).cast("int")).withField(
        "height", F.lit(height).cast("int")
    )
    with_meta = df.withColumn("meta", resized_meta)
    return with_meta.mapInPandas(_resize, schema=with_meta.schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video blobs: emits (doc_id, frame_ms)
    rows from the metadata duration — the real decoder would seek
    these offsets inside the mapInPandas stage. Pure codegen expansion
    (sequence + explode), no UDF."""
    return df.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )
