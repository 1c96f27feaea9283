"""Perceptual image hashing + image near-duplicate pairs (SURVEY.md
§2.B.11 multimodal × dedup): the LAION-style image-dedup path. A
64-bit DCT pHash (the classic construction: grayscale -> 32x32 ->
2D DCT-II -> 8x8 low-frequency block -> median threshold) is robust
to re-encoding, mild compression and resampling — exactly the
transformations that make byte-level image dedup useless — and its
Hamming distance measures perceptual similarity.

Candidate generation reuses the engine's one-shuffle LSH machinery
verbatim: the 64 bits pack into equal band values (`split_bands` —
default 8x8-bit for the pairs path, which GUARANTEES a shared band
for any pair within hamming 7 by pigeonhole), `bucketed_pairs` emits
bounded in-bucket pairs, and the exact Hamming verify runs in
codegen over the packed bands. Fewer, wider bands (4x16) widen the
per-band value space for very large corpora at the cost of the
guarantee radius — the text-simhash trade, parameterized.

Determinism: grayscale is the BT.601 integer luma, resize is the
codec's nearest-neighbor, the DCT matrix is the closed-form
orthonormal DCT-II, and the threshold is the median of the 63
non-DC coefficients (DC carries brightness, not structure — the
imagehash-library convention). Same pixels -> same hash on any
machine; no external hash library to drift against."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snapflow_spark.multimodal.codec import decode_image_bytes, resize_nearest

__all__ = [
    "attach_phash",
    "split_bands",
    "image_near_dup_pairs",
    "phash64",
    "phash_bands",
]

_N = 32  # DCT input side
_K = 8  # low-frequency block side


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis: D[k, i] = c(k)·cos(π(2i+1)k / 2n)."""
    i = np.arange(n)
    k = i[:, None]
    d = np.cos(np.pi * (2 * i[None, :] + 1) * k / (2 * n))
    d *= np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


_D32 = _dct_matrix(_N)


def _gray(arr: np.ndarray) -> np.ndarray:
    a = np.asarray(arr)
    if a.ndim == 2:
        return a.astype(np.float64)
    # BT.601 integer luma — the JPEG-family convention
    r, g, b = (a[..., c].astype(np.int64) for c in range(3))
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.float64)


def phash64(arr: np.ndarray) -> int:
    """(H, W[, 3]) uint8 -> 64-bit perceptual hash (int). Bit order:
    row-major over the 8x8 low-frequency block, MSB first."""
    g = resize_nearest(_gray(arr), _N, _N)
    coeffs = _D32 @ g @ _D32.T
    block = coeffs[:_K, :_K].reshape(-1)
    med = float(np.median(block[1:]))  # DC excluded: brightness only
    bits = block > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h


def split_bands(h: int, n_bands: int = 4) -> list[int]:
    """A 64-bit hash as n_bands equal band values, MSB band first.
    Banding trade (pigeonhole): pairs within hamming <= n_bands-1
    are GUARANTEED to share an exact band; more/narrower bands raise
    recall but shrink the per-band value space (64/n_bands bits), so
    very large corpora want fewer, wider bands plus max_bucket
    truncation observation."""
    if 64 % n_bands:
        raise ValueError(f"n_bands must divide 64: {n_bands}")
    w = 64 // n_bands
    mask = (1 << w) - 1
    vals = [(h >> (64 - w * (i + 1))) & mask for i in range(n_bands)]
    # Band values are opaque join keys, so represent them in SIGNED
    # 64-bit space (two's complement wrap) — n_bands=1 yields the full
    # unsigned hash, which would overflow Arrow's int64 at attach time.
    return [v - (1 << 64) if v >= (1 << 63) else v for v in vals]


def phash_bands(arr: np.ndarray, n_bands: int = 4) -> list[int]:
    """The 64-bit pHash packed as band values (MSB band first) — the
    simhash banding layout `bucketed_pairs` consumes."""
    return split_bands(phash64(arr), n_bands)


def attach_phash(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id",
    n_bands: int = 4,
) -> DataFrame:
    """(id, phash bands) per image blob, decoded + hashed in one
    Arrow-batched mapInPandas pass (the fused decode+featurize shape
    of columns.extract_features)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bvals": [
                        phash_bands(decode_image_bytes(bytes(b)), n_bands)
                        for b in pdf[blob_col]
                    ],
                }
            )

    # array<bigint>: split_bands accepts any n_bands dividing 64, and
    # bands wider than 32 bits (n_bands 1-2, the documented "fewer,
    # wider bands" corpus knob) overflow a signed int only at runtime
    # inside the Arrow batch; the Hamming verify already runs on bigint.
    return df.select(id_col, blob_col).mapInPandas(
        _hash, schema=f"{id_col} bigint, bvals array<bigint>"
    )


def banded_hamming_pairs(
    hashed: DataFrame,
    max_hamming: int,
    id_col: str = "id",
    bands_col: str = "bvals",
    max_bucket: int = 64,
    observation=None,
) -> DataFrame:
    """Near-dup pairs from ANY banded 64-bit signature
    column (image pHash, audio spectral fingerprint, video frame-hash
    majority — the shared tail of every perceptual-dedup path):
    ONE shuffle on (band_idx, band_val) -> bounded in-bucket pairs ->
    exact Hamming verify in codegen (the simhash_sha plan shape;
    ``observation`` surfaces bucket-truncation loss like every LSH
    generator here). Returns (id_a < id_b, hamming)."""
    from snapflow_spark.operators.buckets import bucketed_pairs

    src = hashed.select(
        F.col(id_col).alias("id"), F.col(bands_col).alias("bvals")
    )
    banded = src.select(
        "id", "bvals", F.posexplode("bvals").alias("band_idx", "band_val")
    )
    pairs = bucketed_pairs(
        banded,
        ["band_idx", "band_val"],
        F.struct("id", "bvals"),
        lambda x, y: F.struct(
            x["id"].alias("id_a"),
            y["id"].alias("id_b"),
            F.aggregate(
                F.zip_with(
                    x["bvals"], y["bvals"], lambda a, b: F.bit_count(a.bitwiseXOR(b))
                ),
                F.lit(0),
                lambda acc, v: acc + v,
            ).cast("bigint").alias("hamming"),
        ),
        max_bucket=max_bucket,
        observation=observation,
    )
    return (
        pairs.where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


def image_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    max_bucket: int = 64,
    observation=None,
    n_bands: int = 8,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: pHash bands through the
    shared banded-Hamming tail. The default 8x8-bit banding
    GUARANTEES recall at the default max_hamming=6 (pigeonhole:
    <= n_bands-1); see split_bands for the corpus-size trade."""
    hashed = attach_phash(df, blob_col, id_col, n_bands=n_bands)
    return banded_hamming_pairs(
        hashed, max_hamming, id_col=id_col,
        max_bucket=max_bucket, observation=observation,
    )
