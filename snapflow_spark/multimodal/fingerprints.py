"""Audio and video perceptual fingerprints (SURVEY.md §2.B.11) —
completing near-dup dedup across every modality the engine carries:
text (simhash/minhash), images (phash.py), and now audio clips and
video clips, all funneling into the SAME one-shuffle banded-Hamming
candidate machinery (`phash.banded_hamming_pairs`).

Audio: a log-spectral band-profile signature (the band-energy family
Haitsma-Kalker 2002 built on, simplified to the form that measured
robust here): framed Hann spectra, 16 log-spaced band energies, bit
= band log-energy ABOVE the frame's mean log-energy, majorities over
4 time-quarters -> 64 bits. Mean-referencing cancels gain exactly
(measured: ÷8 gain flips ≤1 bit) and keeps noise-floor bands stably
below the signal-lifted mean (µ/A-law re-encode ~9 bits; the
adjacent-band-difference and temporal-double-difference variants
measured 22-34 bits on the same inputs — empty-band sign noise —
and were rejected). Different material lands ≥12, median ~25 bits
away on the structured-tone panel.

Video: the majority bit over the per-frame image pHashes (phash.py)
— robust to frame drops, container changes and per-frame
compression, since each bit only needs half the frames to agree.

Both are pure numpy over the existing decoders, fused decode+hash in
one mapInPandas pass like every multimodal stage."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snapflow_spark.multimodal.audio import decode_audio_bytes
from snapflow_spark.multimodal.phash import (
    banded_hamming_pairs,
    phash64,
    split_bands,
)
from snapflow_spark.multimodal.video import decode_video_bytes

__all__ = [
    "attach_audio_fingerprint",
    "attach_video_fingerprint",
    "audio_fingerprint64",
    "audio_near_dup_pairs",
    "video_fingerprint64",
    "video_near_dup_pairs",
]

_FRAME = 1024
_HOP = 512
_BANDS = 17  # 17 log-spaced edges -> 16 band energies -> 16 diff bits


def audio_fingerprint64(samples: np.ndarray, sample_rate: int) -> int:
    """(n[, ch]) int16 -> 64-bit spectral fingerprint. Bit layout:
    4 time-quarters (MSB quarter first) × 16 band bits, bit = band
    log-energy above the frame's mean log-energy, majority over the
    quarter's frames. Short clips zero-pad to one full frame."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 2:
        a = a.mean(axis=1)
    n = a.shape[0]
    if n < _FRAME:
        a = np.pad(a, (0, _FRAME - n))
        n = a.shape[0]
    starts = np.arange(0, n - _FRAME + 1, _HOP)
    window = np.hanning(_FRAME)
    frames = np.stack([a[s : s + _FRAME] * window for s in starts])
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    # log-spaced band edges up to nyquist (proportional edges keep
    # the fingerprint sample-rate-portable); floor the lowest edge
    # near the speech band
    nyq = sample_rate / 2.0
    lo = min(300.0, nyq / 4)
    edges = np.geomspace(lo, nyq, _BANDS)
    bins = np.clip(
        (edges / nyq * (spec.shape[1] - 1)).astype(np.int64), 0, spec.shape[1] - 1
    )
    energies = np.stack(
        [spec[:, bins[b] : max(bins[b + 1], bins[b] + 1)].sum(axis=1)
         for b in range(_BANDS - 1)],
        axis=1,
    )  # (frames, 16)
    # true log (+tiny floor), NOT log1p: log1p breaks the exact
    # gain-cancellation for near-zero bands (measured 8-16 flipped
    # bits at half gain vs <=1 here)
    loge = np.log(energies + 1e-10)
    sig = loge - loge.mean(axis=1, keepdims=True)
    h = 0
    for q in np.array_split(sig, 4, axis=0):
        bits = (
            (q > 0).mean(axis=0) >= 0.5
            if q.shape[0]
            else np.zeros(16, dtype=bool)
        )
        for b in bits:
            h = (h << 1) | int(b)
    return h


def video_fingerprint64(frames: np.ndarray) -> int:
    """(T, H, W[, C]) uint8 -> 64-bit fingerprint: the per-bit
    MAJORITY over each frame's image pHash."""
    f = np.asarray(frames)
    hashes = [phash64(f[t]) for t in range(f.shape[0])]
    bits = np.array(
        [[(h >> (63 - i)) & 1 for i in range(64)] for h in hashes], dtype=np.int64
    )
    maj = bits.mean(axis=0) >= 0.5
    h = 0
    for b in maj:
        h = (h << 1) | int(b)
    return h


def _attach(df: DataFrame, blob_col: str, id_col: str, one) -> DataFrame:
    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bvals": [one(bytes(b)) for b in pdf[blob_col]],
                }
            )

    # array<bigint> for the same reason as phash.attach_phash: bands
    # wider than 32 bits (n_bands < 4) overflow a signed int at runtime.
    return df.select(id_col, blob_col).mapInPandas(
        _hash, schema=f"{id_col} bigint, bvals array<bigint>"
    )


def attach_audio_fingerprint(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id",
    n_bands: int = 8, external: dict | None = None,
) -> DataFrame:
    def one(raw: bytes) -> list[int]:
        samples, rate = decode_audio_bytes(raw, external)
        return split_bands(audio_fingerprint64(samples, rate), n_bands)

    return _attach(df, blob_col, id_col, one)


def attach_video_fingerprint(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id",
    n_bands: int = 8, external: dict | None = None,
) -> DataFrame:
    def one(raw: bytes) -> list[int]:
        frames, _fps = decode_video_bytes(raw, external)
        return split_bands(video_fingerprint64(frames), n_bands)

    return _attach(df, blob_col, id_col, one)


def audio_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    max_bucket: int = 64,
    observation=None,
    n_bands: int = 8,
    external: dict | None = None,
) -> DataFrame:
    """Perceptual near-duplicate audio pairs through the shared
    banded-Hamming tail; 8x8-bit bands guarantee recall to hamming 7
    and probabilistically beyond (see phash.split_bands). ``external``
    routes DSP formats (MP3/OGG/AAC) through user decoders
    (audio.decode_audio_bytes) so real speech corpora run the full
    cascade instead of dead-ending at the format raise."""
    return banded_hamming_pairs(
        attach_audio_fingerprint(
            df, blob_col, id_col, n_bands=n_bands, external=external
        ),
        max_hamming, id_col=id_col,
        max_bucket=max_bucket, observation=observation,
    )


def video_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    max_bucket: int = 64,
    observation=None,
    n_bands: int = 8,
    external: dict | None = None,
) -> DataFrame:
    """Perceptual near-duplicate video pairs through the shared
    banded-Hamming tail (banding trade: phash.split_bands).
    ``external`` routes MP4/WebM through user decoders
    (video.decode_video_bytes)."""
    return banded_hamming_pairs(
        attach_video_fingerprint(
            df, blob_col, id_col, n_bands=n_bands, external=external
        ),
        max_hamming, id_col=id_col,
        max_bucket=max_bucket, observation=observation,
    )
