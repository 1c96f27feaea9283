"""Audio/video perceptual fingerprints (multimodal/fingerprints.py):
robustness to re-encode/gain/container changes, discrimination of
different material, and the Spark near-dup pipelines with planted
cross-codec duplicates."""

from __future__ import annotations

import numpy as np
import pytest

from snapflow_spark.multimodal.audio import encode_wav, encode_wav_g711
from snapflow_spark.multimodal.fingerprints import (
    audio_fingerprint64,
    audio_near_dup_pairs,
    video_fingerprint64,
    video_near_dup_pairs,
)

RATE = 16000


def _tone(seed: int, n: int = 8000) -> np.ndarray:
    """Structured audio (noise fingerprints are meaningless): a sum
    of seeded sinusoids with mild AM — different seeds get different
    spectral envelopes."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / RATE
    x = np.zeros(n)
    for _ in range(4):
        f = rng.uniform(300, 3500)
        amp = rng.uniform(2000, 6000)
        am = rng.uniform(1, 5)
        x += amp * np.sin(2 * np.pi * f * t) * (1 + 0.3 * np.sin(2 * np.pi * am * t))
    return np.clip(x, -32768, 32767).astype(np.int16)


def _clip(seed: int, t_frames: int = 6) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:32, 0:32].astype(np.float64)
    frames = []
    for ti in range(t_frames):
        img = np.full((32, 32), 90.0)
        for _ in range(3):
            fx, fy = rng.integers(0, 4, 2)
            img += rng.uniform(30, 60) * np.sin(
                2 * np.pi * (fx * x / 32 + fy * y / 32) + 0.1 * ti
            )
        g = np.clip(img, 0, 255).astype(np.uint8)
        frames.append(np.stack([g, g, 255 - g], axis=-1))
    return np.stack(frames)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_audio_fingerprint_gain_invariant_and_discriminates():
    x = _tone(1)
    h0 = audio_fingerprint64(x, RATE)
    # gain changes: mean-referenced log energies cancel scaling
    assert _ham(h0, audio_fingerprint64((x // 2).astype(np.int16), RATE)) <= 2
    assert _ham(h0, audio_fingerprint64((x // 8).astype(np.int16), RATE)) <= 2
    # G.711 mu-law re-encode (lossy telephony): still near
    from snapflow_spark.multimodal.g711 import mulaw_decode, mulaw_encode

    lossy = mulaw_decode(mulaw_encode(x)).astype(np.int16)
    assert _ham(h0, audio_fingerprint64(lossy, RATE)) <= 10
    # different material: far
    for s in (2, 3, 4):
        assert _ham(h0, audio_fingerprint64(_tone(s), RATE)) >= 12


def test_video_fingerprint_container_robust_and_discriminates():
    from snapflow_spark.multimodal.gif import encode_gif
    from snapflow_spark.multimodal.video import (
        decode_video_bytes,
        encode_avi_mjpeg,
        encode_y4m,
    )

    clip = _clip(1)
    h0 = video_fingerprint64(clip)
    for enc in (lambda c: encode_y4m(c, 10), lambda c: encode_gif(c, 10),
                lambda c: encode_avi_mjpeg(c, 10, quality=90)):
        dec, _fps = decode_video_bytes(enc(clip))
        assert _ham(h0, video_fingerprint64(dec)) <= 8, enc
    for s in (2, 3, 4):
        assert _ham(h0, video_fingerprint64(_clip(s))) >= 14


def test_audio_near_dup_pairs_spark(spark):
    from snapflow_spark.multimodal.flac import encode_flac

    a, b = _tone(10), _tone(11)
    rows = [
        (0, bytearray(encode_wav(a, RATE))),
        (1, bytearray(encode_flac(a, RATE))),          # lossless dup of 0
        (2, bytearray(encode_wav_g711(a, RATE))),      # telephony dup of 0
        (3, bytearray(encode_wav(b, RATE))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    pairs = {
        (r.id_a, r.id_b) for r in audio_near_dup_pairs(df, max_hamming=10).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_video_near_dup_pairs_spark(spark):
    from snapflow_spark.multimodal.gif import encode_gif
    from snapflow_spark.multimodal.video import encode_avi_mjpeg, encode_y4m

    c1, c2 = _clip(10), _clip(11)
    rows = [
        (0, bytearray(encode_y4m(c1, 10))),
        (1, bytearray(encode_gif(c1, 10))),            # palette re-encode
        (2, bytearray(encode_avi_mjpeg(c1, 10, quality=90))),  # MJPEG
        (3, bytearray(encode_y4m(c2, 10))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    pairs = {
        (r.id_a, r.id_b) for r in video_near_dup_pairs(df, max_hamming=8).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs
    assert not any(3 in p for p in pairs)
