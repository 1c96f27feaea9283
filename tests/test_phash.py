"""Perceptual image hashing (multimodal/phash.py): hash invariance
across lossless re-encodes, robustness to JPEG compression and
resampling, discrimination of unrelated images, and the Spark
near-dup pair pipeline with planted cross-format duplicates."""

from __future__ import annotations

import numpy as np
import pytest

from snapflow_spark.multimodal.codec import (
    encode_bmp,
    encode_png,
    encode_ppm,
    resize_nearest,
)
from snapflow_spark.multimodal.phash import (
    phash64,
    phash_bands,
    image_near_dup_pairs,
)


def _structured(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    """Smooth, structured test image (noise pHashes are meaningless):
    a sum of low-frequency plane waves with seeded INTEGER frequency
    pairs and phases, so different seeds produce genuinely different
    low-frequency sign structure (a shared functional family would
    make 'unrelated' images collide in the 8x8 DCT block)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.full((h, w), 100.0)
    for _ in range(4):
        fx, fy = rng.integers(0, 5, 2)
        amp = rng.uniform(25, 60)
        phase = rng.uniform(0, 2 * np.pi)
        img += amp * np.sin(2 * np.pi * (fx * x / w + fy * y / h) + phase)
    img = np.clip(img, 0, 255).astype(np.uint8)
    return np.stack([img, np.roll(img, 3, axis=1), 255 - img], axis=-1)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_phash_invariant_across_lossless_formats():
    from snapflow_spark.multimodal.codec import decode_image_bytes

    src = _structured(1)
    hashes = {
        phash64(decode_image_bytes(enc(src)))
        for enc in (encode_ppm, encode_bmp, encode_png)
    }
    assert len(hashes) == 1 == len({phash64(src)} | hashes)


def test_phash_robust_to_jpeg_and_resize_but_discriminates():
    from snapflow_spark.multimodal.codec import decode_image_bytes
    from snapflow_spark.multimodal.jpeg import encode_jpeg

    base = _structured(2)
    h0 = phash64(base)
    # JPEG q85: perceptually identical -> tiny hamming
    hj = phash64(decode_image_bytes(encode_jpeg(base, quality=85)))
    assert _ham(h0, hj) <= 6
    # downscaled copy: same structure -> tiny hamming
    hr = phash64(resize_nearest(base, 48, 48))
    assert _ham(h0, hr) <= 6
    # different structured images: far apart (64-bit hashes of
    # unrelated content concentrate around hamming 32)
    others = [phash64(_structured(s)) for s in (3, 4, 5, 6)]
    for other in others:
        assert _ham(h0, other) >= 16


def test_phash_bands_pack_the_hash():
    src = _structured(7)
    h = phash64(src)
    bands = phash_bands(src)
    assert len(bands) == 4 and all(0 <= b <= 0xFFFF for b in bands)
    assert ((bands[0] << 48) | (bands[1] << 32) | (bands[2] << 16) | bands[3]) == h
    b8 = phash_bands(src, n_bands=8)
    assert len(b8) == 8 and all(0 <= b <= 0xFF for b in b8)
    acc = 0
    for b in b8:
        acc = (acc << 8) | b
    assert acc == h


def test_phash_wide_bands_signed64_and_attach(spark):
    """n_bands 1-2 (the documented large-corpus 'fewer, wider bands'
    knob) must survive the Arrow int64 boundary: band values wider
    than 32 bits go through as bigint, and the full-hash n_bands=1
    case wraps into signed-64 space instead of overflowing."""
    from snapflow_spark.multimodal.phash import attach_phash, split_bands

    # a hash with the top bit set exercises the two's-complement wrap
    h = 0xF123_4567_89AB_CDEF
    (b1,) = split_bands(h, n_bands=1)
    assert b1 == h - (1 << 64) and -(1 << 63) <= b1 < (1 << 63)
    b2 = split_bands(h, n_bands=2)
    assert b2 == [0xF1234567, 0x89ABCDEF]  # 32-bit bands: unwrapped
    # attach end-to-end at each width; identical images share all bands
    img = _structured(9)
    rows = [(0, bytearray(encode_png(img))), (1, bytearray(encode_ppm(img)))]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    for nb in (1, 2, 4):
        got = {r.doc_id: r.bvals for r in attach_phash(df, n_bands=nb).collect()}
        assert len(got[0]) == nb and got[0] == got[1]


def test_image_near_dup_pairs_spark(spark):
    """Planted perceptual dups across FORMATS and a compressed copy
    are recovered; unrelated images are not paired."""
    from snapflow_spark.multimodal.jpeg import encode_jpeg

    img_a = _structured(10)
    img_b = _structured(11)
    img_c = _structured(12)
    rows = [
        (0, bytearray(encode_ppm(img_a))),
        (1, bytearray(encode_png(img_a))),      # lossless dup of 0
        (2, bytearray(encode_jpeg(img_a, quality=85))),  # compressed dup of 0
        (3, bytearray(encode_bmp(img_b))),
        (4, bytearray(encode_png(img_c))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(df, max_hamming=6).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 0
    assert (0, 2) in pairs and (1, 2) in pairs
    # unrelated images never pair
    for bad in ((0, 3), (0, 4), (3, 4), (1, 3), (2, 4)):
        assert bad not in pairs


def test_image_near_dup_recovers_text_dups_in_blob_rotation(spark):
    """Composition across modalities: attach_image_blob synthesizes
    pixels FROM TEXT and encodes round-robin by id (7 formats), so
    documents with identical text produce identical pixels in
    DIFFERENT formats — exactly what byte dedup misses and
    perceptual dedup must recover. The pHash pairs over the rotation
    corpus equal the text-duplicate pairs."""
    import itertools

    from snapflow_spark.multimodal import attach_image_blob

    texts = {
        0: "alpha beta gamma", 1: "delta epsilon zeta", 2: "alpha beta gamma",
        3: "eta theta iota", 4: "delta epsilon zeta", 5: "kappa lambda mu",
        9: "alpha beta gamma",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )
    blobs = attach_image_blob(df, width=16, height=16)
    got = {
        (r.id_a, r.id_b)
        for r in image_near_dup_pairs(blobs, max_hamming=4).collect()
    }
    by_text = {}
    for i, t in texts.items():
        by_text.setdefault(t, []).append(i)
    expected = {
        tuple(sorted(p))
        for ids in by_text.values()
        for p in itertools.combinations(ids, 2)
    }
    assert expected <= got  # every text-dup found across formats
    # and nothing outside the planted groups
    assert got == expected
