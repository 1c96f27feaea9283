"""Round-5 continuation codec robustness: IEEE-float + extensible
WAV, 16-bit PNG, RLE8 BMP. Spark-free."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from snapflow_spark.multimodal.audio import (
    decode_wav,
    encode_wav_float,
    synthesize_audio,
)
from snapflow_spark.multimodal.codec import _png_chunk, decode_bmp, decode_png


# ------------------------------------------------------------------ #
# float WAV + WAVE_FORMAT_EXTENSIBLE
# ------------------------------------------------------------------ #
def test_float_wav_roundtrip_32_and_64():
    for ch in (1, 2):
        pcm = synthesize_audio(b"fw", n_samples=211, channels=ch)
        for bits in (32, 64):
            out, rate = decode_wav(encode_wav_float(pcm, 22050, bits=bits))
            assert rate == 22050 and out.shape == pcm.shape
            # scale to [-1,1] and back: off by at most 1 lsb (f32)
            err = np.abs(out.astype(np.int32) - pcm.astype(np.int32))
            assert int(err.max()) <= (1 if bits == 32 else 0)


def test_float_wav_clips_out_of_range():
    # raw float payload with samples beyond ±1 must clip, not wrap
    vals = np.array([2.0, -3.0, 0.5], dtype=np.float32)
    fmt = struct.pack("<HHIIHHH", 3, 1, 8000, 32000, 4, 32, 0)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 12) + vals.tobytes()
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    out, _ = decode_wav(blob)
    assert out[:, 0].tolist() == [32767, -32768, 16384]


def test_wave_format_extensible_resolves_subformat():
    pcm = synthesize_audio(b"ext", n_samples=64, channels=2)
    # hand-build an EXTENSIBLE wrapper around plain PCM16
    guid_tail = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 2, 16000, 64000, 4, 16, 22, 16, 0x3
    ) + struct.pack("<H", 1) + guid_tail
    data = pcm.reshape(-1).tobytes()
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = decode_wav(blob)
    assert rate == 16000
    assert np.array_equal(out, pcm)


# ------------------------------------------------------------------ #
# 16-bit PNG
# ------------------------------------------------------------------ #
def _png16(arr16: np.ndarray, color_type: int) -> bytes:
    h, w = arr16.shape[:2]
    ch = 1 if arr16.ndim == 2 else arr16.shape[2]
    ihdr = struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, 0)
    raw = bytearray()
    be = arr16.astype(">u2").reshape(h, w * ch)
    for r in range(h):
        raw += b"\x00" + be[r].tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_16bit_gray_and_rgb_decode():
    rng = np.random.default_rng(3)
    g16 = rng.integers(0, 65536, size=(9, 7), dtype=np.uint16)
    out = decode_png(_png16(g16, 0))
    assert out.shape == (9, 7) and out.dtype == np.uint8
    assert np.array_equal(out, (g16 >> 8).astype(np.uint8))

    c16 = rng.integers(0, 65536, size=(5, 6, 3), dtype=np.uint16)
    out = decode_png(_png16(c16, 2))
    assert out.shape == (5, 6, 3)
    assert np.array_equal(out, (c16 >> 8).astype(np.uint8))


def test_png_16bit_rgba_drops_alpha():
    rng = np.random.default_rng(4)
    a16 = rng.integers(0, 65536, size=(4, 4, 4), dtype=np.uint16)
    out = decode_png(_png16(a16, 6))
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out, (a16[:, :, :3] >> 8).astype(np.uint8))


def test_png_16bit_palette_still_raises():
    with pytest.raises(ValueError, match="16-bit non-palette"):
        decode_png(
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0))
            + _png_chunk(b"IEND", b"")
        )


# ------------------------------------------------------------------ #
# RLE8 BMP
# ------------------------------------------------------------------ #
def _rle8_bmp(w, h, pal, stream: bytes) -> bytes:
    pal_bytes = b"".join(bytes((b, g, r, 0)) for r, g, b in pal)
    offset = 14 + 40 + len(pal_bytes)
    hdr = (
        b"BM"
        + (offset + len(stream)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + (1).to_bytes(4, "little")  # BI_RLE8
        + len(stream).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 2
        + len(pal).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    return hdr + pal_bytes + stream


def test_bmp_rle8_runs_absolute_delta_eol():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    # 6x3 bottom-up: row0(file) = bottom row
    stream = bytes(
        [
            4, 1,        # run: 4x green
            0, 3, 2, 0, 2, 0,  # absolute: [2, 0] + pad
            0, 0,        # EOL
            0, 2, 2, 0,  # delta: skip right to x=2 (same row 1)
            3, 2,        # 3x blue at (1, 2..4)
            0, 0,        # EOL
            6, 3,        # full row of color 3 (top row in image)
            0, 1,        # EOB
        ]
    )
    out = decode_bmp(_rle8_bmp(6, 3, pal, stream))
    assert out.shape == (3, 6, 3)
    # image top row = file row 2
    assert out[0].tolist() == [[9, 9, 9]] * 6
    # file row 1: default fill (idx 0) except blue at 2..4
    assert out[1].tolist() == [
        [255, 0, 0], [255, 0, 0], [0, 0, 255], [0, 0, 255], [0, 0, 255], [255, 0, 0]
    ]
    # file row 0 (image bottom): 4 green, then absolute [blue, red]
    assert out[2].tolist() == [
        [0, 255, 0], [0, 255, 0], [0, 255, 0], [0, 255, 0], [0, 0, 255], [255, 0, 0]
    ]


def test_bmp_rle4_still_raises():
    blob = bytearray(_rle8_bmp(4, 2, [(0, 0, 0)], b"\x00\x01"))
    blob[28:30] = (4).to_bytes(2, "little")  # bpp 4
    blob[30:34] = (2).to_bytes(4, "little")  # BI_RLE4
    with pytest.raises(ValueError, match="RLE8"):
        decode_bmp(bytes(blob))


# ------------------------------------------------------------------ #
# Lossless JPEG (SOF3) — round 6
# ------------------------------------------------------------------ #
def _structured_img(seed: int, h: int = 24, w: int = 17, ch: int = 3):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 120 + 60 * np.sin(x / 3) + 40 * np.cos(y / 4) + rng.normal(0, 12, (h, w))
    g = np.clip(img, 0, 255).astype(np.uint8)
    if ch == 1:
        return g
    return np.stack([g, np.roll(g, 3, axis=1), 255 - g], axis=-1)


def test_lossless_jpeg_roundtrip_all_predictors():
    """SOF3 is LOSSLESS: every predictor 1-7 round-trips bit-exactly,
    gray and RGB (components stored verbatim, no color transform)."""
    from snapflow_spark.multimodal.jpeg import decode_jpeg, encode_jpeg_lossless

    for ch in (1, 3):
        src = _structured_img(ch, ch=ch)
        for pred in range(1, 8):
            blob = encode_jpeg_lossless(src, predictor=pred)
            out = decode_jpeg(blob)
            assert out.dtype == np.uint8 and out.shape == src.shape
            assert np.array_equal(out, src), (ch, pred)


def test_lossless_jpeg_16bit_and_point_transform():
    """16-bit precision (the DICOM shape) decodes via the engine's
    high-byte downscale; point transform drops Pt low bits and the
    decoder restores the << Pt scale."""
    from snapflow_spark.multimodal.jpeg import decode_jpeg, encode_jpeg_lossless

    rng = np.random.default_rng(11)
    hi = _structured_img(5, ch=1).astype(np.uint16)
    src16 = (hi << 8) | rng.integers(0, 256, hi.shape, dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_lossless(src16, predictor=2))
    assert np.array_equal(out, hi.astype(np.uint8))
    # point transform: lossy by exactly the dropped low bits
    src = _structured_img(6, ch=1)
    out = decode_jpeg(encode_jpeg_lossless(src, predictor=1, point_transform=2))
    assert np.array_equal(out, (src >> 2) << 2)


def test_lossless_jpeg_dispatch_and_scope_gates():
    """decode_image_bytes routes SOF3 by magic; wrong-decoder inputs
    and out-of-scope parameters fail loudly."""
    import pytest as _pytest

    from snapflow_spark.multimodal.codec import decode_image_bytes
    from snapflow_spark.multimodal.jpeg import encode_jpeg_lossless

    src = _structured_img(7)
    assert np.array_equal(decode_image_bytes(encode_jpeg_lossless(src)), src)
    with _pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(src, predictor=0)
    with _pytest.raises(ValueError, match="point_transform"):
        encode_jpeg_lossless(src, point_transform=8)
    # single-pixel edge: only the default prediction is exercised
    one = np.array([[137]], dtype=np.uint8)
    assert np.array_equal(decode_image_bytes(encode_jpeg_lossless(one)), one)


def test_jpeg_fill_bytes_and_profile_gates():
    """Round-6 review fixes: legal 0xFF fill bytes before markers
    parse (T.81 B.1.1.2); 12-bit DCT frames and 4-component frames
    raise with the profile named instead of garbage/crashes."""
    import struct as _struct

    from snapflow_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    src = _structured_img(3)
    blob = encode_jpeg(src, quality=90)
    # inject fill bytes: after SOI and before EOI
    padded = blob[:2] + b"\xff" + blob[2:-2] + b"\xff\xff" + blob[-2:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(blob))
    # 12-bit SOF0: precision byte patched in a copy of the frame header
    i = blob.find(b"\xff\xc0")
    twelve = bytearray(blob)
    twelve[i + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit DCT"):
        decode_jpeg(bytes(twelve))
    # 4-component (Adobe CMYK-shaped) stream: gray encode re-headered
    # to declare 4 components would be malformed; instead assert the
    # plane-count gate directly on the smallest well-formed shape —
    # a 2-component frame built by duplicating the gray channel's SOS
    # would still decode entropy fine and must hit the named raise,
    # which the unit below exercises through the public entry point.
    two = bytearray(encode_jpeg(src[:8, :8, 0]))  # gray: 1 component
    i = two.find(b"\xff\xc0")
    # declare a phantom second component reusing table/quant ids
    seglen = _struct.unpack_from(">H", two, i + 2)[0]
    frame = two[i + 4 : i + 2 + seglen]
    patched = bytearray(frame)
    patched[5] = 2  # nc = 2
    patched += bytes([2, 0x11, 0])
    two[i + 2 : i + 2 + seglen] = _struct.pack(">H", len(patched) + 2) + patched
    with pytest.raises(Exception) as ei:
        decode_jpeg(bytes(two))
    # either the missing-scan check or the component gate names it —
    # never a bare unpack crash
    assert "missing scans" in str(ei.value) or "component JPEG" in str(ei.value)


def test_tiff_predictor_without_lzw_and_even_offsets():
    """Predictor=2 un-differences regardless of compression, and every
    emitted offset (IFD, value arrays, segments) is word-aligned."""
    import struct as _struct

    from snapflow_spark.multimodal.tiff import decode_tiff, encode_tiff

    # hand-build: uncompressed gray 1x4 with predictor 2 - samples are
    # deltas [10, +5, -3, +1] -> pixels [10, 15, 12, 13]
    pix = bytes([10, 5, 253, 1])

    def entry(tag, typ, count, value4):
        return _struct.pack("<HHI", tag, typ, count) + value4

    entries = [
        entry(256, 4, 1, _struct.pack("<I", 4)),
        entry(257, 4, 1, _struct.pack("<I", 1)),
        entry(258, 3, 1, _struct.pack("<HH", 8, 0)),
        entry(259, 3, 1, _struct.pack("<HH", 1, 0)),  # uncompressed
        entry(262, 3, 1, _struct.pack("<HH", 1, 0)),
        entry(273, 4, 1, _struct.pack("<I", 8)),
        entry(277, 3, 1, _struct.pack("<HH", 1, 0)),
        entry(279, 4, 1, _struct.pack("<I", 4)),
        entry(317, 3, 1, _struct.pack("<HH", 2, 0)),  # predictor 2
    ]
    ifd = _struct.pack("<H", len(entries)) + b"".join(entries) + b"\x00" * 4
    blob = b"II*\x00" + _struct.pack("<I", 12) + pix + ifd
    assert decode_tiff(blob).tolist() == [[10, 15, 12, 13]]

    # word alignment: odd-length compressed segments must not shift
    # the IFD or value arrays onto odd offsets
    rng = np.random.default_rng(4)
    for _ in range(6):
        h, w = int(rng.integers(3, 40)), int(rng.integers(3, 40))
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        for comp in ("none", "lzw", "packbits"):
            b = encode_tiff(img, compression=comp, rows_per_strip=5)
            (ifd_off,) = _struct.unpack_from("<I", b, 4)
            assert ifd_off % 2 == 0, (h, w, comp)
            assert np.array_equal(decode_tiff(b), img)
