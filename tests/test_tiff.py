"""TIFF codec (multimodal/tiff.py): LZW-with-early-change and
PackBits round-trips, predictor, multi-strip, byte orders, palette /
MinIsWhite decode, explicit raises, dispatch. Spark-free."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from snapflow_spark.multimodal.tiff import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=800))
def test_tiff_lzw_roundtrip(data):
    assert _lzw_decode_tiff(_lzw_encode_tiff(data)) == data


def test_tiff_lzw_width_boundaries_and_reset():
    # long low-entropy + high-entropy streams cross the 511/1023/2047
    # early-change boundaries and force an in-stream CLEAR reset
    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 256, size=40_000, dtype=np.uint8).tobytes()
    assert _lzw_decode_tiff(_lzw_encode_tiff(noisy)) == noisy
    runs = bytes(np.repeat(np.arange(256, dtype=np.uint8), 64))
    assert _lzw_decode_tiff(_lzw_encode_tiff(runs)) == runs


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=500))
def test_packbits_roundtrip(data):
    assert _packbits_decode(_packbits_encode(data), len(data)) == data


def _img(h, w, ch, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, 3)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def test_roundtrips_all_compressions_gray_rgb():
    for ch in (1, 3):
        src = _img(13, 9, ch, seed=ch)
        for comp in ("none", "lzw", "packbits"):
            out = decode_tiff(encode_tiff(src, compression=comp))
            assert np.array_equal(out, src), (ch, comp)


def test_lzw_predictor_roundtrip():
    for ch in (1, 3):
        # smooth gradient: the case predictor actually compresses
        base = np.arange(16 * 12, dtype=np.uint8).reshape(16, 12)
        src = base if ch == 1 else np.stack([base, base + 3, base + 7], axis=-1)
        blob = encode_tiff(src, compression="lzw", predictor=True)
        assert np.array_equal(decode_tiff(blob), src)


def test_multi_strip_roundtrip():
    src = _img(21, 6, 3, seed=4)
    for comp in ("none", "lzw", "packbits"):
        blob = encode_tiff(src, compression=comp, rows_per_strip=4)
        assert np.array_equal(decode_tiff(blob), src)


def test_big_endian_and_min_is_white():
    # hand-build a tiny big-endian MinIsWhite gray TIFF
    pix = bytes([0, 100, 200, 255])

    def entry(tag, typ, count, value4):
        return struct.pack(">HHI", tag, typ, count) + value4

    entries = [
        entry(256, 4, 1, struct.pack(">I", 2)),
        entry(257, 4, 1, struct.pack(">I", 2)),
        entry(258, 3, 1, struct.pack(">HH", 8, 0)),
        entry(259, 3, 1, struct.pack(">HH", 1, 0)),
        entry(262, 3, 1, struct.pack(">HH", 0, 0)),  # MinIsWhite
        entry(273, 4, 1, struct.pack(">I", 8)),
        entry(277, 3, 1, struct.pack(">HH", 1, 0)),
        entry(279, 4, 1, struct.pack(">I", 4)),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + b"\x00" * 4
    blob = b"MM\x00*" + struct.pack(">I", 12) + pix + ifd
    out = decode_tiff(blob)
    assert out.tolist() == [[255, 155], [55, 0]]


def test_palette_decode():
    # little-endian palette TIFF: 4 colors, 16-bit colormap
    idx = bytes([0, 1, 2, 3])
    cmap = struct.pack(
        "<" + "H" * 12,
        *[0, 257 * 10, 257 * 20, 257 * 255],  # R plane
        *[257 * 1, 257 * 11, 257 * 21, 0],  # G plane
        *[257 * 2, 257 * 12, 257 * 22, 257 * 128],  # B plane
    )

    def entry(tag, typ, count, value4):
        return struct.pack("<HHI", tag, typ, count) + value4

    cmap_off = 12 + len(idx)
    ifd_off = cmap_off + len(cmap)
    entries = [
        entry(256, 4, 1, struct.pack("<I", 2)),
        entry(257, 4, 1, struct.pack("<I", 2)),
        entry(258, 3, 1, struct.pack("<HH", 8, 0)),
        entry(259, 3, 1, struct.pack("<HH", 1, 0)),
        entry(262, 3, 1, struct.pack("<HH", 3, 0)),
        entry(273, 4, 1, struct.pack("<I", 12)),
        entry(277, 3, 1, struct.pack("<HH", 1, 0)),
        entry(279, 4, 1, struct.pack("<I", 4)),
        entry(320, 3, 12, struct.pack("<I", cmap_off)),
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + b"\x00" * 4
    blob = b"II*\x00" + struct.pack("<I", ifd_off) + b"\x00" * 4 + idx + cmap + ifd
    # strip offset 12 points at the 4 index bytes after the 8-byte
    # header + 4 pad bytes
    out = decode_tiff(blob)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [0, 1, 2]
    assert out[1, 1].tolist() == [255, 0, 128]


def test_tiled_roundtrip_all_compressions():
    """Tiles are strips with a 2-D layout: edge tiles pad to full
    (tl, tw) and the decoder clips them back — dimensions chosen NOT
    multiples of the tile size to exercise both edges."""
    for ch in (1, 3):
        src = _img(37, 23, ch, seed=5 + ch)
        for comp in ("none", "lzw", "packbits"):
            blob = encode_tiff(src, compression=comp, tile=(16, 16))
            assert np.array_equal(decode_tiff(blob), src), (ch, comp)
    # predictor over tiles, gradient content
    base = (np.arange(40 * 20, dtype=np.uint8) % 251).reshape(40, 20)
    blob = encode_tiff(base, compression="lzw", predictor=True, tile=(16, 32))
    assert np.array_equal(decode_tiff(blob), base)


def test_16bit_roundtrip_strips_and_tiles():
    """16-bit samples decode via high-byte downscale (the PNG
    convention): (v16 >> 8) survives every compression, layout, and
    the per-sample (not per-byte) predictor."""
    rng = np.random.default_rng(9)
    hi = rng.integers(0, 256, size=(21, 17), dtype=np.uint16)
    lo = rng.integers(0, 256, size=(21, 17), dtype=np.uint16)
    src16 = (hi << 8) | lo  # low bytes are noise the downscale drops
    for comp in ("none", "lzw", "packbits"):
        out = decode_tiff(encode_tiff(src16, compression=comp))
        assert out.dtype == np.uint8 and np.array_equal(out, hi.astype(np.uint8))
    # multi-strip + predictor (per-VALUE differencing mod 65536)
    blob = encode_tiff(src16, compression="lzw", predictor=True, rows_per_strip=5)
    assert np.array_equal(decode_tiff(blob), hi.astype(np.uint8))
    # tiled 16-bit RGB
    rgb16 = rng.integers(0, 1 << 16, size=(19, 33, 3), dtype=np.uint16)
    blob = encode_tiff(rgb16, compression="lzw", tile=(16, 16))
    assert np.array_equal(decode_tiff(blob), (rgb16 >> 8).astype(np.uint8))


def test_16bit_big_endian_foreign_layout():
    """Hand-built MM (big-endian) 16-bit gray: the sample dtype must
    follow the FILE byte order, not the host's."""
    vals = np.array([[0x1234, 0xFF00], [0x0080, 0xABCD]], dtype=np.uint16)
    pix = vals.astype(">u2").tobytes()

    def entry(tag, typ, count, value4):
        return struct.pack(">HHI", tag, typ, count) + value4

    entries = [
        entry(256, 4, 1, struct.pack(">I", 2)),
        entry(257, 4, 1, struct.pack(">I", 2)),
        entry(258, 3, 1, struct.pack(">HH", 16, 0)),
        entry(259, 3, 1, struct.pack(">HH", 1, 0)),
        entry(262, 3, 1, struct.pack(">HH", 1, 0)),
        entry(273, 4, 1, struct.pack(">I", 8)),
        entry(277, 3, 1, struct.pack(">HH", 1, 0)),
        entry(279, 4, 1, struct.pack(">I", 8)),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + b"\x00" * 4
    blob = b"MM\x00*" + struct.pack(">I", 8 + len(pix)) + pix + ifd
    assert decode_tiff(blob).tolist() == [[0x12, 0xFF], [0x00, 0xAB]]


def test_tile_geometry_validation():
    src = _img(20, 20, 1)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(src, tile=(10, 16))
    with pytest.raises(ValueError, match="mutually exclusive"):
        encode_tiff(src, tile=(16, 16), rows_per_strip=4)


def test_explicit_raises():
    src = _img(4, 4, 1)
    blob = bytearray(encode_tiff(src))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"PK\x03\x04")
    # flip compression tag to an unsupported value (JPEG-in-TIFF = 7)
    i = blob.find(struct.pack("<HHI", 259, 3, 1))
    blob[i + 8 : i + 10] = struct.pack("<H", 7)
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(bytes(blob))


def test_dispatch_and_both_byte_order_magics():
    from snapflow_spark.multimodal.codec import decode_image_bytes

    src = _img(6, 5, 3, seed=8)
    assert np.array_equal(decode_image_bytes(encode_tiff(src, "lzw")), src)


def test_truncated_tile_byte_counts_raises_clean_valueerror():
    """ADVICE r6: a malformed tiled TIFF whose TileByteCounts array is
    shorter than TileOffsets must hit the documented ValueError, not a
    bare IndexError at counts[idx]."""
    src = (np.arange(32 * 48, dtype=np.uint8).reshape(32, 48) % 251)
    blob = bytearray(encode_tiff(src, tile=(16, 16)))
    i = blob.find(struct.pack("<H", 325))  # TileByteCounts IFD entry
    tag, typ, cnt = struct.unpack_from("<HHI", blob, i)
    assert (tag, cnt) == (325, 6)
    struct.pack_into("<I", blob, i + 4, cnt - 2)  # shorten counts array
    with pytest.raises(ValueError, match="missing tiles"):
        decode_tiff(bytes(blob))


# ------------------------------------------------------------------ #
# round 8: palette encoder/16-bit indices + planar=2
# ------------------------------------------------------------------ #
def test_palette_roundtrip_8_and_16bit_indices():
    """Palette (photometric 3) round-trips through the encoder twin:
    8-bit indices AND the 16-bit-index form (indices stay raw — no
    high-byte downscale — so colormaps beyond 256 entries resolve);
    v*257 // 257 colormap scaling is exact."""
    rng = np.random.default_rng(7)
    pal8 = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    idx8 = rng.integers(0, 5, size=(9, 7), dtype=np.uint8)
    for comp in ("none", "lzw", "packbits"):
        out = decode_tiff(encode_tiff(idx8, compression=comp, palette=pal8))
        assert np.array_equal(out, pal8[idx8]), comp

    # >256 colors forces 16-bit indices — the case the old code
    # refused; index 300 must survive the (no-)downscale intact
    pal16 = rng.integers(0, 256, size=(400, 3), dtype=np.uint8)
    idx16 = rng.integers(0, 400, size=(6, 8), dtype=np.uint16)
    idx16[0, 0] = 300
    for comp in ("none", "lzw"):
        out = decode_tiff(encode_tiff(idx16, compression=comp, palette=pal16))
        assert np.array_equal(out, pal16[idx16]), comp
    # multi-strip + predictor on 16-bit indices
    blob = encode_tiff(
        idx16, compression="lzw", predictor=True, rows_per_strip=2,
        palette=pal16,
    )
    assert np.array_equal(decode_tiff(blob), pal16[idx16])


def test_palette_validation():
    pal = np.zeros((4, 3), np.uint8)
    with pytest.raises(ValueError, match="2-D indices"):
        encode_tiff(_img(4, 4, 3), palette=pal)
    with pytest.raises(ValueError, match="outside colormap"):
        encode_tiff(np.full((2, 2), 9, np.uint8), palette=pal)
    # decoder: an index past the colormap is loud, not a wrap
    blob = bytearray(encode_tiff(np.full((2, 2), 3, np.uint8), palette=pal))
    i = blob.find(struct.pack("<HHI", 320, 3, 12 * 64))  # ColorMap entry
    assert i > 0
    blob[i + 2 : i + 8] = struct.pack("<HI", 3, 6)  # shrink count to 2 colors
    with pytest.raises(ValueError, match="outside colormap"):
        decode_tiff(bytes(blob))


def test_planar2_roundtrip_strips_tiles_depths():
    """PlanarConfiguration=2 (plane-major separate planes): strips,
    multi-strip, tiles, all compressions, predictor, 8- and 16-bit —
    every combination decodes identically to its chunky twin."""
    src = _img(21, 13, 3, seed=11)
    for comp in ("none", "lzw", "packbits"):
        for kw in ({}, {"rows_per_strip": 4}, {"tile": (16, 16)}):
            blob = encode_tiff(src, compression=comp, planar=2, **kw)
            assert np.array_equal(decode_tiff(blob), src), (comp, kw)
    # predictor differs per-plane under planar=2
    grad = np.arange(16 * 12, dtype=np.uint8).reshape(16, 12)
    smooth = np.stack([grad, grad + 3, grad + 7], axis=-1)
    blob = encode_tiff(smooth, compression="lzw", predictor=True, planar=2)
    assert np.array_equal(decode_tiff(blob), smooth)
    # 16-bit planar=2: high-byte downscale after plane assembly
    deep = (src.astype(np.uint16) << 8) | 0x5A
    blob = encode_tiff(deep, compression="lzw", planar=2, rows_per_strip=8)
    assert np.array_equal(decode_tiff(blob), src)
    # chunky and planar files of the same pixels decode identically
    assert np.array_equal(
        decode_tiff(encode_tiff(src, planar=2)),
        decode_tiff(encode_tiff(src)),
    )


def test_planar2_big_endian_foreign_layout():
    """Hand-built MM (big-endian) planar=2 RGB, one strip per plane:
    plane-major strip order and the file byte order must both be
    honored."""
    r = np.array([[1, 2], [3, 4]], np.uint8)
    g = r + 10
    b = r + 20

    def entry(tag, typ, count, value4):
        return struct.pack(">HHI", tag, typ, count) + value4

    pix = r.tobytes() + g.tobytes() + b.tobytes()  # plane-major
    # value arrays for 3 strips must live out-of-line
    offs_off = 8 + len(pix)
    counts_off = offs_off + 12
    bps_off = counts_off + 12
    ifd_off = bps_off + 6
    entries = [
        entry(256, 4, 1, struct.pack(">I", 2)),
        entry(257, 4, 1, struct.pack(">I", 2)),
        entry(258, 3, 3, struct.pack(">I", bps_off)),
        entry(259, 3, 1, struct.pack(">HH", 1, 0)),
        entry(262, 3, 1, struct.pack(">HH", 2, 0)),
        entry(273, 4, 3, struct.pack(">I", offs_off)),
        entry(277, 3, 1, struct.pack(">HH", 3, 0)),
        entry(278, 4, 1, struct.pack(">I", 2)),
        entry(279, 4, 3, struct.pack(">I", counts_off)),
        entry(284, 3, 1, struct.pack(">HH", 2, 0)),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + b"\x00" * 4
    blob = (
        b"MM\x00*" + struct.pack(">I", ifd_off) + pix[: len(pix)]
        + struct.pack(">III", 8, 12, 16)        # per-plane strip offsets
        + struct.pack(">III", 4, 4, 4)          # byte counts
        + struct.pack(">HHH", 8, 8, 8)          # bits per sample
        + ifd
    )
    out = decode_tiff(blob)
    assert np.array_equal(out, np.stack([r, g, b], axis=-1))


def test_planar_validation():
    with pytest.raises(ValueError, match="planar"):
        encode_tiff(_img(4, 4, 3), planar=3)
    # gray planar=2 degenerates to chunky (one plane) and round-trips
    g = _img(5, 5, 1)
    assert np.array_equal(decode_tiff(encode_tiff(g, planar=2)), g)
    # decoder rejects planar values outside the spec
    blob = bytearray(encode_tiff(_img(4, 4, 3), planar=2))
    i = blob.find(struct.pack("<HHI", 284, 3, 1))
    blob[i + 8 : i + 10] = struct.pack("<H", 5)
    with pytest.raises(ValueError, match="planar configuration 5"):
        decode_tiff(bytes(blob))
