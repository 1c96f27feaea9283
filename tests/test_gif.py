"""GIF codec (multimodal/gif.py): LZW round-trips (incl. table
overflow + width transitions), lossless <=256-color images,
interlace, animation fps/compositing, transparency, quantization
fallback, and dispatch through decode_image_bytes /
decode_video_bytes. Spark-free — pure codec tests."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from snapflow_spark.multimodal.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


# ------------------------------------------------------------------ #
# LZW
# ------------------------------------------------------------------ #
@settings(max_examples=60, deadline=None)
@given(
    st.binary(min_size=0, max_size=600),
    st.integers(min_value=2, max_value=8),
)
def test_lzw_roundtrip(data, mcs):
    # all byte values must be < 2**mcs (palette indices)
    idx = bytes(b % (1 << mcs) for b in data)
    assert bytes(_lzw_decode(_lzw_encode(idx, mcs), mcs)) == idx


def test_lzw_table_overflow_roundtrip():
    # force >4096 dictionary entries -> in-stream CLEAR + reset
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 4, size=60_000, dtype=np.uint8).tobytes()
    assert bytes(_lzw_decode(_lzw_encode(idx, 2), 2)) == idx


def test_lzw_kwkwk_case():
    # 'aaaa...' exercises the code == len(table) branch
    idx = b"\x00" * 50
    assert bytes(_lzw_decode(_lzw_encode(idx, 2), 2)) == idx


# ------------------------------------------------------------------ #
# still images
# ------------------------------------------------------------------ #
def _img(h, w, ncolors, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncolors, size=(h, w))]


def test_single_frame_lossless_roundtrip():
    for ncolors in (1, 2, 5, 250):
        src = _img(11, 7, ncolors, seed=ncolors)
        out = decode_gif(encode_gif(src))
        assert out.shape == src.shape
        assert np.array_equal(out, src)


def test_interlaced_roundtrip_matches_sequential():
    src = _img(17, 9, 40, seed=3)  # height crossing all 4 passes
    a = decode_gif(encode_gif(src, interlace=True))
    b = decode_gif(encode_gif(src))
    assert np.array_equal(a, src)
    assert np.array_equal(a, b)


def test_truecolor_quantizes_to_332():
    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    assert len(np.unique(src.reshape(-1, 3), axis=0)) > 256
    out = decode_gif(encode_gif(src))
    exp = np.zeros_like(src)
    exp[..., 0] = src[..., 0] & 0xE0
    exp[..., 1] = src[..., 1] & 0xE0
    exp[..., 2] = src[..., 2] & 0xC0
    assert np.array_equal(out, exp)


# ------------------------------------------------------------------ #
# animation
# ------------------------------------------------------------------ #
def test_animation_roundtrip_and_fps():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    frames = pal[rng.integers(0, 16, size=(6, 10, 8))]
    for fps in (5, 10, 25, 50):
        out, got_fps = decode_gif_frames(encode_gif(frames, fps=fps))
        assert got_fps == fps
        assert np.array_equal(out, frames)


def test_transparency_composites_over_previous_frame():
    # hand-built 2-frame GIF: frame 2 is fully transparent except one
    # pixel -> composited frame 2 == frame 1 with that pixel changed
    import struct

    pal = b"\x00\x00\x00\xff\x00\x00\x00\xff\x00\x00\x00\xff"  # k,r,g,b
    f1 = bytes([1] * 4)  # 2x2 all red
    f2 = bytes([0, 2, 0, 0])  # idx0 = transparent, one green pixel
    mcs = 2

    def img_block(indices, gce_flags, tidx):
        out = b"\x21\xf9\x04" + bytes([gce_flags]) + struct.pack("<H", 10)
        out += bytes([tidx]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        comp = _lzw_encode(indices, mcs)
        return out + bytes([mcs, len(comp)]) + comp + b"\x00"

    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80 | 0x01, 0, 0)  # 4-entry GCT
        + pal
        + img_block(f1, 0x00, 0)  # no transparency
        + img_block(f2, 0x01, 0)  # transparent idx 0
        + b"\x3b"
    )
    frames, fps = decode_gif_frames(gif)
    assert frames.shape == (2, 2, 2, 3)
    red = [255, 0, 0]
    green = [0, 255, 0]
    assert frames[0].tolist() == [[red, red], [red, red]]
    assert frames[1].tolist() == [[red, green], [red, red]]
    assert fps == 10


def test_disposal_restore_background():
    import struct

    pal = b"\x00\x00\x00\xff\xff\xff\x00\x00\xff\x00\x00\x00"
    mcs = 2

    def img_block(indices, disposal):
        out = b"\x21\xf9\x04" + bytes([disposal << 2]) + struct.pack("<H", 10)
        out += b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
        comp = _lzw_encode(indices, mcs)
        return out + bytes([mcs, len(comp)]) + comp + b"\x00"

    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 1, 0x80 | 0x01, 0, 0)
        + pal
        + img_block(bytes([1, 2]), 2)  # disposal 2: restore to bg (idx 0)
        + img_block(bytes([2, 2]), 0)
        + b"\x3b"
    )
    frames, _ = decode_gif_frames(gif)
    assert frames[0].tolist() == [[[255, 255, 255], [0, 0, 255]]]
    assert frames[1].tolist() == [[[0, 0, 255], [0, 0, 255]]]


def test_disposal_3_raises():
    import struct

    pal = b"\x00\x00\x00\xff\x00\x00\x00\xff\x00\x00\x00\xff"
    mcs = 2
    comp = _lzw_encode(bytes([1]), mcs)
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 1, 1, 0x80 | 0x01, 0, 0)
        + pal
        + b"\x21\xf9\x04" + bytes([3 << 2]) + struct.pack("<H", 10) + b"\x00\x00"
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
        + bytes([mcs, len(comp)]) + comp + b"\x00"
        + b"\x3b"
    )
    with pytest.raises(NotImplementedError, match="disposal 3"):
        decode_gif_frames(gif)


# ------------------------------------------------------------------ #
# dispatch
# ------------------------------------------------------------------ #
def test_image_dispatch():
    from snapflow_spark.multimodal.codec import decode_image_bytes

    src = _img(8, 8, 30, seed=9)
    assert np.array_equal(decode_image_bytes(encode_gif(src)), src)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE")


def test_video_dispatch_animated():
    from snapflow_spark.multimodal.video import decode_video_bytes

    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    frames = pal[rng.integers(0, 8, size=(4, 6, 6))]
    out, fps = decode_video_bytes(encode_gif(frames, fps=25))
    assert fps == 25
    assert np.array_equal(out, frames)


def test_disposal2_restores_global_background_with_local_table():
    """Regression: a frame with a LOCAL color table and disposal=2
    must restore its region to the GLOBAL background color, not the
    local table's color at the background index."""
    import struct

    gpal = b"\xff\xff\xff\x11\x22\x33\x00\x00\x00\x00\x00\x00"  # bg = white
    lpal = b"\xff\x00\x00\x00\x00\xff\x00\x00\x00\x00\x00\x00"  # red, blue
    mcs = 2

    def gce(disposal):
        return b"\x21\xf9\x04" + bytes([disposal << 2]) + struct.pack("<H", 10) + b"\x00\x00"

    c1 = _lzw_encode(bytes([1]), mcs)  # local idx 1 = blue
    f1 = (
        gce(2)  # disposal 2: restore to background after emitting
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0x80 | 0x01)  # local table
        + lpal
        + bytes([mcs, len(c1)]) + c1 + b"\x00"
    )
    c2 = _lzw_encode(bytes([1]), mcs)  # global idx 1 = 0x112233
    # frame 2 covers only... the same 1x1 region; composite shows it
    f2 = (
        gce(0)
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
        + bytes([mcs, len(c2)]) + c2 + b"\x00"
    )
    gif = (
        b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0x80 | 0x01, 0, 0) + gpal
        + f1 + f2 + b"\x3b"
    )
    frames, _ = decode_gif_frames(gif)
    # frame 1: blue pixel from the local table, white elsewhere
    assert frames[0].tolist() == [[[0, 0, 255], [255, 255, 255]]]
    # after disposal 2 the region is WHITE (global bg), then frame 2
    # draws global idx 1 over it; the untouched column stays white
    assert frames[1].tolist() == [[[0x11, 0x22, 0x33], [255, 255, 255]]]
