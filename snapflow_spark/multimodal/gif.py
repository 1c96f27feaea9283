"""From-scratch GIF87a/89a codec (pure numpy + stdlib struct): LZW
decompression with variable code widths, global AND local color
tables, interlaced row ordering, transparency, and multi-frame
animations with frame disposal — plus an encoder (exact palette up to
256 colors, else documented 3-3-2 quantization; optional interlace;
Netscape loop block) so every decode path is round-trip-exercised.

Spec: GIF89a specification (CompuServe, 1990; public) and the
GIF-variant LZW of Welch 1984: LSB-first bit packing, initial code
width = min_code_size + 1, CLEAR = 1<<mcs, EOI = CLEAR+1, dictionary
capped at 4096 entries (width never exceeds 12 bits; a full table
holds width at 12 until a CLEAR — "deferred clear" streams decode
correctly).

Role in the multimodal pipeline: a single-frame GIF decodes through
`codec.decode_image_bytes`; an animated GIF is a real compressed
VIDEO container for the frame-sampling pipeline, dispatched by
`video.decode_video_bytes` alongside Y4M and MJPEG-AVI (frame delay
round-trips as fps via the Graphic Control Extension's centisecond
delay)."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "decode_gif_frames", "encode_gif"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ------------------------------------------------------------------ #
# LZW (GIF variant)
# ------------------------------------------------------------------ #
def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # table as list of byte strings; indices < clear are literals
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:  # table freezes at 12 bits
                    table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"LZW code {code} out of range")
            out += entry
            prev = entry
            # widen when the NEXT code could address the new entry;
            # at 4096 the width freezes until a CLEAR (deferred clear)
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes((b,))
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            # the decoder widens after APPENDING the entry for this
            # code, so the encoder widens as soon as next_code fills
            # the current width
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes((b,))
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _interlace_order(h: int) -> list[int]:
    return [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    order = _interlace_order(rows.shape[0])
    out = np.empty_like(rows)
    out[np.asarray(order, dtype=np.int64)] = rows
    return out


# ------------------------------------------------------------------ #
# decode
# ------------------------------------------------------------------ #
def decode_gif_frames(
    data: bytes,
) -> tuple[np.ndarray, int]:
    """Full GIF parse -> ((T, H, W, 3) uint8 composited frames, fps).

    Composition follows the 89a animation model: each image is drawn
    into its (x, y, w, h) region of the logical screen, honoring the
    transparency index; disposal 2 restores the region to the
    background color after the frame is emitted, disposal 0/1 leave
    the canvas (disposal 3 "restore previous" is rare and raises).
    fps derives from the first nonzero GCE delay (centiseconds);
    delay 0 (or none) defaults to 10 fps, like every browser."""
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None:
        canvas[:] = gct[bg_idx % len(gct)]
    frames: list[np.ndarray] = []
    delay_cs = 0
    transparent: int | None = None
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                size = data[pos]
                flags, d, tidx = struct.unpack_from("<BHB", data, pos + 1)
                pos += 1 + size + 1  # size byte + payload + terminator
                disposal = (flags >> 2) & 0x07
                transparent = tidx if flags & 0x01 else None
                if d and not delay_cs:
                    delay_cs = d
            else:  # skip any other extension's sub-blocks
                while True:
                    size = data[pos]
                    pos += 1 + size
                    if size == 0:
                        break
        elif block == 0x2C:  # image descriptor
            ix, iy, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF image with no color table")
            mcs = data[pos]
            pos += 1
            comp = bytearray()
            while True:
                size = data[pos]
                pos += 1
                if size == 0:
                    break
                comp += data[pos : pos + size]
                pos += size
            idx = np.frombuffer(
                _lzw_decode(bytes(comp), mcs), np.uint8
            )[: iw * ih].reshape(ih, iw)
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            region = canvas[iy : iy + ih, ix : ix + iw]
            rgb = table[np.minimum(idx, len(table) - 1)]
            if transparent is not None:
                mask = (idx != transparent)[..., None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            if disposal == 2:
                # background color is defined against the GLOBAL
                # table (the bg index is a logical-screen property);
                # using a frame's local table here paints the wrong
                # color into every later frame
                region[:] = gct[bg_idx % len(gct)] if gct is not None else 0
            elif disposal == 3:
                raise NotImplementedError(
                    "GIF disposal 3 (restore previous) not supported"
                )
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")

    if not frames:
        raise ValueError("GIF contains no image data")
    fps = round(100 / delay_cs) if delay_cs else 10
    return np.stack(frames), max(fps, 1)


def decode_gif(data: bytes) -> np.ndarray:
    """Single-image entry point for decode_image_bytes: the first
    composited frame as (H, W, 3) uint8."""
    frames, _ = decode_gif_frames(data)
    return frames[0]


# ------------------------------------------------------------------ #
# encode
# ------------------------------------------------------------------ #
def _palette(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (N,3), indices (T,H,W)). Exact palette when the
    frames hold <= 256 distinct colors (lossless round-trip — the
    test contract); otherwise 3-3-2 bit quantization (documented
    lossy, like every 256-color GIF of a true-color source)."""
    t, h, w, _ = frames.shape
    flat = frames.reshape(-1, 3)
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        return colors, inv.astype(np.uint8).reshape(t, h, w)
    q = (flat[:, 0] & 0xE0) | ((flat[:, 1] & 0xE0) >> 3) | (flat[:, 2] >> 6)
    pal = np.zeros((256, 3), np.uint8)
    codes = np.arange(256, dtype=np.uint8)
    pal[:, 0] = codes & 0xE0
    pal[:, 1] = (codes & 0x1C) << 3
    pal[:, 2] = (codes & 0x03) << 6
    return pal, q.astype(np.uint8).reshape(t, h, w)


def encode_gif(
    frames: np.ndarray,
    fps: int = 10,
    loop: int = 0,
    interlace: bool = False,
) -> bytes:
    """(T, H, W, 3) or (H, W, 3) uint8 -> GIF89a bytes. Multi-frame
    input becomes an animation (GCE delay = round(100/fps) cs +
    Netscape loop block); <=256 distinct colors round-trip
    losslessly."""
    a = np.asarray(frames, np.uint8)
    if a.ndim == 3:
        a = a[None]
    t, h, w, _ = a.shape
    pal, idx = _palette(a)
    # color table size: power of two >= len(pal), >= 2
    bits = max(1, (max(len(pal), 2) - 1).bit_length())
    n = 1 << bits
    table = np.zeros((n, 3), np.uint8)
    table[: len(pal)] = pal
    mcs = max(bits, 2)  # LZW min code size must be >= 2

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += table.tobytes()
    if t > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    delay = max(1, round(100 / max(fps, 1)))
    order = np.asarray(_interlace_order(h), dtype=np.int64)
    for f in range(t):
        if t > 1:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00"
        ipacked = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
        rows = idx[f][order] if interlace else idx[f]
        comp = _lzw_encode(rows.tobytes(), mcs)
        out.append(mcs)
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
