"""From-scratch baseline TIFF codec (TIFF 6.0 spec, Adobe 1992 —
public): both byte orders, IFD tag walking, strip assembly, and the
three compressions a scanner/archive corpus actually contains —
uncompressed (1), TIFF-LZW (5, the MSB-first variant WITH the spec's
"early change" code-width bump and optional horizontal-differencing
predictor) and PackBits (32773, the Macintosh RLE). Photometric
gray (0/1, MinIsWhite inverted), RGB (2) and palette (3, 16-bit
colormap scaled to 8). 8-bit samples, chunky planar config.

Encoder twin writes gray/RGB with any of the three compressions,
multi-strip, optional predictor — so every decode path round-trips
bit-exactly (TIFF is lossless). Tiled TIFFs, 16-bit samples and
planar=2 raise explicitly with the tag value named.

Note the LZW here is NOT the GIF one (multimodal/gif.py): GIF packs
codes LSB-first with the width bump a code later; TIFF packs
MSB-first and bumps early (§13 of the spec, the libtiff-compatible
form). Both are implemented from their specs."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_tiff", "encode_tiff"]

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


# ------------------------------------------------------------------ #
# TIFF-variant LZW (MSB-first, early change)
# ------------------------------------------------------------------ #
_CLEAR, _EOI = 256, 257


def _lzw_decode_tiff(data: bytes) -> bytes:
    base = [bytes((i,)) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == _CLEAR:
                table = list(base)
                width = 9
                prev = None
                continue
            if code == _EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"TIFF LZW code {code} out of range")
            out += entry
            prev = entry
            # EARLY CHANGE: widen one code before the table fills
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes((i,)): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    cur = b""
    for b in data:
        nxt = cur + bytes((b,))
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4094:  # leave room: spec resets before 12-bit fill
            table[nxt] = next_code
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            next_code += 1
        else:
            emit(_CLEAR, width)
            table = {bytes((i,)): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes((b,))
    if cur:
        emit(table[cur], width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------------ #
# PackBits
# ------------------------------------------------------------------ #
def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += data[i : i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes((257 - run, data[i]))
            i = j + 1
        else:
            # literal: until next >=3 run or 128 bytes
            k = i
            while k < n and k - i < 128:
                if (
                    k + 2 < n
                    and data[k] == data[k + 1] == data[k + 2]
                ):
                    break
                k += 1
            out += bytes((k - i - 1,)) + data[i:k]
            i = k
    return bytes(out)


# ------------------------------------------------------------------ #
# decode
# ------------------------------------------------------------------ #
def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> (H, W) gray or (H, W, 3) RGB uint8."""
    data = bytes(data)
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream")
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    (n_entries,) = struct.unpack_from(bo + "H", data, ifd_off)
    tags: dict[int, tuple[int, int, bytes]] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + e * 12
        tag, typ, count = struct.unpack_from(bo + "HHI", data, off)
        size = _TYPE_SIZE.get(typ, 1) * count
        if size <= 4:
            payload = data[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack_from(bo + "I", data, off + 8)
            payload = data[voff : voff + size]
        tags[tag] = (typ, count, payload)

    def vals(tag: int, default=None):
        if tag not in tags:
            return default
        typ, count, payload = tags[tag]
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            raise ValueError(f"unsupported TIFF tag type {typ} for tag {tag}")
        return list(struct.unpack(bo + fmt * count, payload))

    def val(tag: int, default=None):
        v = vals(tag)
        return v[0] if v else default

    w = val(256)
    h = val(257)
    if w is None or h is None:
        raise ValueError("TIFF missing width/height tags")
    bits = vals(258, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"only 8-bit TIFF samples supported (got {bits})")
    comp = val(259, 1)
    photo = val(262, 1)
    spp = val(277, 1)
    planar = val(284, 1)
    predictor = val(317, 1)
    if planar != 1:
        raise NotImplementedError(f"TIFF planar configuration {planar} unsupported")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF unsupported (strips only)")
    offsets = vals(273)
    counts = vals(279)
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip offsets/byte counts")
    rows_per_strip = val(278, h)

    raw = bytearray()
    for s, (o, c) in enumerate(zip(offsets, counts)):
        strip = data[o : o + c]
        n_rows = min(rows_per_strip, h - s * rows_per_strip)
        expected = n_rows * w * spp
        if comp == 1:
            raw += strip[:expected]
        elif comp == 5:
            dec = _lzw_decode_tiff(strip)[:expected]
            if predictor == 2:
                a = np.frombuffer(dec, np.uint8).reshape(n_rows, w, spp)
                dec = np.cumsum(a, axis=1, dtype=np.uint8).tobytes()
            raw += dec
        elif comp == 32773:
            raw += _packbits_decode(strip, expected)
        else:
            raise NotImplementedError(f"TIFF compression {comp} unsupported")

    a = np.frombuffer(bytes(raw), np.uint8, count=h * w * spp).reshape(h, w, spp)
    if photo == 3:  # palette: 16-bit colormap, R then G then B planes
        cm = tags.get(320)
        if cm is None:
            raise ValueError("palette TIFF missing colormap")
        typ, count, payload = cm
        m = struct.unpack(bo + "H" * count, payload)
        n = count // 3
        table = (np.array(m, np.uint32).reshape(3, n).T // 257).astype(np.uint8)
        return table[a[:, :, 0]]
    if photo in (0, 1):
        g = a[:, :, 0]
        return (255 - g) if photo == 0 else g.copy()
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples per pixel")
        return a[:, :, :3].copy()  # extra samples (alpha) dropped
    raise NotImplementedError(f"TIFF photometric {photo} unsupported")


# ------------------------------------------------------------------ #
# encode
# ------------------------------------------------------------------ #
def encode_tiff(
    arr: np.ndarray,
    compression: str = "none",
    rows_per_strip: int | None = None,
    predictor: bool = False,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> little-endian TIFF.
    compression: 'none' | 'lzw' | 'packbits'; predictor applies
    horizontal differencing (LZW only, like libtiff)."""
    a = np.asarray(arr, np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"encode_tiff expects (H,W) or (H,W,3), got {a.shape}")
    h, w = a.shape[:2]
    spp = 1 if gray else 3
    comp = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    if predictor and comp != 5:
        raise ValueError("predictor is a TIFF-LZW feature")
    rps = rows_per_strip or h
    flat = a.reshape(h, w, spp)

    strips = []
    for s0 in range(0, h, rps):
        block = flat[s0 : s0 + rps]
        if comp == 5 and predictor:
            d = block.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            payload = _lzw_encode_tiff(d.astype(np.uint8).tobytes())
        elif comp == 5:
            payload = _lzw_encode_tiff(block.tobytes())
        elif comp == 32773:
            payload = _packbits_encode(block.tobytes())
        else:
            payload = block.tobytes()
        strips.append(payload)

    # layout: header(8) | strip data | bits-per-sample array (RGB) |
    # strip offset/count arrays | IFD
    pos = 8
    strip_offsets = []
    for p in strips:
        strip_offsets.append(pos)
        pos += len(p)
    extra = b""
    bps_off = None
    if spp == 3:
        bps_off = pos + len(extra)
        extra += struct.pack("<HHH", 8, 8, 8) + b"\x00\x00"  # pad to word
    offs_off = counts_off = None
    n_strips = len(strips)
    if n_strips > 1:
        offs_off = pos + len(extra)
        extra += struct.pack("<" + "I" * n_strips, *strip_offsets)
        counts_off = pos + len(extra)
        extra += struct.pack("<" + "I" * n_strips, *(len(p) for p in strips))
    ifd_off = pos + len(extra)

    def entry(tag, typ, count, value_bytes):
        return struct.pack("<HHI", tag, typ, count) + value_bytes.ljust(4, b"\x00")

    def short(v):
        return struct.pack("<H", v)

    def long_(v):
        return struct.pack("<I", v)

    entries = [
        entry(256, 4, 1, long_(w)),
        entry(257, 4, 1, long_(h)),
        entry(
            258, 3, spp,
            short(8) if spp == 1 else long_(bps_off),
        ),
        entry(259, 3, 1, short(comp)),
        entry(262, 3, 1, short(1 if gray else 2)),
        entry(
            273, 4, n_strips,
            long_(strip_offsets[0]) if n_strips == 1 else long_(offs_off),
        ),
        entry(277, 3, 1, short(spp)),
        entry(278, 4, 1, long_(rps)),
        entry(
            279, 4, n_strips,
            long_(len(strips[0])) if n_strips == 1 else long_(counts_off),
        ),
    ]
    if predictor:
        entries.append(entry(317, 3, 1, short(2)))
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + b"\x00\x00\x00\x00"
    return (
        b"II*\x00"
        + struct.pack("<I", ifd_off)
        + b"".join(strips)
        + extra
        + ifd
    )
