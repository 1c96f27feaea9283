"""From-scratch baseline TIFF codec (TIFF 6.0 spec, Adobe 1992 —
public): both byte orders, IFD tag walking, strip assembly, and the
three compressions a scanner/archive corpus actually contains —
uncompressed (1), TIFF-LZW (5, the MSB-first variant WITH the spec's
"early change" code-width bump and optional horizontal-differencing
predictor) and PackBits (32773, the Macintosh RLE). Photometric
gray (0/1, MinIsWhite inverted), RGB (2) and palette (3, 16-bit
colormap scaled to 8 — with 8- OR 16-bit indices, round 8). 8- and
16-bit samples (16-bit non-palette downscales via the high byte, the
PNG path's convention; palette indices stay raw for the lookup),
BOTH planar configurations (chunky 1 and the plane-major separate
layout 2, round 8 — each strip/tile carries one component plane,
segments ordered all-of-plane-0 first), and both STRIP and TILE
layouts (round 6: a tile is a strip with a 2-D geometry — one shared
segment decoder assembles either; edge tiles are padded to full size
per TIFF 6.0 §15, the layout scanned-document archives actually use).

Encoder twin writes gray/RGB/palette, uint8 or uint16, with any of
the three compressions, multi-strip or tiled, chunky or planar=2,
optional predictor (per-sample differencing at both depths) — so
every decode path round-trips bit-exactly (TIFF is lossless; 16-bit
round-trips are exact on the high byte; palette round-trips exact
through the v*257 // 257 colormap scaling).

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
    if any(b != bits[0] for b in bits) or bits[0] not in (8, 16):
        raise NotImplementedError(
            f"only uniform 8- or 16-bit TIFF samples supported (got {bits})"
        )
    depth = bits[0]
    sample_dt = np.dtype("u1") if depth == 8 else np.dtype(bo + "u2")
    acc_dt = np.uint8 if depth == 8 else np.uint16  # native, for cumsum/paste
    comp = val(259, 1)
    photo = val(262, 1)
    spp = val(277, 1)
    planar = val(284, 1)
    predictor = val(317, 1)
    if planar not in (1, 2):
        raise ValueError(f"invalid TIFF planar configuration {planar}")
    # planar=2 (round 8): each strip/tile carries ONE component plane;
    # the segment sequence is plane-major (all of sample 0's segments,
    # then sample 1's, ... — TIFF 6.0 §"PlanarConfiguration": for
    # planar=2 StripOffsets holds SamplesPerPixel * StripsPerImage
    # entries). Decode per-plane with 1 channel and stack.
    nchan = spp if planar == 1 else 1

    def _segment(seg: bytes, rows: int, cols: int) -> np.ndarray:
        """One strip/tile -> (rows, cols, nchan) samples. A tile is
        just a strip with a 2-D layout: same compression, same per-row
        predictor, only the (rows, cols) geometry differs; under
        planar=2 a segment holds one plane (nchan=1)."""
        expected = rows * cols * nchan * (depth // 8)
        if comp == 1:
            dec = seg[:expected]
        elif comp == 5:
            dec = _lzw_decode_tiff(seg)[:expected]
        elif comp == 32773:
            dec = _packbits_decode(seg, expected)
        else:
            raise NotImplementedError(f"TIFF compression {comp} unsupported")
        a = np.frombuffer(dec, sample_dt, count=rows * cols * nchan).reshape(
            rows, cols, nchan
        )
        if predictor == 2:
            # horizontal differencing is per SAMPLE VALUE, so for
            # 16-bit it accumulates mod 65536 on the byte-order-decoded
            # values, not on raw bytes (TIFF 6.0 §14). The tag is NOT
            # tied to LZW — a Predictor=2 file with uncompressed or
            # PackBits data must un-difference too (round-6 review:
            # the old comp==5 gate returned raw deltas as pixels).
            # Under planar=2 the row holds ONE plane's samples, so the
            # same per-value cumsum is the per-plane differencing.
            a = np.cumsum(a, axis=1, dtype=acc_dt)
        return a.astype(acc_dt)

    n_planes = spp if planar == 2 else 1
    if 322 in tags or 323 in tags:
        # tiled layout (TIFF 6.0 §15): a grid of fixed-size tiles,
        # each padded to full (tl, tw) at the right/bottom edges
        tw, tl = val(322), val(323)
        offsets, counts = vals(324), vals(325)
        if not tw or not tl or offsets is None or counts is None:
            raise ValueError("tiled TIFF missing tile geometry/offsets")
        across = -(-w // tw)
        down = -(-h // tl)
        per_plane = across * down
        if min(len(offsets), len(counts)) < per_plane * n_planes:
            raise ValueError("tiled TIFF missing tiles")
        a = np.zeros((h, w, spp), dtype=acc_dt)
        for p_i in range(n_planes):
            for idx in range(per_plane):
                ty, tx = divmod(idx, across)
                si = p_i * per_plane + idx
                seg = _segment(
                    data[offsets[si] : offsets[si] + counts[si]], tl, tw
                )
                y0, x0 = ty * tl, tx * tw
                ch = slice(None) if planar == 1 else slice(p_i, p_i + 1)
                a[y0 : y0 + tl, x0 : x0 + tw, ch] = seg[: h - y0, : w - x0]
    else:
        offsets = vals(273)
        counts = vals(279)
        if offsets is None or counts is None:
            raise ValueError("TIFF missing strip offsets/byte counts")
        rows_per_strip = val(278, h)
        per_plane = -(-h // rows_per_strip)
        if len(offsets) < per_plane * n_planes:
            raise ValueError("TIFF missing strips")
        planes = []
        for p_i in range(n_planes):
            parts = []
            for s in range(per_plane):
                si = p_i * per_plane + s
                o, c = offsets[si], counts[si]
                n_rows = min(rows_per_strip, h - s * rows_per_strip)
                parts.append(_segment(data[o : o + c], n_rows, w))
            planes.append(
                np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            )
        a = planes[0] if n_planes == 1 else np.concatenate(planes, axis=2)

    if depth == 16 and photo != 3:
        # high-byte downscale (sample >> 8) — the same canonical 16->8
        # conversion the PNG path uses; features consume uint8.
        # Palette samples are exempt: they are INDICES, and the lookup
        # below needs them raw (round 8 — 16-bit palette support).
        a = (a >> 8).astype(np.uint8)
    if photo == 3:  # palette: 16-bit colormap, R then G then B planes
        cm = tags.get(320)
        if cm is None:
            raise ValueError("palette TIFF missing colormap")
        typ, count, payload = cm
        m = struct.unpack(bo + "H" * count, payload)
        n = count // 3
        idx = a[:, :, 0]
        if int(idx.max(initial=0)) >= n:
            raise ValueError(
                f"palette TIFF index {int(idx.max())} outside colormap ({n})"
            )
        table = (np.array(m, np.uint32).reshape(3, n).T // 257).astype(np.uint8)
        return table[idx]
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
    tile: tuple[int, int] | None = None,
    palette: np.ndarray | None = None,
    planar: int = 1,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB, uint8 or uint16 (16-bit samples
    written little-endian, the archival scanner depth), ->
    little-endian TIFF. compression: 'none' | 'lzw' | 'packbits';
    predictor applies horizontal differencing (LZW only, like
    libtiff). ``tile=(tile_width, tile_length)`` writes the TIFF 6.0
    §15 tiled layout instead of strips (both dimensions must be
    multiples of 16 per the spec; edge tiles are zero-padded to full
    size) — the layout large scanned-document corpora actually use.

    ``palette`` (round 8): an (n, 3) uint8 colormap turning a 2-D
    ``arr`` of INDICES (uint8 or uint16 — the 16-bit palette form)
    into a photometric-3 file; the ColorMap tag is written 16-bit
    scaled (v*257) with the full 2**depth entries the spec mandates,
    unused entries zero. ``planar=2`` writes each RGB component as
    its own plane-major run of strips/tiles (PlanarConfiguration 2),
    the layout some scanner pipelines emit; only meaningful for RGB."""
    a = np.asarray(arr)
    if a.dtype not in (np.uint8, np.uint16):
        a = a.astype(np.uint8)
    depth = 16 if a.dtype == np.uint16 else 8
    gray = a.ndim == 2
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8)
        if not gray or pal.ndim != 2 or pal.shape[1] != 3:
            raise ValueError(
                "palette encode expects 2-D indices and an (n, 3) colormap"
            )
        if int(a.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index outside colormap")
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"encode_tiff expects (H,W) or (H,W,3), got {a.shape}")
    h, w = a.shape[:2]
    spp = 1 if gray else 3
    if planar not in (1, 2):
        raise ValueError(f"planar must be 1 or 2, got {planar}")
    if planar == 2 and spp == 1:
        planar = 1  # one plane IS chunky; tag omitted
    comp = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    if predictor and comp != 5:
        raise ValueError("predictor is a TIFF-LZW feature")
    if tile is not None:
        tw, tl = tile
        if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
            raise ValueError("TIFF tile dimensions must be positive multiples of 16")
        if rows_per_strip is not None:
            raise ValueError("tile and rows_per_strip are mutually exclusive")
    flat = a.reshape(h, w, spp)

    def _pack(block: np.ndarray) -> bytes:
        if comp == 5 and predictor:
            # difference per sample value; uint arithmetic wraps mod
            # 2^depth exactly as the decoder's cumsum un-wraps it
            d = block.astype(np.uint32)
            d[:, 1:, :] = (d[:, 1:, :] - d[:, :-1, :]) % (1 << depth)
            raw = d.astype("<u2" if depth == 16 else np.uint8).tobytes()
        else:
            raw = block.astype("<u2" if depth == 16 else np.uint8).tobytes()
        if comp == 5:
            return _lzw_encode_tiff(raw)
        if comp == 32773:
            return _packbits_encode(raw)
        return raw

    # planar=2: segments are plane-major (all of component 0's
    # strips/tiles, then component 1's, ...), each carrying 1 channel
    planes = (
        [flat] if planar == 1 else [flat[:, :, i : i + 1] for i in range(spp)]
    )
    seg_ch = spp if planar == 1 else 1
    segments = []
    for plane in planes:
        if tile is not None:
            for y0 in range(0, h, tl):
                for x0 in range(0, w, tw):
                    block = plane[y0 : y0 + tl, x0 : x0 + tw]
                    if block.shape[0] != tl or block.shape[1] != tw:
                        padded = np.zeros((tl, tw, seg_ch), dtype=a.dtype)
                        padded[: block.shape[0], : block.shape[1]] = block
                        block = padded
                    segments.append(_pack(block))
        else:
            rps = rows_per_strip or h
            for s0 in range(0, h, rps):
                segments.append(_pack(plane[s0 : s0 + rps]))

    # layout: header(8) | segment data | bits-per-sample array (RGB) |
    # segment offset/count arrays | IFD. TIFF 6.0 requires the IFD and
    # every value offset to sit on a WORD boundary, so odd-length
    # compressed segments are padded with one byte (byte counts record
    # the true unpadded length; strict readers reject odd offsets).
    pos = 8
    seg_offsets = []
    padded_segments = []
    for p in segments:
        seg_offsets.append(pos)
        pad = len(p) & 1
        padded_segments.append(p + b"\x00" * pad)
        pos += len(p) + pad
    extra = b""
    bps_off = None
    if spp == 3:
        bps_off = pos + len(extra)
        extra += struct.pack("<HHH", depth, depth, depth) + b"\x00\x00"
    cmap_off = n_cm = None
    if palette is not None:
        # ColorMap: 3 * 2**depth SHORTs, R plane then G then B, values
        # 16-bit scaled (v*257 maps 255 -> 65535 exactly); unused
        # entries zero — the spec-mandated full-size table
        n_cm = 1 << depth
        cm = np.zeros((3, n_cm), np.uint16)
        cm[:, : pal.shape[0]] = pal.T.astype(np.uint32) * 257
        cmap_off = pos + len(extra)
        extra += cm.astype("<u2").tobytes()
    offs_off = counts_off = None
    n_segs = len(segments)
    if n_segs > 1:
        offs_off = pos + len(extra)
        extra += struct.pack("<" + "I" * n_segs, *seg_offsets)
        counts_off = pos + len(extra)
        extra += struct.pack("<" + "I" * n_segs, *(len(p) for p in segments))
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
            short(depth) if spp == 1 else long_(bps_off),
        ),
        entry(259, 3, 1, short(comp)),
        entry(
            262, 3, 1,
            short(3 if palette is not None else (1 if gray else 2)),
        ),
        entry(277, 3, 1, short(spp)),
    ]
    if palette is not None:
        entries.append(entry(320, 3, 3 * n_cm, long_(cmap_off)))
    if planar == 2:
        entries.append(entry(284, 3, 1, short(2)))
    off_tag, count_tag = (324, 325) if tile is not None else (273, 279)
    entries += [
        entry(
            off_tag, 4, n_segs,
            long_(seg_offsets[0]) if n_segs == 1 else long_(offs_off),
        ),
        entry(
            count_tag, 4, n_segs,
            long_(len(segments[0])) if n_segs == 1 else long_(counts_off),
        ),
    ]
    if tile is not None:
        entries += [entry(322, 4, 1, long_(tw)), entry(323, 4, 1, long_(tl))]
    else:
        entries.append(entry(278, 4, 1, long_(rows_per_strip or h)))
    if predictor:
        entries.append(entry(317, 3, 1, short(2)))
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + b"\x00\x00\x00\x00"
    return (
        b"II*\x00"
        + struct.pack("<I", ifd_off)
        + b"".join(padded_segments)
        + extra
        + ifd
    )
