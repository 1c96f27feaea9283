"""Pure-numpy image codecs (SURVEY.md §2.B.11 multimodal).

The sandbox has no PIL/opencv, so the engine carries its own codecs
for the two classic uncompressed formats — Netpbm (P6/P5 binary,
P3/P2 ascii) and 24-bit uncompressed BMP — implemented on numpy only.
That makes the multimodal dataflow honest end-to-end: blobs are real
encoded images, ``decode_image_bytes`` parses actual headers and
pixel data, and features/resizes are computed from decoded pixels.

PNG (round 3+5: all five 8-bit color types, Adam7 interlace) and
JPEG (rounds 4-5, multimodal/jpeg.py: baseline/multi-scan/
progressive) are also implemented from scratch; only formats needing
true DSP decoders raise NotImplementedError so gaps stay explicit.

These run INSIDE mapInPandas batches (see columns.py) — per-blob
numpy work on Arrow-shipped bytes, never driver-side.
"""

from __future__ import annotations

import numpy as np

_MAGIC_JPEG = b"\xff\xd8\xff"
_MAGIC_PNG = b"\x89PNG"


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary P6 PPM."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_ppm expects (H, W, 3), got {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_pgm(arr: np.ndarray) -> bytes:
    """(H, W) uint8 -> binary P5 PGM (grayscale)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"encode_pgm expects (H, W), got {a.shape}")
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()


def _pnm_tokens(data: bytes):
    """Yield header tokens, skipping '#' comments (Netpbm allows them
    anywhere in the header)."""
    i = 0
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not data[j : j + 1].isspace() and data[j : j + 1] != b"#":
                j += 1
            yield i, data[i:j]
            i = j


def decode_pnm(data: bytes) -> np.ndarray:
    """P6/P3 PPM -> (H, W, 3) uint8; P5/P2 PGM -> (H, W) uint8."""
    toks = _pnm_tokens(data)
    _, magic = next(toks)
    if magic not in (b"P6", b"P3", b"P5", b"P2"):
        raise ValueError(f"not a supported PNM: magic {magic!r}")
    _, w = next(toks)
    _, h = next(toks)
    mv_pos, maxval_tok = next(toks)
    w, h, maxval = int(w), int(h), int(maxval_tok)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    channels = 3 if magic in (b"P6", b"P3") else 1
    count = w * h * channels
    if magic in (b"P6", b"P5"):
        # binary: pixel data begins after exactly ONE whitespace byte
        # following the maxval token (position from the tokenizer, so
        # a width/height that equals maxval can't mislead the offset)
        start = mv_pos + len(maxval_tok) + 1
        flat = np.frombuffer(data, dtype=np.uint8, count=count, offset=start)
    else:
        vals = []
        for _, t in toks:
            vals.append(int(t))
            if len(vals) == count:
                break
        flat = np.asarray(vals, dtype=np.uint8)
    if flat.size != count:
        raise ValueError(f"PNM truncated: want {count} samples, got {flat.size}")
    return flat.reshape((h, w, 3) if channels == 3 else (h, w)).copy()


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up rows,
    BGR byte order, rows padded to 4 bytes — the classic layout)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_bmp expects (H, W, 3), got {a.shape}")
    h, w = a.shape[:2]
    row_size = (w * 3 + 3) // 4 * 4
    bgr = a[::-1, :, ::-1]  # bottom-up, BGR
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pixel_bytes = rows.tobytes()
    file_size = 54 + len(pixel_bytes)
    header = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")  # pixel data offset
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER size
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
        + len(pixel_bytes).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 dpi
        + (0).to_bytes(4, "little") * 2
    )
    return header + pixel_bytes


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP -> (H, W, 3) uint8 RGB. 24-bit (BGR), 32-bit (BGRA/BGRX —
    the 4th byte dropped), 8-bit PALETTE rows, and RLE8-compressed
    8-bit (round 5; the layouts real BMPs use); RLE4 and 1/4-bit
    depths raise with a clear message."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = int.from_bytes(data[10:14], "little")
    hdr_size = int.from_bytes(data[14:18], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    # BI_BITFIELDS (3) on 32-bit data is byte-aligned BGRA in practice;
    # BI_RLE8 (1) is the classic run-length 8-bit form (round 5)
    ok = (
        compression == 0
        and bpp in (8, 24, 32)
        or (compression == 3 and bpp == 32)
        or (compression == 1 and bpp == 8)
    )
    if not ok:
        raise ValueError(
            f"only uncompressed 8/24/32-bit or RLE8 BMP supported "
            f"(bpp={bpp}, compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    nbytes = bpp // 8
    if compression == 1:
        # RLE8: (count, value) runs; count 0 escapes to EOL(0) /
        # EOB(1) / delta(2, dx, dy) / absolute(n literals, word-pad).
        # Pixels never written stay index 0 (the conventional fill).
        idx8 = np.zeros((h, w), np.uint8)
        x = y = 0
        i = offset
        n_data = len(data)
        while i + 1 < n_data and y < h:
            c, v = data[i], data[i + 1]
            i += 2
            if c:
                run = min(c, w - x)
                idx8[y, x : x + run] = v
                x += c
            elif v == 0:
                y += 1
                x = 0
            elif v == 1:
                break
            elif v == 2:
                x += data[i]
                y += data[i + 1]
                i += 2
            else:
                lit = np.frombuffer(data, np.uint8, min(v, max(w - x, 0)), i)
                idx8[y, x : x + len(lit)] = lit
                x += v
                i += v + (v & 1)
        rows = idx8[:, :, None]
        if not top_down:  # RLE rows are stored bottom-up like raw BMP
            rows = rows[::-1]
    else:
        row_size = (w * nbytes + 3) // 4 * 4
        rows = np.frombuffer(data, dtype=np.uint8, count=h * row_size, offset=offset)
        rows = rows.reshape(h, row_size)[:, : w * nbytes].reshape(h, w, nbytes)
        if not top_down:
            rows = rows[::-1]
    if bpp == 8:
        # palette (BGRX quads) sits between the info header and pixels
        n_colors = int.from_bytes(data[46:50], "little") or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        idx = rows.reshape(h, w)
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("BMP palette index out of range")
        return pal[idx].copy()
    return rows[:, :, 2::-1].copy()  # BGR(A) -> RGB, alpha dropped


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        len(payload).to_bytes(4, "big")
        + tag
        + payload
        + zlib.crc32(tag + payload).to_bytes(4, "big")
    )


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def encode_png(arr: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 -> 8-bit RGB PNG; (H, W) uint8 -> 8-bit gray
    PNG. Stdlib zlib deflate, filter type 0 on every scanline (the
    always-valid choice; optimal filtering is a size optimization,
    not a correctness one). ``interlace=True`` writes the Adam7
    seven-pass layout (each pass its own filtered sub-image) — the
    decoder's interlaced path's test twin."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type = 0
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type = 2
    else:
        raise ValueError(f"encode_png expects (H, W) or (H, W, 3), got {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0)
    if interlace:
        img = a if a.ndim == 3 else a[..., None]
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            flat = sub.reshape(sub.shape[0], -1)
            parts.extend(b"\x00" + flat[r].tobytes() for r in range(sub.shape[0]))
        raw = b"".join(parts)
    else:
        flat = a.reshape(h, -1)
        raw = b"".join(b"\x00" + flat[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> (H, W)/(H, W, 3) uint8. All five
    8-bit color types decode: gray (0), RGB (2), PALETTE (3 — PLTE
    lookup to RGB), gray+alpha (4) and RGBA (6); the alpha channel is
    DROPPED after un-filtering (the feature pipeline consumes opaque
    pixels; compositing policy belongs to the caller). Adam7
    INTERLACED files decode too (round 5): each of the seven passes is
    an independently-filtered sub-image, un-filtered with the same
    helper and scattered onto its pass grid. 16-bit raises with a
    clear message.

    Stdlib zlib inflates the IDAT stream; scanline un-filtering is
    numpy: None/Up are vectorized whole-row ops, Sub is a per-pixel
    cumsum (mod-256 addition distributes over the prefix sum), and
    Average/Paeth — which depend on left AND upper neighbors — fall
    back to a per-pixel loop vectorized over channels."""
    import struct
    import zlib

    if bytes(data[:8]) != _PNG_SIG:
        raise ValueError("not a PNG")
    i = 8
    ihdr = None
    plte = None
    idat = bytearray()
    n = len(data)
    while i + 8 <= n:
        ln = int.from_bytes(data[i : i + 4], "big")
        tag = bytes(data[i + 4 : i + 8])
        payload = data[i + 8 : i + 8 + ln]
        if tag == b"IHDR":
            ihdr = payload
        elif tag == b"PLTE":
            plte = bytes(payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(">IIBBBBB", bytes(ihdr))
    _CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
    ok_depth = depth == 8 or (depth == 16 and color_type != 3)
    if not ok_depth or color_type not in _CHANNELS or interlace not in (0, 1):
        raise ValueError(
            f"only 8-bit (and 16-bit non-palette) PNG supported "
            f"(depth={depth}, color_type={color_type}, interlace={interlace})"
        )
    if color_type == 3 and (plte is None or len(plte) % 3):
        raise ValueError("palette PNG missing/malformed PLTE chunk")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    # PNG filtering is BYTE-wise with bpp = bytes per pixel — the
    # same un-filter code serves 8- and 16-bit depths
    bpp = channels * (depth // 8)
    stride = w * bpp

    def unfilter(block: bytes, bh: int, bw: int) -> np.ndarray:
        """(bh, bw*channels) pixels from bh filtered scanlines."""
        bstride = bw * bpp
        if len(block) != bh * (bstride + 1):
            raise ValueError(
                f"PNG pixel data truncated: {len(block)} != {bh * (bstride + 1)}"
            )
        rows = np.frombuffer(block, dtype=np.uint8).reshape(bh, bstride + 1)
        ftypes = rows[:, 0]
        filt = rows[:, 1:].astype(np.int32)
        out = np.zeros((bh, bstride), dtype=np.uint8)
        for r in range(bh):
            ft = int(ftypes[r])
            row = filt[r]
            prior = out[r - 1].astype(np.int32) if r else np.zeros(bstride, np.int32)
            if ft == 0:
                recon = row
            elif ft == 1:  # Sub: prefix sum over pixels, per channel
                recon = np.cumsum(
                    row.reshape(bw, bpp), axis=0, dtype=np.int64
                ).reshape(bstride)
            elif ft == 2:  # Up
                recon = row + prior
            elif ft in (3, 4):  # Average / Paeth: left-dependent, loop pixels
                recon = np.zeros(bstride, np.int64)
                for px in range(bw):
                    lo = px * bpp
                    left = recon[lo - bpp : lo] % 256 if px else np.zeros(bpp, np.int64)
                    up = prior[lo : lo + bpp]
                    if ft == 3:
                        pred = (left + up) // 2
                    else:
                        ul = prior[lo - bpp : lo] if px else np.zeros(bpp, np.int64)
                        p = left + up - ul
                        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                        pred = np.where(
                            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                        )
                    recon[lo : lo + bpp] = row[lo : lo + bpp] + pred
            else:
                raise ValueError(f"bad PNG filter type {ft}")
            out[r] = (recon % 256).astype(np.uint8)
        return out

    if interlace == 0:
        out = unfilter(raw, h, w)
    else:
        composed = np.zeros((h, w, bpp), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            take = ph * (pw * bpp + 1)
            composed[y0::dy, x0::dx] = unfilter(
                raw[pos : pos + take], ph, pw
            ).reshape(ph, pw, bpp)
            pos += take
        if pos != len(raw):
            raise ValueError("interlaced PNG data length mismatch")
        out = composed.reshape(h, stride)
    if depth == 16:
        # network byte order: the high byte is sample>>8 — the
        # canonical 16->8 downscale (features consume uint8; a
        # full-precision consumer would keep both bytes)
        out = out.reshape(h, w, channels, 2)[:, :, :, 0].reshape(h, w * channels)
    if color_type == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = out.reshape(h, w)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    px = out.reshape(h, w, channels)
    if color_type == 0:
        return px.reshape(h, w)
    if color_type == 4:  # gray + alpha: drop alpha
        return px[:, :, 0]
    if color_type == 6:  # RGBA: drop alpha
        return px[:, :, :3].copy()
    return px


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Sniff the magic and decode: PNM -> (H,W,3)/(H,W), BMP ->
    (H,W,3), PNG (all five 8-bit color types; alpha dropped) ->
    (H,W)/(H,W,3), JPEG (baseline, MULTI-SCAN and PROGRESSIVE;
    4:4:4 / 4:2:0 / 4:2:2 / gray, restart markers) -> (H,W,3)/(H,W),
    GIF (LZW, global/local palettes, interlace; first composited
    frame) -> (H,W,3), uint8. Arithmetic/lossless JPEG raises
    NotImplementedError (from the jpeg module) so the gap stays
    explicit."""
    head = bytes(data[:4])
    if head[:2] in (b"P6", b"P3", b"P5", b"P2"):
        return decode_pnm(data)
    if head[:2] == b"BM":
        return decode_bmp(data)
    if head.startswith(_MAGIC_PNG):
        return decode_png(data)
    if head.startswith(_MAGIC_JPEG):
        from snapflow_spark.multimodal.jpeg import decode_jpeg

        return decode_jpeg(data)
    if head.startswith(b"GIF8"):
        from snapflow_spark.multimodal.gif import decode_gif

        return decode_gif(data)
    if head in (b"II*\x00", b"MM\x00*"):
        from snapflow_spark.multimodal.tiff import decode_tiff

        return decode_tiff(data)
    raise ValueError(f"unrecognized image format (magic {head!r})")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure indexing,
    the right default for a dependency-free kernel."""
    a = np.asarray(arr)
    h, w = a.shape[:2]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return a[rows][:, cols].copy()


def synthesize_image(seed_bytes: bytes, width: int = 8, height: int = 8) -> np.ndarray:
    """Deterministic (H, W, 3) test image from a byte seed — blake2b
    in counter mode, so any (seed, size) is reproducible anywhere."""
    import hashlib

    need = width * height * 3
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.blake2b(
            seed_bytes + counter.to_bytes(4, "little"), digest_size=64
        ).digest()
        counter += 1
    return (
        np.frombuffer(bytes(out[:need]), dtype=np.uint8)
        .reshape(height, width, 3)
        .copy()
    )
