"""Pure-numpy image codecs (SURVEY.md §2.B.11 multimodal).

The sandbox has no PIL/opencv, so the engine carries its own codecs
for the two classic uncompressed formats — Netpbm (P6/P5 binary,
P3/P2 ascii) and 24-bit uncompressed BMP — implemented on numpy only.
That makes the multimodal dataflow honest end-to-end: blobs are real
encoded images, ``decode_image_bytes`` parses actual headers and
pixel data, and features/resizes are computed from decoded pixels.

Compressed formats (JPEG/PNG/WAV) still need external codec
libraries; ``decode_image_bytes`` raises NotImplementedError for
their signatures so the gap is explicit, not silent.

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
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(data, dtype=np.uint8, count=h * row_size, offset=offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Sniff the magic and decode: PNM -> (H,W,3)/(H,W), BMP ->
    (H,W,3), uint8. JPEG/PNG raise NotImplementedError (they need a
    real codec library this environment does not ship)."""
    head = bytes(data[:4])
    if head[:2] in (b"P6", b"P3", b"P5", b"P2"):
        return decode_pnm(data)
    if head[:2] == b"BM":
        return decode_bmp(data)
    if head.startswith(_MAGIC_JPEG) or head.startswith(_MAGIC_PNG):
        raise NotImplementedError(
            "JPEG/PNG decode requires a codec library not present in this "
            "environment; re-encode as PPM/BMP or plug a decoder in here"
        )
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
