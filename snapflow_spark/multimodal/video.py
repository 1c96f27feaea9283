"""Video columns (SURVEY.md §2.B.11 multimodal): raw-video payloads
as opaque BINARY columns + typed metadata, processed in mapInPandas —
completing the image/audio/video triad (columns.py, audio.py).

The codec is REAL: YUV4MPEG2 (.y4m) is a plain-text-header +
raw-planes format, so encode/decode need only stdlib + numpy (the
same honesty bar as PPM/BMP/PNG and RIFF/WAVE). We support C444
(3 full-resolution planes) and Cmono (luma only) — both round-trip
bit-exactly; the codec parses containers, it does not do colorimetry,
so the three planes are carried as-is. MJPEG-in-AVI (round 5) is
also REAL: the AVI RIFF container parses with stdlib struct and every
'00dc' chunk is a JPEG our from-scratch T.81 codec decodes — a true
compressed-video format with no codec library. Animated GIF (round
5, multimodal/gif.py: from-scratch LZW + palette compositing) is the
third container. ``decode_video_bytes`` dispatches on magic;
inter-frame codecs (MP4/MKV/WebM, non-MJPG AVI) raise
NotImplementedError explicitly.

Frame sampling is the scale-relevant op: ``sample_frames`` decodes
inside one mapInPandas stage, keeps every Nth frame, and EXPLODES to
one row per sampled frame re-encoded as a still image (PPM/PGM) —
so the output feeds the existing image pipeline (columns.
extract_features) unchanged. Raw frames never hit storage or shuffle;
worker memory is bounded by the Arrow batch size times one decoded
clip.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snapflow_spark.multimodal.codec import encode_pgm, encode_ppm
from snapflow_spark.multimodal.columns import BLOB_META_SCHEMA

# [duration_ms, n_frames, fps, width, height, mean_luma, std_luma,
#  motion_energy]
VIDEO_FEATURE_DIM = 8

_COMPRESSED_MAGIC = {
    b"\x1aE\xdf\xa3": "MKV/WebM (EBML)",
}


def encode_y4m(
    frames: np.ndarray, fps: int = 25, mono: bool | None = None
) -> bytes:
    """(T, H, W, 3) or (T, H, W) uint8 -> YUV4MPEG2 bytes (C444 for
    3-plane input, Cmono for single-plane)."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 3:
        a = a[..., None]
    if a.ndim != 4 or a.shape[3] not in (1, 3):
        raise ValueError(f"encode_y4m expects (T,H,W[,1|3]), got {a.shape}")
    t, h, w, c = a.shape
    if mono is None:
        mono = c == 1
    cs = b"Cmono" if mono else b"C444"
    header = b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 %s\n" % (w, h, fps, cs)
    parts = [header]
    for f in range(t):
        parts.append(b"FRAME\n")
        # planar layout: each channel is a full H*W plane
        for ch in range(c):
            parts.append(a[f, :, :, ch].tobytes())
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 -> ((T, H, W, C) uint8, fps). C444 and Cmono only;
    subsampled (C420*/C422) and compressed containers raise with a
    clear message."""
    data = bytes(data)
    if not data.startswith(b"YUV4MPEG2"):
        if data[4:8] == b"ftyp":
            from snapflow_spark.multimodal.probe import probe_summary

            raise NotImplementedError(
                f"compressed video ({probe_summary(data)}) needs a "
                "codec library not present in this environment"
            )
        if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
            raise ValueError(
                "AVI container: decode via decode_video_bytes (MJPEG "
                "streams decode; other codecs raise there)"
            )
        for magic, name in _COMPRESSED_MAGIC.items():
            if data.startswith(magic):
                from snapflow_spark.multimodal.probe import probe_summary

                raise NotImplementedError(
                    f"compressed video ({name}: {probe_summary(data)}) "
                    "needs a codec library not present in this "
                    "environment"
                )
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    w = h = fps = None
    channels = 3  # Y4M default colorspace is 420; we only take 444/mono
    cs = b"C420"
    for tok in data[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            if int(den) <= 0 or int(num) <= 0:
                raise ValueError(
                    f"Y4M frame rate invalid: F{tok[1:].decode()!r}"
                )
            fps = int(round(int(num) / int(den)))
        elif tok[:1] == b"C":
            cs = tok
    if w is None or h is None or not fps:
        # fps=0 would pass a bare None-check and later crash frame
        # timing (1000*idx/fps) deep inside a mapInPandas stage
        raise ValueError("Y4M header missing or invalid W/H/F")
    if cs == b"Cmono":
        channels = 1
    elif cs == b"C444":
        channels = 3
    else:
        raise ValueError(
            f"only C444/Cmono Y4M supported (got {cs.decode()!r}); "
            "subsampled chroma needs upsampling policy the caller must pick"
        )
    plane = w * h
    frame_bytes = plane * channels
    frames = []
    i = nl + 1
    n = len(data)
    while i < n:
        fnl = data.index(b"\n", i)
        if data[i : i + 5] != b"FRAME":
            raise ValueError("corrupt Y4M: expected FRAME marker")
        i = fnl + 1
        raw = np.frombuffer(data, dtype=np.uint8, count=frame_bytes, offset=i)
        frames.append(
            raw.reshape(channels, h, w).transpose(1, 2, 0)
        )
        i += frame_bytes
    return np.stack(frames).copy(), fps


def encode_avi_mjpeg(
    frames: np.ndarray, fps: int = 25, quality: int = 90
) -> bytes:
    """(T, H, W, 3) or (T, H, W, 1) uint8 -> AVI bytes with an MJPEG
    video stream: the RIFF container (avih + strl headers, movi list
    of '00dc' chunks, old-style idx1 index) written with stdlib
    struct, each frame a JPEG from the from-scratch T.81 encoder —
    a REAL compressed-video file any player opens."""
    import struct as _struct

    from snapflow_spark.multimodal.jpeg import encode_jpeg

    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 4 or a.shape[3] not in (1, 3):
        raise ValueError(f"encode_avi_mjpeg expects (T,H,W,1|3), got {a.shape}")
    t, h, w, c = a.shape
    jpegs = [
        encode_jpeg(a[f, :, :, 0] if c == 1 else a[f], quality=quality)
        for f in range(t)
    ]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + _struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = _struct.pack(
        "<10I4x4x4x4x",
        int(round(1_000_000 / max(fps, 1))),  # dwMicroSecPerFrame
        0, 0, 0x10,  # maxbytes, padding, flags (HASINDEX)
        t, 0, 1, 0, w, h,
    )
    strh = _struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, max(fps, 1),  # dwScale, dwRate -> fps = rate/scale
        0, t, 0, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = _struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)
    # idx1: one entry per frame (offset relative to 'movi' fourcc)
    idx = bytearray()
    off = 4
    for j in jpegs:
        idx += b"00dc" + _struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes) -> tuple[np.ndarray, int]:
    """AVI/MJPEG -> ((T, H, W, C) uint8, fps). Walks the RIFF tree
    for the stream headers (fps from strh's rate/scale, falling back
    to avih's µs-per-frame) and decodes every video chunk with the
    T.81 JPEG decoder. A non-MJPG video stream raises with the codec
    name — inter-frame codecs genuinely need a DSP library."""
    import struct as _struct

    from snapflow_spark.multimodal.jpeg import decode_jpeg

    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') container")
    fps = None
    avih_fps = None
    compression = None
    last_strh_type = None  # ties each strf to ITS stream's strh
    frames_bytes: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal fps, avih_fps, compression, last_strh_type
        i = start
        while i + 8 <= end:
            fourcc = data[i : i + 4]
            (size,) = _struct.unpack("<I", data[i + 4 : i + 8])
            payload_start = i + 8
            if fourcc == b"LIST":
                walk(payload_start + 4, payload_start + size)
            elif fourcc == b"strh" and size >= 36:
                last_strh_type = data[payload_start : payload_start + 4]
                if last_strh_type == b"vids":
                    scale, rate = _struct.unpack(
                        "<II", data[payload_start + 20 : payload_start + 28]
                    )
                    if scale and rate:
                        fps = rate / scale
            elif fourcc == b"strf" and size >= 20:
                # a VIDEO stream's strf is a BITMAPINFOHEADER; an audio
                # stream's strf (WAVEFORMATEX) must not be misread as
                # one, so only take the strf following a 'vids' strh
                if last_strh_type == b"vids" and compression is None:
                    compression = data[payload_start + 16 : payload_start + 20]
            elif fourcc == b"avih" and size >= 4:
                (us_per_frame,) = _struct.unpack(
                    "<I", data[payload_start : payload_start + 4]
                )
                if us_per_frame:
                    avih_fps = 1_000_000 / us_per_frame
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames_bytes.append(data[payload_start : payload_start + size])
            i = payload_start + size + (size & 1)

    walk(12, 8 + _struct.unpack("<I", data[4:8])[0])
    if compression not in (b"MJPG", b"mjpg"):
        name = (compression or b"?").decode("ascii", "replace")
        raise NotImplementedError(
            f"AVI video codec {name!r}: only MJPEG decodes without a "
            "codec library (every frame is a standalone JPEG)"
        )
    if not frames_bytes:
        raise ValueError("AVI has no video frames")
    true_fps = fps if fps is not None else avih_fps
    if not true_fps:
        raise ValueError("AVI carries no frame rate (strh/avih both absent)")
    decoded = [decode_jpeg(fb) for fb in frames_bytes]
    arrs = [d[..., None] if d.ndim == 2 else d for d in decoded]
    # sub-1fps streams (slideshows) round UP to 1 rather than to a
    # silent 0-or-default — the int contract matches decode_y4m's
    return np.stack(arrs), max(1, int(round(true_fps)))


def _external_video_keys(data: bytes) -> list[str]:
    """Lookup keys for an external decoder registry, most specific
    first, derived from the container probes: for MP4 the video-track
    codec fourccs (e.g. 'avc1', 'vp09', 'av01') then 'mp4'; for EBML
    the doctype ('webm'/'matroska') then 'ebml'."""
    from snapflow_spark.multimodal.probe import probe_container

    info = probe_container(data)
    if not info:
        return []
    if info["container"] == "mp4":
        keys = [c for k, c in info.get("tracks", []) if k == "video"]
        return keys + ["mp4"]
    keys = [info["doctype"]] if info.get("doctype") else []
    return keys + ["ebml"]


def _validate_external_video(out, key: str) -> tuple[np.ndarray, int]:
    """Normalize an external decoder's return to the engine-wide
    ((T, H, W, C) uint8, fps) contract, failing with the registry key
    on malformed output."""
    try:
        frames, fps = out
    except (TypeError, ValueError):
        raise ValueError(
            f"external {key!r} decoder must return (frames, fps)"
        ) from None
    a = np.asarray(frames)
    if a.ndim == 3:  # (T, H, W) mono -> explicit channel axis
        a = a[..., None]
    if a.ndim != 4 or a.size == 0:
        raise ValueError(
            f"external {key!r} decoder returned shape {a.shape}: "
            "expected non-empty (T, H, W[, C]) frames"
        )
    if np.issubdtype(a.dtype, np.floating):
        # float frames in [0, 1] (the skimage/torch convention) scale
        # onto uint8; float frames already in [0, 255] round. Without
        # the scale, normalized output would collapse to near-black
        # frames and identical pHashes — the audio validator's silent
        # false-dup failure mode, video edition.
        if a.size and float(np.nanmax(a)) <= 1.0:
            a = a * 255.0
        a = np.clip(np.round(a), 0, 255).astype(np.uint8)
    elif a.dtype != np.uint8:
        a = np.clip(a, 0, 255).astype(np.uint8)
    return a, int(fps)


def decode_video_bytes(
    data: bytes, external: dict | None = None
) -> tuple[np.ndarray, int]:
    """Magic-sniffing video decode: YUV4MPEG2 -> decode_y4m, AVI ->
    decode_avi_mjpeg, animated GIF -> decode_gif_frames. The single
    entry point the frame-sampling and feature stages use, mirroring
    decode_image_bytes / decode_audio_bytes.

    ``external`` (round 6) maps probe-derived names to user decoders
    (``fn(bytes) -> (frames, fps)``, e.g. a PyAV/ffmpeg binding),
    checked most-specific-first: MP4 video-track fourcc ('avc1',
    'vp09', 'av01'), then container ('mp4'; EBML doctype 'webm' /
    'matroska', then 'ebml'). Same shipping caveat as the audio hook:
    the mapping is captured in each mapInPandas closure, so callables
    must be picklable. Unregistered compressed containers keep
    raising the probe-labeled NotImplementedError."""
    data = bytes(data)
    if external:
        for key in _external_video_keys(data):
            fn = external.get(key)
            if fn is not None:
                return _validate_external_video(fn(data), key)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return decode_avi_mjpeg(data)
    if data[:4] == b"GIF8":
        from snapflow_spark.multimodal.gif import decode_gif_frames

        return decode_gif_frames(data)
    return decode_y4m(data)


def synthesize_video(
    seed_bytes: bytes,
    n_frames: int = 8,
    width: int = 8,
    height: int = 8,
    channels: int = 3,
) -> np.ndarray:
    """Deterministic (T, H, W, C) uint8 frames from a byte seed:
    frame 0 from blake2b counter-mode (the synthesize_image recipe),
    then each later frame is the previous one rolled by one pixel
    with a per-frame hashed row mixed in — guaranteeing nonzero,
    reproducible motion energy."""
    import hashlib

    need = height * width * channels
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.blake2b(
            seed_bytes + counter.to_bytes(4, "little"), digest_size=64
        ).digest()
        counter += 1
    base = (
        np.frombuffer(bytes(out[:need]), dtype=np.uint8)
        .reshape(height, width, channels)
        .copy()
    )
    frames = [base]
    for f in range(1, n_frames):
        prev = frames[-1]
        nxt = np.roll(prev, 1, axis=1).copy()
        row = hashlib.blake2b(
            seed_bytes + b"row" + f.to_bytes(4, "little"),
            digest_size=width * channels if width * channels <= 64 else 64,
        ).digest()
        row = (row * (width * channels // len(row) + 1))[: width * channels]
        nxt[f % height] = np.frombuffer(row, dtype=np.uint8).reshape(
            width, channels
        )
        frames.append(nxt)
    return np.stack(frames)


def video_features(frames: np.ndarray, fps: int) -> list[float]:
    """VIDEO_FEATURE_DIM stats of one decoded clip: duration_ms,
    n_frames, fps, width, height, mean/std of luma (channel mean),
    motion energy (mean |inter-frame diff| in [0,1])."""
    a = np.asarray(frames, dtype=np.float64)
    t, h, w = a.shape[:3]
    luma = a.mean(axis=3) if a.ndim == 4 else a
    motion = (
        float(np.mean(np.abs(np.diff(luma, axis=0))) / 255.0) if t > 1 else 0.0
    )
    return [
        float(1000.0 * t / fps),
        float(t),
        float(fps),
        float(w),
        float(h),
        float(luma.mean() / 255.0),
        float(luma.std() / 255.0),
        motion,
    ]


def attach_video_blob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_frames: int = 8,
    width: int = 8,
    height: int = 8,
    fps: int = 25,
) -> DataFrame:
    """Deterministic REAL video payload per row (synthesized frames
    from the text bytes; mono for every third id so both colorspaces
    are exercised; every fifth id ships as MJPEG-AVI and every
    5k+2 id as an ANIMATED GIF instead of raw Y4M, so downstream ops
    decode all three containers — AVI is the lossy member (JPEG
    frames) and GIF quantizes to its 256-color palette when the
    synthesized frames exceed it), plus the shared metadata struct."""

    def _blobs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from snapflow_spark.multimodal.gif import encode_gif

        for pdf in batches:
            out = pdf.copy()
            blobs = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ch = 1 if int(doc_id) % 3 == 0 else 3
                frames = synthesize_video(
                    str(text or "").encode("utf-8"),
                    n_frames=n_frames,
                    width=width,
                    height=height,
                    channels=ch,
                )
                if int(doc_id) % 5 == 4:
                    blobs.append(encode_avi_mjpeg(frames, fps, quality=95))
                elif int(doc_id) % 5 == 2:
                    # synthesize_video returns (T,H,W,C) with C=1 for
                    # mono — expand on the LAST axis (the old ndim==3
                    # guard never fired and mono hit encode_gif's
                    # (-1,3) palette reshape as a crash)
                    rgb = (
                        np.repeat(frames, 3, axis=-1)
                        if frames.shape[-1] == 1
                        else frames
                    )
                    blobs.append(encode_gif(rgb, fps))
                else:
                    blobs.append(encode_y4m(frames, fps))
            out["blob"] = blobs
            yield out

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["blob binary"]
    )
    with_blob = df.mapInPandas(_blobs, schema=schema)
    duration_ms = int(round(1000.0 * n_frames / fps))
    return with_blob.withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("modality"),
            F.when(F.pmod(F.col(id_col), F.lit(5)) == 4, F.lit("video/x-msvideo"))
            .when(F.pmod(F.col(id_col), F.lit(5)) == 2, F.lit("image/gif"))
            .otherwise(F.lit("video/x-yuv4mpeg"))
            .alias("mime"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit(duration_ms).cast("int").alias("duration_ms"),
            F.concat(F.lit("mem://video/"), F.col(id_col).cast("string")).alias(
                "source_uri"
            ),
        ).cast(BLOB_META_SCHEMA),
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    external: dict | None = None,
) -> DataFrame:
    """Frame sampling fused with decode in ONE mapInPandas stage:
    keep every Nth frame and EXPLODE to one row per sampled frame,
    re-encoded as a still image (P6 PPM for color, P5 PGM for mono)
    with the standard BLOB_META_SCHEMA struct attached — so the rows
    are first-class image blobs that columns.extract_features /
    resize_images consume unchanged. Output: (id, frame_idx, ts_ms,
    blob, meta). Raw frames never leave the worker."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, blobs, mimes, ws, hs = [], [], [], [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                frames, fps = decode_video_bytes(bytes(blob), external)
                for idx in range(0, frames.shape[0], every_n):
                    frame = frames[idx]
                    if frame.shape[2] == 1:
                        img = encode_pgm(frame[:, :, 0])
                        mime = "image/x-portable-graymap"
                    else:
                        img = encode_ppm(frame)
                        mime = "image/x-portable-pixmap"
                    ids.append(doc_id)
                    idxs.append(idx)
                    tss.append(int(round(1000.0 * idx / fps)))
                    blobs.append(img)
                    mimes.append(mime)
                    ws.append(frame.shape[1])
                    hs.append(frame.shape[0])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "ts_ms": tss,
                    "blob": blobs,
                    "mime": mimes,
                    "width": ws,
                    "height": hs,
                }
            )

    sampled = df.mapInPandas(
        _sample,
        schema=(
            f"{id_col} long, frame_idx int, ts_ms int, blob binary,"
            " mime string, width int, height int"
        ),
    )
    return sampled.select(
        id_col,
        "frame_idx",
        "ts_ms",
        "blob",
        F.struct(
            F.lit("image").alias("modality"),
            F.col("mime").alias("mime"),
            F.col("width").alias("width"),
            F.col("height").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.concat(
                F.lit("mem://frame/"),
                F.col(id_col).cast("string"),
                F.lit("/"),
                F.col("frame_idx").cast("string"),
            ).alias("source_uri"),
        ).cast(BLOB_META_SCHEMA).alias("meta"),
    )


def extract_video_features(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id",
    external: dict | None = None,
) -> DataFrame:
    """Fused decode+featurize in ONE mapInPandas stage (the image/
    audio contract): output is (id, modality, fps, features).
    ``external``: per-format decoder hooks (decode_video_bytes)."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fpss, feats = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                frames, fps = decode_video_bytes(bytes(blob), external)
                ids.append(doc_id)
                fpss.append(fps)
                feats.append(video_features(frames, fps))
            yield pd.DataFrame({id_col: ids, "fps": fpss, "features": feats})

    out = df.mapInPandas(
        _feats, schema=f"{id_col} long, fps int, features array<double>"
    )
    return out.withColumn("modality", F.lit("video"))
