"""Audio columns (SURVEY.md §2.B.11 multimodal): WAV/PCM payloads as
opaque BINARY columns + typed metadata, processed in mapInPandas —
the audio twin of the image path in columns.py.

The codecs are REAL: RIFF/WAVE PCM16 is a pure header-plus-samples
format, and FLAC (round 5, multimodal/flac.py) is lossless entropy
coding implementable with numpy alone — the format LibriSpeech-style
speech corpora actually ship. ``decode_audio_bytes`` dispatches on
magic; DSP-decoder formats (MP3/AAC/OGG) raise NotImplementedError
explicitly UNLESS the caller supplies an external decoder for the
sniffed format (round 6): ``external={"mp3": fn}`` with
``fn(bytes) -> ((n[, ch]) int16 ndarray, sample_rate)`` — the hook
the jpeg.py perf note promises for images. The callable ships to
executors inside each mapInPandas closure, so it must RESOLVE
there: either a function from a library importable on the workers
(the production case — an ffmpeg/miniaudio binding), or a
self-contained closure cloudpickle serializes by value; a
module-level function from a driver-only script fails with
ModuleNotFoundError on the executors. This shipping constraint is
also why registration is an explicit argument threaded through the
operators — a module-global registry mutated on the driver would
silently not exist in the worker interpreters.

At 100 TB the shape matches images: blobs ride in parquet binary
columns, decode FUSES with featurization in one Arrow-batched
mapInPandas stage (raw samples never hit storage or shuffle), and
worker memory is bounded by the Arrow batch size.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snapflow_spark.multimodal.columns import BLOB_META_SCHEMA

# [duration_ms, n_channels, rms, peak, mean, zero_crossing_rate]
AUDIO_FEATURE_DIM = 6


def sniff_audio_format(data: bytes) -> str:
    """Best-effort format name from magic bytes: 'wav', 'flac',
    'mp3' (ID3 tag or MPEG frame sync), 'aac' (ADTS sync), 'ogg',
    else 'unknown'. The name doubles as the ``external`` decoder
    registry key in decode_audio_bytes."""
    data = bytes(data[:12])
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:3] == b"ID3":
        return "mp3"
    if data[:4] == b"OggS":
        return "ogg"
    # MPEG audio frame sync: 0xFF then top-3 bits set. The layer
    # field (bits 2-1 of the second byte) separates the families:
    # layer 00 is ADTS AAC, anything else is MPEG-1/2/2.5 audio
    # ("mp3") — this covers CRC-protected frames (0xFFFA, 0xFFF0/F8)
    # that a fixed byte list missed.
    if len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
        return "aac" if (data[1] >> 1) & 0x3 == 0 else "mp3"
    return "unknown"


def _validate_external_audio(
    out, fmt: str
) -> tuple[np.ndarray, int]:
    """Normalize an external decoder's return to the engine-wide
    ((n, ch) int16, rate) PCM contract, failing with the format name
    on malformed output (garbage from a plugged-in decoder must not
    flow silently into features/fingerprints)."""
    try:
        samples, rate = out
    except (TypeError, ValueError):
        raise ValueError(
            f"external {fmt!r} decoder must return (samples, sample_rate)"
        ) from None
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.size == 0 or not np.issubdtype(a.dtype, np.number):
        raise ValueError(
            f"external {fmt!r} decoder returned shape {a.shape}: "
            "expected non-empty (n,) or (n, ch) numeric samples"
        )
    if np.issubdtype(a.dtype, np.floating):
        # float samples are NORMALIZED [-1, 1] by near-universal
        # convention (soundfile/librosa/miniaudio — and decode_wav's
        # own IEEE-float branch): scale onto the engine's int16 PCM
        # carrier. Clip-rounding raw floats instead would collapse
        # every such clip to {-1,0,1} near-silence and near-identical
        # fingerprints — silent mass false-dup territory.
        a = np.clip(np.round(a * 32767.0), -32768, 32767).astype(np.int16)
    elif a.dtype != np.int16:
        # integer PCM wider than int16 (an ffmpeg s32 binding):
        # requantize with a uniform shift — clipping full-scale int32
        # would saturate every sample into a ±32767 square wave, the
        # same false-dup failure the float branch guards against
        a = _requantize_int16(a.astype(np.int64))
    return a, int(rate)


def _requantize_int16(a: np.ndarray) -> np.ndarray:
    """Integer samples of any width -> int16 by the minimal uniform
    right-shift that fits (shape-preserving gain step, never
    saturation); already-in-range input (including -32768, whose
    absolute value alone would mislead a plain peak check) passes
    through unchanged."""
    lo = int(a.min(initial=0))
    hi = int(a.max(initial=0))
    if lo >= -32768 and hi <= 32767:
        return a.astype(np.int16)
    shift = max(hi, -lo - 1).bit_length() - 15
    return (a >> shift).astype(np.int16)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> RIFF/WAVE PCM16 bytes."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"encode_wav expects (n,) or (n, ch), got {a.shape}")
    n, ch = a.shape
    data = a.reshape(-1).tobytes()  # interleaved frames
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_g711(
    samples: np.ndarray, sample_rate: int = 8000, law: str = "mulaw"
) -> bytes:
    """(n,) or (n, ch) int16 -> RIFF/WAVE with G.711 companding
    (format 7 µ-law / 6 A-law, 8 bits per sample): the telephony WAV
    flavor. Includes the fact chunk compressed formats require."""
    from snapflow_spark.multimodal.g711 import alaw_encode, mulaw_encode

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if law not in ("mulaw", "alaw"):
        raise ValueError(f"law must be 'mulaw' or 'alaw', got {law!r}")
    tag, enc = (7, mulaw_encode) if law == "mulaw" else (6, alaw_encode)
    data = enc(a.reshape(-1))
    fmt = struct.pack("<HHIIHHH", tag, ch, sample_rate, sample_rate * ch, ch, 8, 0)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, n)
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int = 8000, samples_per_block: int = 257
) -> bytes:
    """(n,) or (n, ch) int16 -> RIFF/WAVE IMA ADPCM (format 0x11,
    4 bits per sample): block headers + nibble words, the fact chunk
    carrying the true frame count (the tail block is zero-padded)."""
    from snapflow_spark.multimodal.g711 import ima_adpcm_encode

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data, block_align = ima_adpcm_encode(a, samples_per_block)
    avg = max(1, (sample_rate * block_align + samples_per_block - 1) // samples_per_block)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, ch, sample_rate, avg, block_align, 4, 2, samples_per_block
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, n)
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_float(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 32
) -> bytes:
    """(n,) or (n, ch) int16 -> IEEE-float WAV (format 3, 32/64-bit),
    samples scaled to [-1, 1] — the DAW/scientific flavor."""
    if bits not in (32, 64):
        # anything else would write float64 payload under a lying
        # header (decode_wav and every external reader misparse it)
        raise ValueError(f"IEEE-float WAV bits must be 32 or 64: {bits}")
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    dt = np.float32 if bits == 32 else np.float64
    data = (a.reshape(-1).astype(dt) / dt(32767.0)).tobytes()
    width = bits // 8
    fmt = struct.pack(
        "<HHIIHHH", 3, ch, sample_rate, sample_rate * ch * width, ch * width, bits, 0
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, n)
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> ((n, channels) int16, sample_rate). Walks the
    chunk list (extra chunks like LIST are skipped). Formats: PCM16
    (1), IEEE float 32/64 (3, scaled+clipped to int16), G.711 A-law
    (6) / µ-law (7), IMA ADPCM (0x11), and the WAVE_FORMAT_EXTENSIBLE
    (0xFFFE) wrapper resolving to any of these — rounds 5;
    other-compressed raise naming the format code."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        if data[:4] == b"fLaC":
            raise ValueError(
                "FLAC stream: decode via decode_audio_bytes (the "
                "dispatching entry point) or multimodal.flac.decode_flac"
            )
        # compare each magic at its own length — the prefixes range
        # from 2 bytes (MP3 frame sync) to 4 (OggS)
        fmt_name = sniff_audio_format(data)
        if fmt_name in ("mp3", "aac", "ogg"):
            # the ONE sniffing rule (frame-sync + layer bits) — a
            # stale magic list here mislabeled ADTS AAC / CRC MP3 as
            # "not a RIFF/WAVE file" instead of the promised
            # NotImplementedError naming the format
            detail = fmt_name
            if fmt_name == "ogg":
                # round 8: the OGG probe names the ACTUAL codec inside
                # the container ('ogg: opus 48000 Hz 2ch 12.5s') so
                # triage knows WHICH external decoder to register
                from snapflow_spark.multimodal.probe import probe_summary

                detail = f"ogg: {probe_summary(data)}"
            raise NotImplementedError(
                f"compressed audio ({detail}) needs a DSP decoder not "
                "implementable with numpy alone; register an external "
                "decoder via decode_audio_bytes(data, external=...)"
            )
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    fmt = None
    pcm = None
    n_frames = None
    n = len(data)
    while i + 8 <= n:
        tag = data[i : i + 4]
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        payload = data[i + 8 : i + 8 + size]
        if tag == b"fmt ":
            fmt = payload
        elif tag == b"data":
            pcm = payload
        elif tag == b"fact" and size >= 4:
            n_frames = int.from_bytes(payload[:4], "little")
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, sample_rate, _br, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format == 0xFFFE and len(fmt) >= 40:
        # WAVE_FORMAT_EXTENSIBLE: the real format is the first two
        # bytes of the SubFormat GUID (the rest is the fixed KSDATA
        # media-subtype suffix) — modern writers emit this wrapper
        # for anything beyond vanilla mono/stereo PCM. The Samples
        # field at fmt[18:20] is a UNION (wValidBitsPerSample for
        # PCM, wSamplesPerBlock for block codecs), which is exactly
        # where the ADPCM branch below reads samples_per_block.
        audio_format = struct.unpack("<H", fmt[24:26])[0]
    if ch < 1:
        raise ValueError("WAV fmt chunk declares zero channels")
    if audio_format == 3 and bits in (32, 64):
        # IEEE float WAV: normalized [-1, 1] floats -> int16 (the
        # engine-wide PCM carrier), clipping out-of-range samples
        # like every converter does
        dt = "<f4" if bits == 32 else "<f8"
        width = bits // 8
        flat = np.frombuffer(pcm, dtype=dt, count=len(pcm) // width)
        scaled = np.clip(np.round(flat * 32767.0), -32768, 32767).astype(np.int16)
        out = scaled.reshape(-1, ch)
        return (out[:n_frames] if n_frames is not None else out).copy(), sample_rate
    if audio_format == 1 and bits == 16:
        frames = np.frombuffer(pcm, dtype="<i2", count=len(pcm) // 2)
        return frames.reshape(-1, ch).copy(), sample_rate
    if audio_format in (6, 7) and bits == 8:
        from snapflow_spark.multimodal.g711 import alaw_decode, mulaw_decode

        dec = mulaw_decode if audio_format == 7 else alaw_decode
        flat = dec(pcm[: (len(pcm) // ch) * ch])
        out = flat.reshape(-1, ch)
        return (out[:n_frames] if n_frames is not None else out).copy(), sample_rate
    if audio_format == 0x11:
        from snapflow_spark.multimodal.g711 import ima_adpcm_decode_block

        if len(fmt) < 20:
            raise ValueError("IMA ADPCM fmt chunk missing samples_per_block")
        spb = int.from_bytes(fmt[18:20], "little")
        if spb < 2 or block_align < 4 * ch + 4:
            raise ValueError(
                f"implausible IMA ADPCM layout (samples_per_block={spb}, "
                f"block_align={block_align}, channels={ch})"
            )
        blocks = [
            ima_adpcm_decode_block(pcm[j : j + block_align], ch, spb)
            for j in range(0, (len(pcm) // block_align) * block_align, block_align)
        ]
        if not blocks:
            raise ValueError("IMA ADPCM data shorter than one block")
        out = np.concatenate(blocks, axis=0)
        return (out[:n_frames] if n_frames is not None else out).copy(), sample_rate
    raise ValueError(
        "unsupported WAV codec (format="
        f"{audio_format}, bits={bits}); supported: PCM16, G.711 "
        "A-law/µ-law, IMA ADPCM"
    )


def decode_audio_bytes(
    data: bytes, external: dict | None = None
) -> tuple[np.ndarray, int]:
    """Magic-sniffing audio decode: RIFF/WAVE -> decode_wav, fLaC ->
    flac.decode_flac (int32 PCM; 16-bit streams fit int16 exactly).
    The single entry point the feature/resample stages use, mirroring
    the image side's decode_image_bytes.

    ``external`` maps sniff_audio_format names to user decoders
    (``fn(bytes) -> (samples, rate)``, e.g. an ffmpeg/miniaudio
    binding) and is consulted FIRST for its registered formats — so
    production can route MP3/OGG/AAC (or even swap the WAV/FLAC
    paths for a C decoder) while unregistered compressed formats
    keep raising the explicit NotImplementedError."""
    data = bytes(data)
    if external:
        fmt = sniff_audio_format(data)
        fn = external.get(fmt)
        if fn is not None:
            return _validate_external_audio(fn(data), fmt)
    if data[:4] == b"fLaC":
        from snapflow_spark.multimodal.flac import decode_flac

        return decode_flac(data)
    return decode_wav(data)


def synthesize_audio(
    seed_bytes: bytes, n_samples: int = 1600, channels: int = 1
) -> np.ndarray:
    """Deterministic (n, ch) int16 PCM from a byte seed — blake2b in
    counter mode (the synthesize_image recipe), reproducible anywhere."""
    import hashlib

    need = n_samples * channels * 2
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.blake2b(
            seed_bytes + counter.to_bytes(4, "little"), digest_size=64
        ).digest()
        counter += 1
    return (
        np.frombuffer(bytes(out[:need]), dtype="<i2")
        .reshape(n_samples, channels)
        .copy()
    )


def audio_features(samples: np.ndarray, sample_rate: int) -> list[float]:
    """AUDIO_FEATURE_DIM stats of one decoded clip, on float samples
    normalized to [-1, 1]: duration_ms, n_channels, rms, peak, mean,
    zero-crossing rate (channel-mean, sign changes per sample)."""
    a = np.asarray(samples, dtype=np.float64)
    # full-scale normalization by CARRIER WIDTH, not blindly int16:
    # decode_flac returns int32 for 20/24-bit streams (its documented
    # contract), and dividing those by 32768 put rms/peak up to 256x
    # outside the [-1, 1] feature scale. Width ladder in whole bytes
    # (16 -> 24 -> 32 bit) keeps 16-bit features bit-identical.
    peak = float(np.abs(a).max(initial=0.0))
    scale = 32768.0
    # strict > : the full-scale NEGATIVE sample (-32768 int16, -2^23
    # int24) has abs() exactly equal to the carrier scale and must stay
    # on its rung (normalizing to exactly -1.0), not bump to the next
    # width and shrink every feature 256x.
    while peak > scale and scale < 2147483648.0:
        scale *= 256.0
    a = a / scale
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    duration_ms = 1000.0 * n / sample_rate
    signs = np.signbit(a)
    zcr = float(np.mean(signs[1:] != signs[:-1])) if n > 1 else 0.0
    return [
        float(duration_ms),
        float(ch),
        float(np.sqrt(np.mean(a**2))),
        float(np.max(np.abs(a))),
        float(np.mean(a)),
        zcr,
    ]


def attach_audio_blob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_samples: int = 1600,
    sample_rate: int = 16000,
) -> DataFrame:
    """Deterministic REAL audio payload per row (synthesized PCM from
    the text bytes; stereo for every third id so both channel layouts
    are exercised; the container/codec rotation ships every fifth id
    as FLAC, 5k+1 as G.711 µ-law WAV and 5k+3 as IMA ADPCM WAV
    (round 5, the lossy telephony members — features downstream are
    statistics of the decoded PCM, deterministic either way), the
    rest as PCM16 WAV), plus the shared metadata struct."""

    def _blobs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from snapflow_spark.multimodal.flac import encode_flac

        for pdf in batches:
            out = pdf.copy()
            blobs = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ch = 2 if int(doc_id) % 3 == 0 else 1
                pcm = synthesize_audio(
                    str(text or "").encode("utf-8"), n_samples=n_samples, channels=ch
                )
                pick = int(doc_id) % 5
                if pick == 4:
                    blobs.append(encode_flac(pcm, sample_rate))
                elif pick == 1:
                    blobs.append(encode_wav_g711(pcm, sample_rate, law="mulaw"))
                elif pick == 3:
                    blobs.append(encode_wav_adpcm(pcm, sample_rate))
                else:
                    blobs.append(encode_wav(pcm, sample_rate))
            out["blob"] = blobs
            yield out

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["blob binary"]
    )
    with_blob = df.mapInPandas(_blobs, schema=schema)
    duration_ms = int(round(1000.0 * n_samples / sample_rate))
    return with_blob.withColumn(
        "meta",
        F.struct(
            F.lit("audio").alias("modality"),
            F.when(F.pmod(F.col(id_col), F.lit(5)) == 4, F.lit("audio/flac"))
            .otherwise(F.lit("audio/wav"))
            .alias("mime"),
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            F.lit(duration_ms).cast("int").alias("duration_ms"),
            F.concat(F.lit("mem://audio/"), F.col(id_col).cast("string")).alias(
                "source_uri"
            ),
        ).cast(BLOB_META_SCHEMA),
    )


def extract_audio_features(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id",
    external: dict | None = None,
) -> DataFrame:
    """Fused decode+featurize in ONE mapInPandas stage (the image
    extract_features contract): decoded samples never leave the
    worker; output is (id, modality, sample_rate, features).
    ``external``: per-format decoder hooks (decode_audio_bytes),
    captured by the closure and shipped to executors."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, feats = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                samples, rate = decode_audio_bytes(bytes(blob), external)
                ids.append(doc_id)
                rates.append(rate)
                feats.append(audio_features(samples, rate))
            yield pd.DataFrame(
                {id_col: ids, "sample_rate": rates, "features": feats}
            )

    out = df.mapInPandas(
        _feats, schema=f"{id_col} long, sample_rate int, features array<double>"
    )
    return out.withColumn("modality", F.lit("audio"))


def resample_audio(
    df: DataFrame, target_rate: int, blob_col: str = "blob",
    external: dict | None = None,
) -> DataFrame:
    """Nearest-neighbor resample to target_rate inside mapInPandas,
    re-encoded as WAV — the audio twin of resize_images. Schema- and
    meta-preserving except duration-invariant rate change.
    ``external``: per-format decoder hooks (decode_audio_bytes);
    externally-decoded formats re-encode as PCM WAV."""

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            blobs = []
            for b in pdf[blob_col]:
                raw = bytes(b)
                samples, rate = decode_audio_bytes(raw, external)
                n = samples.shape[0]
                m = max(1, int(round(n * target_rate / rate)))
                idx = np.minimum((np.arange(m) * n) // m, n - 1)
                # decode_flac yields int32 for 20/24-bit streams; a
                # bare astype(int16) would WRAP those mod 2^16 into
                # garbage — requantize with a uniform shift instead
                samples = _requantize_int16(np.asarray(samples, np.int64))
                if raw[:4] == b"fLaC":
                    # re-encode in the SOURCE container so the row's
                    # mime metadata stays truthful (16-bit streams:
                    # int32 decode values fit int16 exactly)
                    from snapflow_spark.multimodal.flac import encode_flac

                    blobs.append(encode_flac(samples[idx], target_rate))
                else:
                    blobs.append(encode_wav(samples[idx], target_rate))
            out[blob_col] = blobs
            yield out

    return df.mapInPandas(_resample, schema=df.schema)
