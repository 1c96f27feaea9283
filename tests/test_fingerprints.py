"""Audio/video perceptual fingerprints (multimodal/fingerprints.py):
robustness to re-encode/gain/container changes, discrimination of
different material, and the Spark near-dup pipelines with planted
cross-codec duplicates."""

from __future__ import annotations

import numpy as np
import pytest

from snapflow_spark.multimodal.audio import encode_wav, encode_wav_g711
from snapflow_spark.multimodal.fingerprints import (
    audio_fingerprint64,
    audio_near_dup_pairs,
    video_fingerprint64,
    video_near_dup_pairs,
)

RATE = 16000


def _tone(seed: int, n: int = 8000) -> np.ndarray:
    """Structured audio (noise fingerprints are meaningless): a sum
    of seeded sinusoids with mild AM — different seeds get different
    spectral envelopes."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / RATE
    x = np.zeros(n)
    for _ in range(4):
        f = rng.uniform(300, 3500)
        amp = rng.uniform(2000, 6000)
        am = rng.uniform(1, 5)
        x += amp * np.sin(2 * np.pi * f * t) * (1 + 0.3 * np.sin(2 * np.pi * am * t))
    return np.clip(x, -32768, 32767).astype(np.int16)


def _clip(seed: int, t_frames: int = 6) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:32, 0:32].astype(np.float64)
    frames = []
    for ti in range(t_frames):
        img = np.full((32, 32), 90.0)
        for _ in range(3):
            fx, fy = rng.integers(0, 4, 2)
            img += rng.uniform(30, 60) * np.sin(
                2 * np.pi * (fx * x / 32 + fy * y / 32) + 0.1 * ti
            )
        g = np.clip(img, 0, 255).astype(np.uint8)
        frames.append(np.stack([g, g, 255 - g], axis=-1))
    return np.stack(frames)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_audio_fingerprint_gain_invariant_and_discriminates():
    x = _tone(1)
    h0 = audio_fingerprint64(x, RATE)
    # gain changes: mean-referenced log energies cancel scaling
    assert _ham(h0, audio_fingerprint64((x // 2).astype(np.int16), RATE)) <= 2
    assert _ham(h0, audio_fingerprint64((x // 8).astype(np.int16), RATE)) <= 2
    # G.711 mu-law re-encode (lossy telephony): still near
    from snapflow_spark.multimodal.g711 import mulaw_decode, mulaw_encode

    lossy = mulaw_decode(mulaw_encode(x)).astype(np.int16)
    assert _ham(h0, audio_fingerprint64(lossy, RATE)) <= 10
    # different material: far
    for s in (2, 3, 4):
        assert _ham(h0, audio_fingerprint64(_tone(s), RATE)) >= 12


def test_video_fingerprint_container_robust_and_discriminates():
    from snapflow_spark.multimodal.gif import encode_gif
    from snapflow_spark.multimodal.video import (
        decode_video_bytes,
        encode_avi_mjpeg,
        encode_y4m,
    )

    clip = _clip(1)
    h0 = video_fingerprint64(clip)
    for enc in (lambda c: encode_y4m(c, 10), lambda c: encode_gif(c, 10),
                lambda c: encode_avi_mjpeg(c, 10, quality=90)):
        dec, _fps = decode_video_bytes(enc(clip))
        assert _ham(h0, video_fingerprint64(dec)) <= 8, enc
    for s in (2, 3, 4):
        assert _ham(h0, video_fingerprint64(_clip(s))) >= 14


def test_audio_near_dup_pairs_spark(spark):
    from snapflow_spark.multimodal.flac import encode_flac

    a, b = _tone(10), _tone(11)
    rows = [
        (0, bytearray(encode_wav(a, RATE))),
        (1, bytearray(encode_flac(a, RATE))),          # lossless dup of 0
        (2, bytearray(encode_wav_g711(a, RATE))),      # telephony dup of 0
        (3, bytearray(encode_wav(b, RATE))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    pairs = {
        (r.id_a, r.id_b) for r in audio_near_dup_pairs(df, max_hamming=10).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def _box(typ: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _fake_mp3(seed: int) -> bytes:
    """A blob that magic-sniffs as MP3 (ID3 tag) carrying a seed."""
    return b"ID3" + int(seed).to_bytes(8, "little")


def _fake_mp4(seed: int, codec: bytes = b"avc1") -> bytes:
    """A minimal but REAL ISO-BMFF layout the probe walks: ftyp +
    moov/trak/mdia(hdlr 'vide' + minf/stbl/stsd <codec>), and the
    seed in a trailing free box."""
    import struct

    hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    stsd = _box(
        b"stsd",
        b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">I", 16)
        + codec + b"\x00" * 8,
    )
    trak = _box(
        b"trak", _box(b"mdia", hdlr + _box(b"minf", _box(b"stbl", stsd)))
    )
    return (
        _box(b"ftyp", b"isomiso2")
        + _box(b"moov", trak)
        + _box(b"free", int(seed).to_bytes(8, "little"))
    )


def _make_mp3_decoder():
    """The fake external DSP decoder, built as a SELF-CONTAINED
    closure (cloudpickle ships it by value): a decoder referencing
    this test module by name would hit ModuleNotFoundError on the
    executors — the exact shipping caveat the audio.py docstring
    documents. Reproduces _tone(seed) bit-for-bit."""

    def mp3_decoder(raw: bytes):
        import numpy as np

        rng = np.random.default_rng(
            int.from_bytes(bytes(raw)[3:11], "little")
        )
        t = np.arange(8000) / 16000.0
        x = np.zeros(8000)
        for _ in range(4):
            f = rng.uniform(300, 3500)
            amp = rng.uniform(2000, 6000)
            am = rng.uniform(1, 5)
            x += amp * np.sin(2 * np.pi * f * t) * (
                1 + 0.3 * np.sin(2 * np.pi * am * t)
            )
        return np.clip(x, -32768, 32767).astype(np.int16), 16000

    return mp3_decoder


def _make_mp4_decoder():
    """Self-contained fake MP4 decoder reproducing _clip(seed)."""

    def mp4_decoder(raw: bytes):
        import numpy as np

        seed = int.from_bytes(bytes(raw)[-8:], "little")
        rng = np.random.default_rng(seed)
        y, x = np.mgrid[0:32, 0:32].astype(np.float64)
        frames = []
        for ti in range(6):
            img = np.full((32, 32), 90.0)
            for _ in range(3):
                fx, fy = rng.integers(0, 4, 2)
                img += rng.uniform(30, 60) * np.sin(
                    2 * np.pi * (fx * x / 32 + fy * y / 32) + 0.1 * ti
                )
            g = np.clip(img, 0, 255).astype(np.uint8)
            frames.append(np.stack([g, g, 255 - g], axis=-1))
        return np.stack(frames), 10

    return mp4_decoder


def test_sniff_audio_format():
    from snapflow_spark.multimodal.audio import sniff_audio_format
    from snapflow_spark.multimodal.flac import encode_flac

    assert sniff_audio_format(encode_wav(_tone(1), RATE)) == "wav"
    assert sniff_audio_format(encode_flac(_tone(1), RATE)) == "flac"
    assert sniff_audio_format(_fake_mp3(7)) == "mp3"
    assert sniff_audio_format(b"\xff\xfbXXXX") == "mp3"
    assert sniff_audio_format(b"\xff\xf1XXXX") == "aac"
    assert sniff_audio_format(b"OggSXXXX") == "ogg"
    assert sniff_audio_format(b"garbage!") == "unknown"


def test_external_audio_decoder_runs_full_cascade(spark):
    """VERDICT r5 #4: an external decoder registered for 'mp3' routes
    real-world compressed audio through the ENTIRE fingerprint/dedup
    cascade — cross-format dups (WAV vs decoded-MP3 of the same
    material) are recovered; unregistered runs still fail loudly."""
    from snapflow_spark.multimodal.audio import decode_audio_bytes

    ext = {"mp3": _make_mp3_decoder()}
    # dispatch: registered format decodes, WAV still uses the builtin
    samples, rate = decode_audio_bytes(_fake_mp3(10), ext)
    assert rate == RATE and np.array_equal(samples[:, 0], _tone(10))
    rows = [
        (0, bytearray(encode_wav(_tone(10), RATE))),
        (1, bytearray(_fake_mp3(10))),  # same material, MP3 container
        (2, bytearray(_fake_mp3(10))),  # exact MP3 dup
        (3, bytearray(_fake_mp3(11))),  # different material
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    pairs = {
        (r.id_a, r.id_b)
        for r in audio_near_dup_pairs(df, max_hamming=10, external=ext).collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= pairs
    assert not any(3 in p for p in pairs)
    # without the hook the raise survives unchanged (no silent skip)
    with pytest.raises(Exception) as ei:
        audio_near_dup_pairs(df, max_hamming=10).collect()
    assert "compressed audio" in str(ei.value)


def test_external_video_decoder_runs_full_cascade(spark):
    """Same hook on the video side: probe-derived keys route MP4 to a
    user decoder, most specific (track fourcc) first."""
    from snapflow_spark.multimodal.video import (
        _external_video_keys,
        decode_video_bytes,
    )

    mp4_decoder = _make_mp4_decoder()
    blob = _fake_mp4(10)
    assert _external_video_keys(blob) == ["avc1", "mp4"]
    # codec-specific key wins over the container key
    frames, fps = decode_video_bytes(
        blob, {"avc1": mp4_decoder, "mp4": _fail_decoder}
    )
    assert fps == 10 and np.array_equal(frames, _clip(10))
    ext = {"mp4": mp4_decoder}
    rows = [
        (0, bytearray(encode_y4m_for_test(_clip(10)))),
        (1, bytearray(_fake_mp4(10))),
        (2, bytearray(_fake_mp4(10))),
        (3, bytearray(_fake_mp4(11))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    pairs = {
        (r.id_a, r.id_b)
        for r in video_near_dup_pairs(df, max_hamming=8, external=ext).collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= pairs
    assert not any(3 in p for p in pairs)
    with pytest.raises(Exception) as ei:
        video_near_dup_pairs(df, max_hamming=8).collect()
    assert "compressed video" in str(ei.value)


def _fail_decoder(raw: bytes):
    raise AssertionError("less-specific key must not be consulted")


def encode_y4m_for_test(clip):
    from snapflow_spark.multimodal.video import encode_y4m

    return encode_y4m(clip, 10)


def test_external_decoder_output_validation():
    """Garbage from a plugged-in decoder fails loudly with the
    registry key, never flows into features."""
    from snapflow_spark.multimodal.audio import decode_audio_bytes
    from snapflow_spark.multimodal.video import decode_video_bytes

    with pytest.raises(ValueError, match="'mp3'"):
        decode_audio_bytes(_fake_mp3(1), {"mp3": lambda b: "nope"})
    with pytest.raises(ValueError, match="non-empty"):
        decode_audio_bytes(
            _fake_mp3(1), {"mp3": lambda b: (np.zeros((0,)), 16000)}
        )
    with pytest.raises(ValueError, match="'mp4'"):
        decode_video_bytes(_fake_mp4(1), {"mp4": lambda b: ("x",)})
    with pytest.raises(ValueError, match="T, H, W"):
        decode_video_bytes(
            _fake_mp4(1), {"mp4": lambda b: (np.zeros((2, 2)), 10)}
        )
    # float samples are NORMALIZED [-1,1] by convention (soundfile/
    # librosa) and scale onto int16 — clip-rounding raw floats would
    # collapse every clip to near-silence and mass false dups
    from snapflow_spark.multimodal.audio import decode_audio_bytes as dab

    s, r = dab(_fake_mp3(1), {"mp3": lambda b: (np.array([0.5, -1.0, 2.0]), 8000)})
    assert s.dtype == np.int16 and r == 8000
    assert s[:, 0].tolist() == [16384, -32767, 32767]  # scaled + clipped
    # wide-int samples requantize with a uniform shift (never
    # saturate — see test_wide_pcm_requantizes_never_wraps_or_saturates)
    s, _ = dab(_fake_mp3(1), {"mp3": lambda b: (np.array([100, 70000]), 8000)})
    assert s[:, 0].tolist() == [25, 17500]  # >> 2, shape preserved
    # in-range ints pass through bit-identical
    s, _ = dab(_fake_mp3(1), {"mp3": lambda b: (np.array([100, -32768]), 8000)})
    assert s[:, 0].tolist() == [100, -32768]
    # float frames in [0,1] scale onto uint8 (skimage/torch convention)
    from snapflow_spark.multimodal.video import decode_video_bytes as dvb

    f, fps = dvb(
        _fake_mp4(1), {"mp4": lambda b: (np.full((2, 4, 4, 3), 0.5), 10)}
    )
    assert f.dtype == np.uint8 and int(f[0, 0, 0, 0]) == 128
    # CRC-protected MPEG sync bytes route to the registered decoders
    from snapflow_spark.multimodal.audio import sniff_audio_format

    assert sniff_audio_format(b"\xff\xfaXX") == "mp3"  # L3 + CRC
    assert sniff_audio_format(b"\xff\xf0XX") == "aac"  # ADTS + CRC
    assert sniff_audio_format(b"\xff\xf8XX") == "aac"


def test_video_near_dup_pairs_spark(spark):
    from snapflow_spark.multimodal.gif import encode_gif
    from snapflow_spark.multimodal.video import encode_avi_mjpeg, encode_y4m

    c1, c2 = _clip(10), _clip(11)
    rows = [
        (0, bytearray(encode_y4m(c1, 10))),
        (1, bytearray(encode_gif(c1, 10))),            # palette re-encode
        (2, bytearray(encode_avi_mjpeg(c1, 10, quality=90))),  # MJPEG
        (3, bytearray(encode_y4m(c2, 10))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    pairs = {
        (r.id_a, r.id_b) for r in video_near_dup_pairs(df, max_hamming=8).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_external_decoders_thread_through_feature_stages(spark):
    """The hook reaches every fused stage, not just the dedup cascade:
    extract_audio_features and sample_frames decode registered formats
    through the same closure-shipped mapping."""
    from snapflow_spark.multimodal.audio import (
        AUDIO_FEATURE_DIM,
        extract_audio_features,
    )
    from snapflow_spark.multimodal.video import sample_frames

    ext_a = {"mp3": _make_mp3_decoder()}
    df = spark.createDataFrame(
        [(0, bytearray(_fake_mp3(21)))], "doc_id bigint, blob binary"
    )
    (row,) = extract_audio_features(df, external=ext_a).collect()
    assert row.sample_rate == 16000 and len(row.features) == AUDIO_FEATURE_DIM
    assert row.modality == "audio" and row.features[0] == 500.0  # 8000/16k ms

    ext_v = {"mp4": _make_mp4_decoder()}
    vdf = spark.createDataFrame(
        [(1, bytearray(_fake_mp4(22)))], "doc_id bigint, blob binary"
    )
    frames = sample_frames(vdf, every_n=2, external=ext_v).collect()
    # 6-frame clip sampled every 2nd -> 3 first-class image rows
    assert [r.frame_idx for r in frames] == [0, 2, 4]
    assert all(r.meta.modality == "image" and r.meta.width == 32 for r in frames)
