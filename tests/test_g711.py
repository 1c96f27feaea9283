"""G.711 µ-law/A-law + IMA ADPCM codecs (multimodal/g711.py) and
their WAV container forms (audio.py formats 6/7/0x11). Spark-free."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from snapflow_spark.multimodal.audio import (
    decode_audio_bytes,
    decode_wav,
    encode_wav_adpcm,
    encode_wav_g711,
    synthesize_audio,
)
from snapflow_spark.multimodal.g711 import (
    _ALAW,
    _MULAW,
    alaw_decode,
    alaw_encode,
    ima_adpcm_decode_block,
    ima_adpcm_encode,
    mulaw_decode,
    mulaw_encode,
)


# ------------------------------------------------------------------ #
# G.711 tables pinned to the ITU reference values
# ------------------------------------------------------------------ #
def test_mulaw_table_reference_values():
    # canonical Sun/CCITT ulaw2linear anchor points
    assert _MULAW[0x00] == -32124  # most negative
    assert _MULAW[0x80] == 32124  # most positive
    assert _MULAW[0xFF] == 0
    assert _MULAW[0x7F] == -1 or _MULAW[0x7F] == 0  # ±0 pair
    assert int(np.max(_MULAW)) == 32124 and int(np.min(_MULAW)) == -32124


def test_alaw_table_reference_values():
    assert int(np.max(_ALAW)) == 32256 and int(np.min(_ALAW)) == -32256
    # code 0x55 (xor -> 0) is the smallest negative magnitude: -8
    assert _ALAW[0x55] == -8
    assert _ALAW[0xD5] == 8


def test_g711_decode_encode_idempotent():
    # every reconstruction level maps back to a code decoding to itself
    for dec, enc in ((mulaw_decode, mulaw_encode), (alaw_decode, alaw_encode)):
        levels = dec(bytes(range(256)))
        again = dec(enc(levels))
        assert np.array_equal(again, levels)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=300))
def test_g711_quantization_error_bounded(xs):
    x = np.array(xs, dtype=np.int16)
    for dec, enc, worst in (
        (mulaw_decode, mulaw_encode, 16 * 256),  # top µ-law segment step
        (alaw_decode, alaw_encode, 1024),  # top A-law segment step
    ):
        y = dec(enc(x)).astype(np.int32)
        err = np.abs(y - x.astype(np.int32))
        # nearest-level quantization: error <= half the local step,
        # bounded by half the widest step (plus clip at the rails)
        assert int(err.max()) <= worst // 2 + 1


# ------------------------------------------------------------------ #
# IMA ADPCM
# ------------------------------------------------------------------ #
def test_adpcm_silence_and_first_sample_exact():
    pcm = np.zeros((257, 1), np.int16)
    pcm[0] = 1234
    data, ba = ima_adpcm_encode(pcm)
    out = ima_adpcm_decode_block(data, 1, 257)
    assert out[0, 0] == 1234  # header carries sample 0 verbatim


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=1, max_value=600),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_adpcm_wav_roundtrip_tracks_smooth_signals(ch, n, seed):
    # ADPCM is differential: on a smooth (low-slope) signal the
    # reconstruction stays within a small absolute error
    t = np.arange(n * ch, dtype=np.float64).reshape(n, ch)
    rng = np.random.default_rng(seed)
    phase = rng.uniform(0, 2 * np.pi, size=ch)
    pcm = (2000 * np.sin(0.01 * t + phase)).astype(np.int16)
    blob = encode_wav_adpcm(pcm, 8000)
    out, rate = decode_wav(blob)
    assert rate == 8000
    assert out.shape == pcm.shape  # fact chunk trims the padded tail
    err = np.abs(out.astype(np.int32) - pcm.astype(np.int32))
    assert int(err.max()) <= 64


def test_adpcm_multi_block_and_stereo_layout():
    rng = np.random.default_rng(3)
    pcm = (1000 * np.sin(0.02 * np.arange(1200))).astype(np.int16)
    stereo = np.stack([pcm, pcm[::-1]], axis=1)
    out, rate = decode_wav(encode_wav_adpcm(stereo, 16000))
    assert out.shape == stereo.shape
    err = np.abs(out.astype(np.int32) - stereo.astype(np.int32))
    assert int(err.max()) <= 64


def test_adpcm_bad_index_raises():
    import struct

    blk = struct.pack("<hBB", 0, 99, 0) + b"\x00" * 4
    with pytest.raises(ValueError, match="out of range"):
        ima_adpcm_decode_block(blk, 1, 9)


def test_adpcm_oversized_samples_per_block_truncates_not_garbage():
    """A malformed fmt chunk declaring more samples_per_block than the
    block's nibbles can supply must yield only decoded rows (the
    docstring's 'or fewer'), never uninitialized memory."""
    import struct

    # header + 4 data bytes = 8 nibbles -> at most 9 samples
    blk = struct.pack("<hBB", 100, 0, 0) + b"\x11\x22\x33\x44"
    out = ima_adpcm_decode_block(blk, 1, samples_per_block=1000)
    assert out.shape == (9, 1)
    assert out[0, 0] == 100
    # deterministic: decoding twice is bit-identical (np.empty garbage
    # would differ across runs/allocations)
    again = ima_adpcm_decode_block(blk, 1, samples_per_block=1000)
    assert np.array_equal(out, again)


# ------------------------------------------------------------------ #
# WAV container forms
# ------------------------------------------------------------------ #
def test_g711_wav_roundtrip_mono_stereo():
    for ch in (1, 2):
        pcm = synthesize_audio(b"g711", n_samples=333, channels=ch)
        for law in ("mulaw", "alaw"):
            blob = encode_wav_g711(pcm, 8000, law=law)
            out, rate = decode_wav(blob)
            assert rate == 8000 and out.shape == pcm.shape
            dec = mulaw_decode if law == "mulaw" else alaw_decode
            exp = dec((mulaw_encode if law == "mulaw" else alaw_encode)(pcm))
            assert np.array_equal(out, exp.reshape(-1, ch))
            # dispatcher handles it too (RIFF magic)
            out2, _ = decode_audio_bytes(blob)
            assert np.array_equal(out2, out)


def test_unsupported_wav_format_still_raises():
    import struct

    # GSM 6.10 (0x31): a true DSP codec, out of honest numpy reach
    fmt = struct.pack("<HHIIHH", 0x31, 1, 8000, 1625, 65, 0)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="unsupported WAV codec"):
        decode_wav(blob)


# ------------------------------------------------------------------ #
# Round-6 review fixes (audio-side)
# ------------------------------------------------------------------ #
def test_wide_pcm_requantizes_never_wraps_or_saturates():
    """int32 PCM (decode_flac's 20/24-bit contract, ffmpeg s32
    bindings) requantizes with a uniform shift: no mod-2^16 wrap, no
    square-wave saturation, features stay on the [-1, 1] scale."""
    from snapflow_spark.multimodal.audio import (
        _requantize_int16,
        _validate_external_audio,
        audio_features,
    )

    wave = (100_000 * np.sin(0.05 * np.arange(2000))).astype(np.int64)
    q = _requantize_int16(wave)
    assert q.dtype == np.int16
    # shape preserved (correlation ~1), not wrapped/saturated
    c = np.corrcoef(q.astype(np.float64), wave.astype(np.float64))[0, 1]
    assert c > 0.999 and int(np.abs(q).max()) <= 32767
    assert (np.abs(q) >= 32700).mean() < 0.05  # not a clipped square
    # int16-range input passes through bit-identical
    small = np.arange(-100, 100, dtype=np.int64)
    assert np.array_equal(_requantize_int16(small), small.astype(np.int16))
    # feature scaling: 24-bit-scale samples stay within [-1, 1]
    feats = audio_features(wave.reshape(-1, 1) * 64, 16000)  # ~23-bit peak
    assert feats[3] <= 1.0  # peak
    # external int decoder path uses the same requantize
    s, _ = _validate_external_audio((wave * 20000, 16000), "mp3")
    assert int(np.abs(s).max()) <= 32767 and (np.abs(s) >= 32700).mean() < 0.05


def test_compressed_audio_raise_names_the_format():
    """decode_wav's unsupported-format path shares sniff_audio_format:
    ADTS AAC and CRC MP3 sync variants get the promised
    NotImplementedError, not 'not a RIFF/WAVE file'."""
    from snapflow_spark.multimodal.audio import decode_audio_bytes

    for blob, name in ((b"\xff\xf1AAC?", "aac"), (b"\xff\xfaMP3?", "mp3"),
                       (b"OggSxxxx", "ogg"), (b"ID3\x04rest", "mp3")):
        with pytest.raises(NotImplementedError, match=name):
            decode_audio_bytes(blob)
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_audio_bytes(b"garbage!")


def test_float_wav_bits_validated():
    from snapflow_spark.multimodal.audio import encode_wav_float

    with pytest.raises(ValueError, match="32 or 64"):
        encode_wav_float(np.zeros(8, np.int16), bits=16)


def test_full_scale_negative_sample_stays_on_its_carrier_rung():
    """ADVICE r6: abs(-32768) == the 16-bit scale exactly; the carrier
    ladder must use strict >, else a clip containing int16 min is
    normalized as 24-bit and every feature shrinks 256x, so
    near-identical loud clips land far apart in feature space."""
    from snapflow_spark.multimodal.audio import audio_features

    hot = np.array([-32768, 100, -5, 7], dtype=np.int64)
    near = np.array([-32767, 100, -5, 7], dtype=np.int64)
    f_hot = audio_features(hot, 16000)
    f_near = audio_features(near, 16000)
    assert f_hot[3] == 1.0  # peak normalizes to exactly |-1.0|
    assert abs(f_hot[3] - f_near[3]) < 1e-4
    assert abs(f_hot[2] - f_near[2]) < 1e-4  # rms agrees too
    # 24-bit full-scale negative stays on the 24-bit rung the same way
    hot24 = np.array([-(2**23), 1000], dtype=np.int64)
    assert audio_features(hot24, 16000)[3] == 1.0
