"""MPEG audio frame-walk probe (multimodal/mpeg_probe.py): exact
frame math on hand-built MP3 and ADTS streams, ID3v2 skip, VBR
detection, defensive degradation. Spark-free."""

from __future__ import annotations

from snapflow_spark.multimodal.mpeg_probe import probe_mpeg_audio


def mp3_frame(br_idx=9, sr_idx=0, pad=0, mode=0):
    """MPEG-1 Layer III frame: 144 * bitrate / rate + pad bytes."""
    rates = (44100, 48000, 32000)
    brs = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    n = 144 * brs[br_idx] * 1000 // rates[sr_idx] + pad
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2) | (pad << 1),
                 mode << 6])
    return hdr + b"\x00" * (n - 4)


def adts_frame(payload=100, sr_idx=4, chan=2, profile=1):
    L = 7 + payload
    hdr = bytes([
        0xFF, 0xF1,
        (profile << 6) | (sr_idx << 2) | ((chan >> 2) & 1),
        ((chan & 3) << 6) | ((L >> 11) & 3),
        (L >> 3) & 0xFF,
        ((L & 7) << 5) | 0x1F,
        0xFC,  # fullness low 6 bits + frames-1 = 0
    ])
    return hdr + b"\x00" * payload


def test_mp3_cbr_duration_exact():
    blob = mp3_frame() * 10
    got = probe_mpeg_audio(blob)
    assert got["format"] == "mp3" and got["version"] == "1" and got["layer"] == 3
    assert got["sample_rate"] == 44100 and got["channels"] == 2
    assert got["n_frames"] == 10
    assert got["duration_sec"] == round(10 * 1152 / 44100, 3)
    assert got["vbr"] is False and got["trailing_bytes"] == 0
    # duration-weighted average ~ 128 kbps (frame-size rounding)
    assert abs(got["bitrate_kbps"] - 128) < 2


def test_mp3_vbr_and_padding_and_mono():
    blob = (mp3_frame(9) + mp3_frame(11, pad=1) + mp3_frame(9, mode=3)) * 2
    got = probe_mpeg_audio(blob)
    assert got["vbr"] is True and got["n_frames"] == 6
    assert 128 < got["bitrate_kbps"] < 192
    # channels reported from the FIRST frame (stereo here)
    assert got["channels"] == 2


def test_id3v2_skip_and_trailing_tag():
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    blob = id3 + mp3_frame() * 3 + b"TAG" + b"\x00" * 125  # ID3v1 tail
    got = probe_mpeg_audio(blob)
    assert got["id3_bytes"] == 20
    assert got["n_frames"] == 3
    assert got["trailing_bytes"] == 128


def test_adts_duration_and_profile():
    blob = adts_frame() * 20
    got = probe_mpeg_audio(blob)
    assert got["format"] == "aac" and got["profile"] == "LC"
    assert got["sample_rate"] == 44100 and got["channels"] == 2
    assert got["n_frames"] == 20
    assert got["duration_sec"] == round(20 * 1024 / 44100, 3)
    assert got["trailing_bytes"] == 0


def test_defensive_degradation():
    assert probe_mpeg_audio(b"") == {}
    assert probe_mpeg_audio(b"OggS....") == {}
    assert probe_mpeg_audio(b"ID3\x04\x00\x00\x00\x00\x00\x02xx") == {}
    # truncated mid-frame: frames before the cut still counted
    blob = mp3_frame() * 3
    got = probe_mpeg_audio(blob[:-50])
    assert got["n_frames"] == 2 and got["trailing_bytes"] > 0
    # free-format bitrate (index 0) is refused, not mis-walked
    assert probe_mpeg_audio(mp3_frame()[:2] + b"\x00\x00" + b"\x00" * 400) == {}
