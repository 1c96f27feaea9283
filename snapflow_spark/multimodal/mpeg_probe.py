"""MPEG audio FRAME-WALK probe (MP3 and ADTS AAC) — duration,
bitrate, sample rate, channel layout and VBR detection WITHOUT any
decode, from the public header layouts (MPEG-1 audio ISO/IEC
11172-3 §2.4.1.3, MPEG-2 ISO/IEC 13818-3, ADTS ISO/IEC 13818-7 /
14496-3 §1.A.2).

Why it exists: ``decode_audio_bytes`` deliberately does not decode
MP3/AAC (no codec libraries in honest reach — the ``external=``
hook is the production swap-in), but a 100 TB podcast/audio corpus
still needs TRIAGE on such blobs: how long, what rate, mono/stereo,
CBR/VBR — enough to route, filter, budget and dedup-by-metadata
before any decoder runs. Same philosophy as ``probe.py`` for
MP4/EBML: defensive, truncated/foreign input degrades to partial
info (frames parsed so far), never an exception.

Duration is exact frame math, not a bitrate estimate: every frame
header is walked, so VBR files (where size/bitrate lies) still
report the true duration; ``bitrate_kbps`` is the duration-weighted
average. An ID3v2 tag is skipped via its syncsafe length; trailing
garbage (ID3v1, APE tags) simply ends the walk and is reported as
``trailing_bytes``.
"""

from __future__ import annotations

__all__ = ["probe_mpeg_audio"]

# bitrate tables, kbps; index 0 = "free", 15 = invalid (ISO 11172-3
# table 3-B.2 / 13818-3). Keyed by (mpeg1?, layer).
_BITRATES = {
    (True, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
                384, 416, 448),
    (True, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320, 384),
    (True, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                224, 256, 320),
    (False, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
                 192, 224, 256),
    # MPEG-2/2.5 layers II and III share one table
    (False, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 144, 160),
    (False, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 144, 160),
}
# sample-rate tables by version bits (00=2.5, 10=MPEG2, 11=MPEG1)
_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}
_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350)
_ADTS_PROFILES = ("Main", "LC", "SSR", "LTP")


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = 0
    for b in data[6:10]:  # syncsafe: 7 bits per byte
        if b & 0x80:
            return 0  # malformed tag length: don't skip
        size = (size << 7) | b
    return min(10 + size, len(data))


def _mp3_frame(data: bytes, pos: int):
    """(frame_bytes, samples, rate, bitrate_kbps, channels, version,
    layer) or None if pos doesn't hold a valid MP3 frame header."""
    if pos + 4 > len(data):
        return None
    h = int.from_bytes(data[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver = (h >> 19) & 0x3           # 00=2.5, 01=reserved, 10=2, 11=1
    layer_bits = (h >> 17) & 0x3    # 01=III, 10=II, 11=I; 00=reserved
    if ver == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits          # 1, 2 or 3
    mpeg1 = ver == 3
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format/invalid bitrate unsupported
    bitrate = _BITRATES[(mpeg1, layer)][br_idx] * 1000
    rate = _RATES[ver][sr_idx]
    padding = (h >> 9) & 0x1
    channels = 1 if (h >> 6) & 0x3 == 3 else 2
    if layer == 1:
        samples = 384
        nbytes = (12 * bitrate // rate + padding) * 4
    else:
        samples = 1152 if (mpeg1 or layer == 2) else 576
        per = 144 if (mpeg1 or layer == 2) else 72
        nbytes = per * bitrate // rate + padding
    if nbytes <= 4:
        return None
    version = {3: "1", 2: "2", 0: "2.5"}[ver]
    return nbytes, samples, rate, bitrate // 1000, channels, version, layer


def _adts_frame(data: bytes, pos: int):
    """(frame_bytes, samples, rate, channels, profile) or None."""
    if pos + 7 > len(data):
        return None
    b = data
    if b[pos] != 0xFF or (b[pos + 1] & 0xF6) != 0xF0:
        return None  # sync 0xFFF + layer 00
    sr_idx = (b[pos + 2] >> 2) & 0xF
    if sr_idx >= len(_ADTS_RATES):
        return None
    profile = (b[pos + 2] >> 6) & 0x3
    channels = ((b[pos + 2] & 0x1) << 2) | (b[pos + 3] >> 6)
    nbytes = ((b[pos + 3] & 0x03) << 11) | (b[pos + 4] << 3) | (b[pos + 5] >> 5)
    if nbytes < 7:
        return None
    n_raw = (b[pos + 6] & 0x03) + 1  # AAC frames in this ADTS frame
    return nbytes, 1024 * n_raw, _ADTS_RATES[sr_idx], channels, profile


def probe_mpeg_audio(data: bytes) -> dict:
    """Walk every frame of an MP3 or ADTS-AAC stream; returns {} if
    the input starts with neither (after an optional ID3v2 tag).
    Keys: ``format`` ('mp3'/'aac'), ``version``/``layer`` or
    ``profile``, ``sample_rate``, ``channels``, ``n_frames``,
    ``duration_sec`` (exact frame math), ``bitrate_kbps``
    (duration-weighted average), ``vbr`` (mp3: >1 distinct frame
    bitrate), ``id3_bytes``, ``trailing_bytes`` (unparsed tail —
    ID3v1/APE tags or corruption)."""
    data = bytes(data)
    start = _skip_id3v2(data)
    pos = start
    first_mp3 = _mp3_frame(data, pos)
    first_adts = _adts_frame(data, pos)
    out: dict = {"id3_bytes": start}
    if first_mp3 is None and first_adts is None:
        return {}
    # the sniffing rule (audio.py): layer bits 00 = ADTS, else MP3
    if first_adts is not None and first_mp3 is None:
        n_frames = total_samples = 0
        rate = first_adts[2]
        while True:
            fr = _adts_frame(data, pos)
            if fr is None or pos + fr[0] > len(data):
                break
            n_frames += 1
            total_samples += fr[1]
            pos += fr[0]
        dur = total_samples / rate if rate else 0.0
        out.update(
            format="aac",
            profile=_ADTS_PROFILES[first_adts[4]],
            sample_rate=rate,
            channels=first_adts[3],
            n_frames=n_frames,
            duration_sec=round(dur, 3),
            bitrate_kbps=round((pos - start) * 8 / dur / 1000, 1) if dur else 0.0,
            vbr=False,  # ADTS carries no per-frame bitrate field
            trailing_bytes=len(data) - pos,
        )
        return out
    n_frames = total_samples = 0
    bitrates = set()
    rate = first_mp3[2]
    while True:
        fr = _mp3_frame(data, pos)
        if fr is None or pos + fr[0] > len(data):
            break
        n_frames += 1
        total_samples += fr[1]
        bitrates.add(fr[3])
        pos += fr[0]
    dur = total_samples / rate if rate else 0.0
    out.update(
        format="mp3",
        version=first_mp3[5],
        layer=first_mp3[6],
        sample_rate=rate,
        channels=first_mp3[4],
        n_frames=n_frames,
        duration_sec=round(dur, 3),
        bitrate_kbps=round((pos - start) * 8 / dur / 1000, 1) if dur else 0.0,
        vbr=len(bitrates) > 1,
        trailing_bytes=len(data) - pos,
    )
    return out
