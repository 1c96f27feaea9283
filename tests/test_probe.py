"""Container probes (multimodal/probe.py): hand-built minimal
ISO-BMFF and EBML streams, defensive behavior on garbage, and the
codec-naming error path through decode_y4m. Spark-free."""

from __future__ import annotations

import struct

import pytest

from snapflow_spark.multimodal.probe import probe_container, probe_summary


def box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), typ) + payload


def _mini_mp4() -> bytes:
    # ftyp(isom) + moov > trak > mdia(hdlr vide + minf > stbl > stsd avc1)
    #                  + trak > mdia(hdlr soun + minf > stbl > stsd mp4a)
    def stsd(fmt: bytes) -> bytes:
        entry = struct.pack(">I4s", 8, fmt)
        return box(b"stsd", struct.pack(">II", 0, 1) + entry)

    def hdlr(handler: bytes) -> bytes:
        return box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12)

    def trak(handler: bytes, fmt: bytes) -> bytes:
        stbl = box(b"stbl", stsd(fmt))
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", hdlr(handler) + minf)
        return box(b"trak", mdia)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    moov = box(b"moov", trak(b"vide", b"avc1") + trak(b"soun", b"mp4a"))
    return ftyp + moov


def _mini_webm() -> bytes:
    # EBML header (id 1A45DFA3) containing DocType (id 4282) = "webm"
    doctype = b"\x42\x82" + bytes([0x80 | 4]) + b"webm"
    return b"\x1aE\xdf\xa3" + bytes([0x80 | len(doctype)]) + doctype


def test_mp4_probe_tracks_and_brand():
    info = probe_container(_mini_mp4())
    assert info["container"] == "mp4"
    assert info["brand"] == "isom"
    assert info["tracks"] == [("video", "avc1"), ("audio", "mp4a")]
    assert probe_summary(_mini_mp4()) == "MP4/isom (video: avc1; audio: mp4a)"


def test_webm_probe_doctype():
    info = probe_container(_mini_webm())
    assert info == {"container": "ebml", "doctype": "webm"}
    assert probe_summary(_mini_webm()) == "EBML/webm"


def test_probe_defensive_on_garbage():
    assert probe_container(b"") == {}
    assert probe_container(b"\x00" * 64) == {}
    assert probe_summary(b"nonsense") == "unknown container"
    # truncated mp4: keeps what it parsed, never raises
    trunc = _mini_mp4()[:30]
    info = probe_container(trunc)
    assert info["container"] == "mp4" and info.get("brand") == "isom"
    # truncated ebml
    assert probe_container(_mini_webm()[:6]) == {"container": "ebml"}


def test_decode_error_names_the_codec():
    from snapflow_spark.multimodal.video import decode_video_bytes

    with pytest.raises(NotImplementedError, match=r"video: avc1"):
        decode_video_bytes(_mini_mp4())
    with pytest.raises(NotImplementedError, match="EBML/webm"):
        decode_video_bytes(_mini_webm())


def test_mono_gif_video_blob_and_y4m_fps_guards():
    """Round-6 review fixes (video-side): mono clips route through the
    GIF branch without the palette reshape crash (doc_id % 15 == 12),
    and zero/invalid Y4M frame rates fail at parse, not deep inside a
    frame-timing division."""
    import numpy as np
    import pytest as _pytest

    from snapflow_spark.multimodal.gif import decode_gif_frames
    from snapflow_spark.multimodal.video import decode_y4m, synthesize_video

    # replicate attach_video_blob's mono-GIF branch directly
    frames = synthesize_video(b"seed", n_frames=4, width=8, height=8, channels=1)
    assert frames.shape[-1] == 1
    from snapflow_spark.multimodal.gif import encode_gif

    rgb = np.repeat(frames, 3, axis=-1)
    dec, _delay = decode_gif_frames(encode_gif(rgb, 10))
    assert dec.shape[0] == 4

    hdr_ok = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C444\nFRAME\n" + b"\x00" * 12
    assert decode_y4m(hdr_ok)[1] == 25
    for bad in (b"F0:1", b"F25:0"):
        blob = b"YUV4MPEG2 W2 H2 " + bad + b" C444\nFRAME\n" + b"\x00" * 12
        with _pytest.raises(ValueError, match="frame rate|invalid W/H/F"):
            decode_y4m(blob)


# --- OGG probe (round 8) ---------------------------------------------

def ogg_page(serial: int, granule: int, payload: bytes,
             bos: bool = False, eos: bool = False, seq: int = 0) -> bytes:
    """Minimal RFC 3533 page; CRC left 0 (the probe triages, it does
    not validate)."""
    htype = (0x02 if bos else 0) | (0x04 if eos else 0)
    segs = []
    rest = payload
    while len(rest) >= 255:
        segs.append(255)
        rest = rest[255:]
    segs.append(len(rest))
    head = (b"OggS" + bytes([0, htype])
            + struct.pack("<qIII", granule, serial, seq, 0)
            + bytes([len(segs)]) + bytes(segs))
    return head + payload


def _vorbis_id(channels: int, rate: int) -> bytes:
    return (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<IiiI", rate, 0, 0, 0) + b"\x01")


def _opus_id(channels: int, pre_skip: int, rate: int) -> bytes:
    return (b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIhB", pre_skip, rate, 0, 0))


def test_probe_ogg_vorbis_duration():
    from snapflow_spark.multimodal.probe import probe_ogg

    blob = (ogg_page(7, 0, _vorbis_id(2, 44100), bos=True)
            + ogg_page(7, 22050, b"\xaa" * 10, seq=1)
            + ogg_page(7, 88200, b"\xbb" * 10, eos=True, seq=2))
    info = probe_ogg(blob)
    assert info["container"] == "ogg" and info["n_pages"] == 3
    [st] = info["streams"]
    assert (st["codec"], st["channels"], st["sample_rate"]) == ("vorbis", 2, 44100)
    assert st["duration_sec"] == 2.0  # 88200 samples / 44100 Hz
    assert st["eos"] and st["pages"] == 3
    assert "vorbis 44100 Hz 2ch 2.0s" in probe_summary(blob)


def test_probe_ogg_opus_preskip_and_multiplex():
    from snapflow_spark.multimodal.probe import probe_ogg

    blob = (ogg_page(1, 0, _opus_id(1, 312, 48000), bos=True)
            + ogg_page(2, 0, _vorbis_id(1, 8000), bos=True)
            + ogg_page(1, 48312, b"x", seq=1)       # 1 s of opus + preskip
            + ogg_page(2, 4000, b"y", seq=1))       # 0.5 s of vorbis
    info = probe_ogg(blob)
    by_serial = {s["serial"]: s for s in info["streams"]}
    assert by_serial[1]["codec"] == "opus"
    assert by_serial[1]["duration_sec"] == 1.0  # (48312-312)/48000
    assert by_serial[2]["duration_sec"] == 0.5


def test_probe_ogg_resync_and_truncation():
    from snapflow_spark.multimodal.probe import probe_ogg

    good = ogg_page(9, 0, _vorbis_id(2, 48000), bos=True)
    tail = ogg_page(9, 4800, b"z" * 20, seq=1)
    # garbage between pages -> resync; truncated final page -> dropped
    blob = good + b"JUNKJUNK" + tail + ogg_page(9, 9600, b"w" * 50, seq=2)[:30]
    info = probe_ogg(blob)
    [st] = info["streams"]
    assert st["pages"] == 2 and st["duration_sec"] == 0.1
    assert info["trailing_bytes"] > 0
    # -1 granule (no packet ends) never regresses the duration
    blob2 = good + ogg_page(9, -1, b"q", seq=1) + tail
    assert probe_ogg(blob2)["streams"][0]["duration_sec"] == 0.1


def test_probe_ogg_foreign_input_and_container_dispatch():
    from snapflow_spark.multimodal.probe import probe_ogg

    assert probe_ogg(b"RIFF....WAVE") == {}
    blob = ogg_page(3, 0, _opus_id(2, 0, 48000), bos=True)
    assert probe_container(blob)["container"] == "ogg"


def test_ogg_decode_error_names_inner_codec():
    from snapflow_spark.multimodal.audio import decode_audio_bytes

    blob = ogg_page(3, 0, _opus_id(2, 0, 48000), bos=True)
    with pytest.raises(NotImplementedError, match=r"ogg: OGG \(opus 48000 Hz 2ch"):
        decode_audio_bytes(blob)
