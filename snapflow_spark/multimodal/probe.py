"""Container PROBES for the formats the codecs deliberately do not
decode: ISO-BMFF (MP4/MOV/3GP — ISO/IEC 14496-12, public) box
walking and EBML (Matroska/WebM — RFC 8794) header parsing. Decoding
H.264/VP9/AV1/Opus is out of honest reach without codec libraries,
but a 100 TB ingest pipeline still needs to TRIAGE such blobs: which
container, which codecs, which track types — so the explicit
NotImplementedError can say "MP4 (video: avc1, audio: mp4a)" instead
of "compressed video", and so routing/filtering can happen on
metadata without any decode at all.

Both parsers are defensive: truncated or foreign input degrades to
partial info, never an exception — a probe must not crash triage."""

from __future__ import annotations

import struct

__all__ = ["probe_container", "probe_ogg", "probe_summary"]

# boxes that only contain other boxes (walk into, no payload header)
_ISO_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex",
    b"moof", b"traf", b"dinf",
}


def _walk_iso(data: bytes, start: int, end: int, out: dict) -> None:
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", data, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            return  # truncated/corrupt: stop, keep what we have
        body = pos + hdr
        if typ == b"ftyp" and size >= hdr + 4:
            out["brand"] = data[body : body + 4].decode("latin-1").strip()
        elif typ == b"hdlr" and size >= hdr + 12:
            handler = data[body + 8 : body + 12]
            out["_handler"] = handler.decode("latin-1")
        elif typ == b"stsd" and size >= hdr + 16:
            # FullBox: version/flags u32, entry_count u32, then
            # sample entries: [size u32][format 4cc]...
            fmt = data[body + 12 : body + 16].decode("latin-1").strip()
            kind = {
                "vide": "video", "soun": "audio", "text": "text",
                "subt": "subtitles",
            }.get(out.get("_handler", ""), out.get("_handler", "?"))
            out.setdefault("tracks", []).append((kind, fmt))
        if typ in _ISO_CONTAINERS:
            _walk_iso(data, body, pos + size, out)
        pos += size


def _ebml_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, next_pos); EBML variable-length integer. IDs keep the
    length-marker bit, sizes strip it."""
    if pos >= len(data):
        return -1, pos + 1
    first = data[pos]
    if first == 0:
        return -1, pos + 1
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        return -1, len(data)
    val = first if keep_marker else first & (0xFF >> length)
    for b in data[pos + 1 : pos + length]:
        val = (val << 8) | b
    return val, pos + length


def _walk_ebml(data: bytes, out: dict) -> None:
    # EBML header element 0x1A45DFA3 wraps DocType (id 0x4282)
    pos = 0
    eid, pos = _ebml_vint(data, pos, keep_marker=True)
    if eid != 0x1A45DFA3:
        return
    size, pos = _ebml_vint(data, pos, keep_marker=False)
    end = min(pos + size, len(data)) if size >= 0 else len(data)
    while pos < end:
        cid, pos = _ebml_vint(data, pos, keep_marker=True)
        csize, pos = _ebml_vint(data, pos, keep_marker=False)
        if cid < 0 or csize < 0 or pos + csize > len(data):
            return
        if cid == 0x4282:  # DocType
            out["doctype"] = data[pos : pos + csize].decode(
                "latin-1", "replace"
            )
        pos += csize


def probe_container(data: bytes) -> dict:
    """Identify an un-decodable media container. Returns {} for
    unrecognized input; otherwise keys: ``container``
    ('mp4'/'ebml'/'ogg'), ``brand`` / ``doctype``, for ISO-BMFF
    ``tracks`` as (kind, codec-fourcc) pairs, for OGG the
    ``probe_ogg`` stream list (round 8)."""
    data = bytes(data)
    out: dict = {}
    if len(data) >= 12 and data[4:8] == b"ftyp":
        out["container"] = "mp4"
        _walk_iso(data, 0, len(data), out)
        out.pop("_handler", None)
    elif data[:4] == b"\x1aE\xdf\xa3":
        out["container"] = "ebml"
        _walk_ebml(data, out)
    elif data[:4] == b"OggS":
        out = probe_ogg(data)
    return out


def probe_summary(data: bytes) -> str:
    """One-line human description for error messages:
    'MP4/isom (video: avc1; audio: mp4a)' or 'EBML/webm'."""
    info = probe_container(data)
    if not info:
        return "unknown container"
    if info["container"] == "mp4":
        s = "MP4/" + info.get("brand", "?")
        tracks = info.get("tracks")
        if tracks:
            parts = [f"{k}: {c}" for k, c in tracks]
            s += " (" + "; ".join(parts) + ")"
        return s
    if info["container"] == "ogg":
        parts = []
        for st in info.get("streams", []):
            p = st["codec"]
            if st.get("sample_rate"):
                p += f" {st['sample_rate']} Hz"
            if st.get("channels"):
                p += f" {st['channels']}ch"
            if st.get("duration_sec") is not None:
                p += f" {st['duration_sec']}s"
            parts.append(p)
        return "OGG (" + "; ".join(parts) + ")" if parts else "OGG"
    return "EBML/" + info.get("doctype", "?")


# --- OGG (RFC 3533) ---------------------------------------------------

#: BOS-payload prefixes -> codec names (public mapping-media specs)
_OGG_ID_PREFIXES = (
    (b"\x01vorbis", "vorbis"),
    (b"OpusHead", "opus"),
    (b"\x80theora", "theora"),
    (b"\x7fFLAC", "flac"),
    (b"Speex   ", "speex"),
)


def _ogg_page(data: bytes, pos: int):
    """One page at ``pos``: (header_type, granule, serial, payload,
    next_pos) or None if the bytes there are not a complete page.
    CRC deliberately unchecked — a probe triages, it does not decode."""
    if data[pos : pos + 4] != b"OggS" or pos + 27 > len(data):
        return None
    if data[pos + 4] != 0:  # stream_structure_version must be 0
        return None
    htype = data[pos + 5]
    granule, serial = struct.unpack_from("<qI", data, pos + 6)
    nseg = data[pos + 26]
    seg_end = pos + 27 + nseg
    if seg_end > len(data):
        return None
    plen = sum(data[pos + 27 : seg_end])
    if seg_end + plen > len(data):
        return None
    return htype, granule, serial, data[seg_end : seg_end + plen], seg_end + plen


def probe_ogg(data: bytes) -> dict:
    """Walk every OGG page (RFC 3533); returns {} unless the input
    starts with a capture pattern. Per logical stream (serial):
    ``codec`` (vorbis/opus/theora/flac/speex from the BOS id header),
    ``channels``/``sample_rate`` where the id header carries them,
    ``pages``, ``eos`` (saw the end page), and ``duration_sec`` from
    the LAST granule position (vorbis: PCM samples at sample_rate;
    opus: 48 kHz ticks minus pre-skip — per their mapping specs).
    Defensive: a corrupt page resyncs to the next capture pattern;
    truncation degrades to partial info, never an exception."""
    data = bytes(data)
    if data[:4] != b"OggS":
        return {}
    streams: dict[int, dict] = {}
    pos = 0
    n_pages = 0
    while pos + 27 <= len(data):
        page = _ogg_page(data, pos)
        if page is None:
            nxt = data.find(b"OggS", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        htype, granule, serial, payload, nxt = page
        n_pages += 1
        st = streams.setdefault(
            serial,
            {"serial": serial, "codec": "unknown", "pages": 0, "eos": False},
        )
        st["pages"] += 1
        if htype & 0x04:
            st["eos"] = True
        if htype & 0x02:  # BOS: the codec identification header
            for prefix, name in _OGG_ID_PREFIXES:
                if payload.startswith(prefix):
                    st["codec"] = name
                    break
            if st["codec"] == "vorbis" and len(payload) >= 16:
                st["channels"] = payload[11]
                (st["sample_rate"],) = struct.unpack_from("<I", payload, 12)
            elif st["codec"] == "opus" and len(payload) >= 14:
                st["channels"] = payload[9]
                (st["_pre_skip"],) = struct.unpack_from("<H", payload, 10)
                (st["sample_rate"],) = struct.unpack_from("<I", payload, 12)
            elif st["codec"] == "speex" and len(payload) >= 52:
                (st["sample_rate"],) = struct.unpack_from("<I", payload, 36)
                (st["channels"],) = struct.unpack_from("<I", payload, 48)
        if granule >= 0:  # -1 = no packet finishes on this page
            st["_last_granule"] = granule
        pos = nxt
    for st in streams.values():
        lg = st.pop("_last_granule", None)
        pre = st.pop("_pre_skip", 0)
        if lg is None:
            continue
        if st["codec"] == "vorbis" and st.get("sample_rate"):
            st["duration_sec"] = round(lg / st["sample_rate"], 3)
        elif st["codec"] == "opus":
            # opus granules tick at 48 kHz regardless of input rate
            st["duration_sec"] = round(max(0, lg - pre) / 48000.0, 3)
    return {
        "container": "ogg",
        "streams": sorted(streams.values(), key=lambda s: s["serial"]),
        "n_pages": n_pages,
        "trailing_bytes": len(data) - pos,
    }
