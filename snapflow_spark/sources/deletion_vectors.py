"""Delta Lake deletion vectors — decode (and encode) the row-level
delete sidecars the current Databricks/delta-spark writers emit by
default, from scratch against the published formats:

- the Delta protocol's *Deletion Vector Descriptor* and *Deletion
  Vector File Storage Format* (delta.io/PROTOCOL.md): a DV names the
  row indexes DELETED from one data file; it lives inline in the
  ``add`` action (storageType ``i``), in a UUID-named sidecar file
  relative to the table root (``u``), or at an absolute path (``p``).
  On-disk framing per DV: ``[dataSize: u32 BE][data][crc32(data): u32
  BE]`` inside a file whose first byte is format version 1.
- the *portable RoaringBitmapArray* serialization the data bytes use:
  magic ``1681511377`` (u32 LE), then the standard 64-bit roaring
  "portable" layout from RoaringFormatSpec — ``numBitmaps`` (u64 LE),
  then per bitmap a u32 LE key followed by a standard 32-bit
  RoaringBitmap container stream (cookies 12346/12347, array /
  bitset / run containers, everything little-endian).
- Z85 (ZeroMQ spec 32) for the base85 text in descriptors: 4-byte
  big-endian groups onto a fixed 85-char alphabet.

Scale shape: a DV is O(deleted rows in ONE file) metadata — the same
per-file bitmaps delta-spark materializes per scan task.  Decoding
happens driver-side here because the bridge's file planning already
is (KB–MB of log metadata); the row filter itself runs distributed
(``read_delta`` anti-joins on the parquet ``_metadata.row_index``
column, one broadcast of the deleted indexes per DV'd file).

The encoder twin (``inline_dv_descriptor`` / ``write_dv_file``)
exists so tests prove the reader against hand-built bytes and
round-trips, and so synthesized tables exercise every storage type.
"""

from __future__ import annotations

import os
import uuid as _uuid
import zlib
from pathlib import Path

__all__ = [
    "decode_dv_data",
    "deleted_row_indexes",
    "encode_dv_data",
    "inline_dv_descriptor",
    "write_dv_file",
    "z85_decode",
    "z85_encode",
]

_MAGIC = 1681511377  # RoaringBitmapArray portable magic (u32 LE)
_COOKIE_RUNS = 12347  # SERIAL_COOKIE: stream may hold run containers
_COOKIE_NO_RUNS = 12346  # SERIAL_COOKIE_NO_RUNCONTAINER
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # container cardinality above which bitsets win

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_REV = {c: i for i, c in enumerate(_Z85)}


# ----------------------------------------------------------------- z85
def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: each 4-byte big-endian group becomes 5 chars, most
    significant digit first.  Length must be a multiple of 4."""
    if len(data) % 4:
        raise ValueError(f"z85: length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85: length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for c in text[i : i + 5]:
            if c not in _Z85_REV:
                raise ValueError(f"z85: invalid character {c!r}")
            acc = acc * 85 + _Z85_REV[c]
        if acc > 0xFFFFFFFF:
            raise ValueError("z85: group overflows 32 bits")
        out += acc.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------- roaring (decode)
def _u16(b: bytes, o: int) -> int:
    return int.from_bytes(b[o : o + 2], "little")


def _u32(b: bytes, o: int) -> int:
    return int.from_bytes(b[o : o + 4], "little")


def _decode_roaring32(data: bytes, pos: int) -> tuple[list[int], int]:
    """One standard-format 32-bit RoaringBitmap starting at ``pos``;
    returns (sorted values, next position)."""
    cookie = _u32(data, pos)
    pos += 4
    if (cookie & 0xFFFF) == _COOKIE_RUNS:
        n = (cookie >> 16) + 1
        run_flags = data[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUNS:
        n = _u32(data, pos)
        pos += 4
        run_flags = b""
        has_offsets = True
    else:
        raise ValueError(f"roaring: unknown cookie {cookie & 0xFFFF}")
    heads = []
    for i in range(n):
        key = _u16(data, pos)
        card = _u16(data, pos + 2) + 1
        heads.append((key, card))
        pos += 4
    if has_offsets:
        pos += 4 * n  # sequential read: offsets are redundant
    values: list[int] = []
    for i, (key, card) in enumerate(heads):
        base = key << 16
        is_run = bool(run_flags) and (run_flags[i // 8] >> (i % 8)) & 1
        if is_run:
            n_runs = _u16(data, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = _u16(data, pos), _u16(data, pos + 2)
                pos += 4
                values.extend(range(base + start, base + start + length + 1))
        elif card <= _ARRAY_MAX:
            for _ in range(card):
                values.append(base + _u16(data, pos))
                pos += 2
        else:  # bitset container: 1024 u64 words
            words = data[pos : pos + 8192]
            pos += 8192
            for w in range(1024):
                word = int.from_bytes(words[w * 8 : w * 8 + 8], "little")
                while word:
                    low = word & -word
                    values.append(base + w * 64 + low.bit_length() - 1)
                    word ^= low
    return values, pos


def decode_dv_data(data: bytes) -> list[int]:
    """Deleted row indexes from DV payload bytes (the magic-prefixed
    portable RoaringBitmapArray)."""
    if len(data) < 12:
        raise ValueError(f"deletion vector: {len(data)} bytes is too short")
    if _u32(data, 0) != _MAGIC:
        raise ValueError(
            f"deletion vector: bad magic {_u32(data, 0)} (want {_MAGIC})"
        )
    n_bitmaps = int.from_bytes(data[4:12], "little")
    pos = 12
    out: list[int] = []
    for _ in range(n_bitmaps):
        key = _u32(data, pos)
        pos += 4
        vals, pos = _decode_roaring32(data, pos)
        out.extend((key << 32) | v for v in vals)
    if pos != len(data):
        raise ValueError(
            f"deletion vector: decoded {pos} of {len(data)} bytes"
        )
    return out


# ---------------------------------------------------- roaring (encode)
def encode_dv_data(indexes) -> bytes:
    """Serialize deleted row indexes as the magic-prefixed portable
    RoaringBitmapArray (array/bitset containers, no-run cookie)."""
    idx = sorted(set(int(i) for i in indexes))
    if idx and idx[0] < 0:
        raise ValueError("deletion vector: negative row index")
    by_key: dict[int, dict[int, list[int]]] = {}
    for v in idx:
        by_key.setdefault(v >> 32, {}).setdefault(
            (v & 0xFFFFFFFF) >> 16, []
        ).append(v & 0xFFFF)
    buf = bytearray()
    buf += _MAGIC.to_bytes(4, "little")
    buf += len(by_key).to_bytes(8, "little")
    for key in sorted(by_key):
        containers = by_key[key]
        buf += key.to_bytes(4, "little")
        buf += _COOKIE_NO_RUNS.to_bytes(4, "little")
        buf += len(containers).to_bytes(4, "little")
        for ckey in sorted(containers):
            buf += ckey.to_bytes(2, "little")
            buf += (len(containers[ckey]) - 1).to_bytes(2, "little")
        streams = []
        for ckey in sorted(containers):
            vals = containers[ckey]
            if len(vals) <= _ARRAY_MAX:
                s = b"".join(v.to_bytes(2, "little") for v in vals)
            else:
                words = [0] * 1024
                for v in vals:
                    words[v >> 6] |= 1 << (v & 63)
                s = b"".join(w.to_bytes(8, "little") for w in words)
            streams.append(s)
        # offset header (mandatory with the no-run cookie): byte
        # offsets from the start of THIS bitmap's stream (the cookie)
        running = 8 + 8 * len(containers)
        for s in streams:
            buf += running.to_bytes(4, "little")
            running += len(s)
        for s in streams:
            buf += s
    return bytes(buf)


# ------------------------------------------------------ file framing
def _frame(data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + data
        + (zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def write_dv_file(
    table_root: str | os.PathLike,
    indexes,
    prefix: str = "",
) -> dict:
    """Write a UUID-named DV sidecar under ``table_root`` and return
    the ``add.deletionVector`` descriptor (storageType ``u``)."""
    table = Path(table_root)
    u = _uuid.uuid4()
    name = f"deletion_vector_{u}.bin"
    target = table / prefix / name if prefix else table / name
    target.parent.mkdir(parents=True, exist_ok=True)
    data = encode_dv_data(indexes)
    payload = bytes([1]) + _frame(data)
    offset = 1  # right after the version byte
    target.write_bytes(payload)
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": len(set(int(i) for i in indexes)),
    }


def inline_dv_descriptor(indexes) -> dict:
    """An inline (storageType ``i``) descriptor carrying the bitmap
    bytes as Z85 text directly in the log."""
    data = encode_dv_data(indexes)
    pad = (-len(data)) % 4  # Z85 needs 4-byte alignment; Delta's
    # inline DVs are padded by the base85 codec the same way
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data),
        "cardinality": len(set(int(i) for i in indexes)),
    }


def _dv_sidecar_path(table_root: Path, path_or_inline: str) -> Path:
    """storageType 'u': the last 20 chars are the Z85 UUID; anything
    before them is a subdirectory prefix."""
    if len(path_or_inline) < 20:
        raise ValueError(
            f"deletion vector: uuid field {path_or_inline!r} shorter "
            "than a Z85 uuid (20 chars)"
        )
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return table_root / prefix / name if prefix else table_root / name


def _absolute_dv_path(path_or_uri: str) -> "Path":
    """storageType ``p`` records an absolute path AS A URI in real
    Delta logs (``file:///...``, ``s3://...``), though bare paths
    also appear.  Resolve file: URIs (any slash count) to local
    paths; refuse remote schemes loudly rather than opening a
    nonsense local path."""
    from urllib.parse import unquote, urlparse

    if "://" in path_or_uri or path_or_uri.startswith("file:"):
        u = urlparse(path_or_uri)
        if u.scheme and u.scheme != "file":
            raise NotImplementedError(
                f"deletion vector: absolute-path DV with remote "
                f"scheme {u.scheme!r} ({path_or_uri!r}); only local "
                "file: URIs and bare paths are readable here"
            )
        # file:/p, file://host/p (host must be empty/localhost),
        # file:///p all normalize to the path component
        if u.netloc not in ("", "localhost"):
            raise NotImplementedError(
                f"deletion vector: file URI with remote authority "
                f"{u.netloc!r}"
            )
        return Path(unquote(u.path))
    return Path(path_or_uri)


def deleted_row_indexes(
    table_root: str | os.PathLike, descriptor: dict
) -> list[int]:
    """Resolve an ``add.deletionVector`` descriptor to the sorted row
    indexes it deletes.  Validates the size/CRC framing for on-disk
    DVs and the cardinality for all of them."""
    st = descriptor.get("storageType")
    size = int(descriptor.get("sizeInBytes") or 0)
    if st == "i":
        raw = z85_decode(descriptor["pathOrInlineDv"])
        data = raw[:size]  # the codec pads to 4-byte groups
    elif st in ("u", "p"):
        table = Path(table_root)
        p = (
            _dv_sidecar_path(table, descriptor["pathOrInlineDv"])
            if st == "u"
            else _absolute_dv_path(descriptor["pathOrInlineDv"])
        )
        blob = p.read_bytes()
        off = descriptor.get("offset")
        if off is None:
            off = 1  # directly after the version byte
        off = int(off)
        declared = int.from_bytes(blob[off : off + 4], "big")
        if declared != size:
            raise ValueError(
                f"deletion vector {p.name}: framed size {declared} != "
                f"descriptor sizeInBytes {size}"
            )
        data = blob[off + 4 : off + 4 + size]
        crc = int.from_bytes(blob[off + 4 + size : off + 8 + size], "big")
        if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"deletion vector {p.name}: CRC-32 mismatch")
    else:
        raise NotImplementedError(
            f"deletion vector storageType {st!r} (i/u/p are the spec)"
        )
    out = sorted(decode_dv_data(data))
    card = descriptor.get("cardinality")
    if card is not None and int(card) != len(out):
        raise ValueError(
            f"deletion vector: decoded {len(out)} indexes but the "
            f"descriptor claims cardinality {card}"
        )
    return out
