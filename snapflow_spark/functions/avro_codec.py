"""Avro object-container codec, from scratch — the metadata format
Iceberg manifests speak (spark-avro is not bundled in pyspark, and
the manifest files a 100 TB Iceberg table points at are Avro whether
we like it or not).

Scope is the published Avro 1.x specification (container format +
binary encoding), schema-driven and generic: records, enums, arrays,
maps, unions, fixed, and all primitives; ``null`` and ``deflate``
codecs (the two every writer must support — snappy is optional in the
spec and guarded loudly).  Both directions are implemented
(``read_avro_file`` / ``write_avro_file``) so tests round-trip
synthesized manifests through our own pair AND hand-crafted byte
layouts, the multimodal codec convention (tests/test_avro.py,
hypothesis-fuzzed).

This is a METADATA codec: manifests are KB-to-MB driver-side files
(one dict per data file), never row data — row data in this engine is
parquet/ORC.  Complexity lives in the binary encoding, not volume:

- longs/ints are zigzag varints; strings/bytes are length-prefixed
- unions encode a zigzag branch index then the value
- arrays/maps encode block runs: count, items, ..., 0 terminator
  (negative count = byte size follows, for skippability — read side
  honors it, write side emits simple positive blocks)
- the container is: magic ``Obj\\x01``, a file-metadata map carrying
  ``avro.schema`` JSON + ``avro.codec``, a 16-byte sync marker, then
  (count, size, payload, sync) blocks.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

__all__ = [
    "read_avro_bytes",
    "read_avro_file",
    "read_avro_header",
    "read_avro_metadata",
    "write_avro_file",
]

_MAGIC = b"Obj\x01"


# --------------------------------------------------------------- read
class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError(
                f"avro: truncated input at byte {self.pos} (+{n})"
            )
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.take(1)[0]
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 70:
                raise ValueError("avro: varint overflow")
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def bytes_(self) -> bytes:
        n = self.long()
        if n < 0:
            raise ValueError(f"avro: negative byte length {n}")
        return self.take(n)

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _decode(r: _Reader, schema):
    """One datum of ``schema`` (parsed JSON form) off the reader."""
    if isinstance(schema, list):  # union
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"avro: union branch {idx} of {len(schema)}")
        return _decode(r, schema[idx])
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return r.take(1) == b"\x01"
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.take(4))[0]
    if t == "double":
        return struct.unpack("<d", r.take(8))[0]
    if t == "bytes":
        return r.bytes_()
    if t == "string":
        return r.string()
    if t == "fixed":
        return r.take(int(schema["size"]))
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "record":
        return {
            f["name"]: _decode(r, f["type"]) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # block size follows (skippable form)
                r.long()
                n = -n
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                # key MUST be read before the value: a subscript
                # assignment evaluates its RHS first, which would
                # consume the key bytes as the value
                k = r.string()
                out[k] = _decode(r, schema["values"])
    raise NotImplementedError(f"avro: unsupported schema type {t!r}")


def _resolve_names(schema, names: dict):
    """Inline named-type REFERENCES (a record/enum/fixed used again by
    name later in the schema) so the decoder never needs the registry
    — manifests use this for the partition record type."""
    if isinstance(schema, list):
        return [_resolve_names(s, names) for s in schema]
    if isinstance(schema, str):
        return names.get(schema, schema)
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        name = schema.get("name")
        full = (
            f"{schema['namespace']}.{name}"
            if schema.get("namespace") and name and "." not in name
            else name
        )
        for key in {name, full} - {None}:
            names[key] = schema
        if t == "record":
            # two passes so self-references resolve
            schema["fields"] = [
                {**f, "type": _resolve_names(f["type"], names)}
                for f in schema["fields"]
            ]
        return schema
    if t == "array":
        return {**schema, "items": _resolve_names(schema["items"], names)}
    if t == "map":
        return {**schema, "values": _resolve_names(schema["values"], names)}
    return schema


def _read_header(r: _Reader, what) -> tuple[dict, str, bytes]:
    """(resolved writer schema, codec, sync marker) off a container's
    head."""
    if r.take(4) != _MAGIC:
        raise ValueError(f"not an Avro object container: {what}")
    meta = _decode(r, {"type": "map", "values": "bytes"})
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(
            f"avro codec {codec!r} not implemented (null/deflate are)"
        )
    schema = _resolve_names(
        json.loads(meta["avro.schema"].decode()), {}
    )
    return schema, codec, r.take(16)


def read_avro_header(path: str | os.PathLike) -> dict:
    """Writer schema only — one bounded header read, no block decode
    (schema inference for the distributed data on-ramp)."""
    with open(path, "rb") as fh:
        head = fh.read(1 << 20)  # schema JSON lives in the first MB
    schema, _codec, _sync = _read_header(_Reader(head), path)
    return schema


def read_avro_metadata(path: str | os.PathLike) -> dict:
    """The container's full file-level key/value metadata map (bytes
    values) — one bounded header read.  Iceberg keys its manifest and
    manifest-list files here ('schema', 'partition-spec',
    'format-version', ...)."""
    with open(path, "rb") as fh:
        head = fh.read(1 << 20)
    r = _Reader(head)
    if r.take(4) != _MAGIC:
        raise ValueError(f"not an Avro object container: {path}")
    return _decode(r, {"type": "map", "values": "bytes"})


def read_avro_bytes(data: bytes, what: str = "<bytes>") -> tuple[dict, list]:
    """(writer schema as parsed JSON, decoded records) from container
    BYTES — the executor-side form (one binaryFile row in, rows
    out)."""
    r = _Reader(data)
    schema, codec, sync = _read_header(r, what)
    out: list = []
    while r.pos < len(r.data):
        count = r.long()
        size = r.long()
        payload = r.take(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)  # raw deflate
        br = _Reader(payload)
        for _ in range(count):
            out.append(_decode(br, schema))
        if br.pos != len(payload):
            raise ValueError(
                f"avro: block decoded {br.pos} of {len(payload)} bytes"
            )
        if r.take(16) != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
    return schema, out


def read_avro_file(path: str | os.PathLike) -> tuple[dict, list]:
    """(writer schema as parsed JSON, list of decoded records)."""
    with open(path, "rb") as fh:
        return read_avro_bytes(fh.read(), str(path))


# -------------------------------------------------------------- write
def _zigzag(n: int) -> bytes:
    acc = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    acc &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(buf: bytearray, schema, value) -> None:
    if isinstance(schema, list):  # union: first branch accepting value
        for i, branch in enumerate(schema):
            if _accepts(branch, value):
                buf += _zigzag(i)
                _encode(buf, branch, value)
                return
        raise TypeError(f"avro: no union branch for {value!r} in {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        buf += b"\x01" if value else b"\x00"
    elif t in ("int", "long"):
        buf += _zigzag(int(value))
    elif t == "float":
        buf += struct.pack("<f", float(value))
    elif t == "double":
        buf += struct.pack("<d", float(value))
    elif t == "bytes":
        buf += _zigzag(len(value)) + bytes(value)
    elif t == "string":
        raw = value.encode("utf-8")
        buf += _zigzag(len(raw)) + raw
    elif t == "fixed":
        if len(value) != int(schema["size"]):
            raise ValueError(
                f"avro fixed size {schema['size']} != {len(value)}"
            )
        buf += bytes(value)
    elif t == "enum":
        buf += _zigzag(schema["symbols"].index(value))
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] not in value and "default" in f:
                _encode(buf, f["type"], f["default"])
            else:
                _encode(buf, f["type"], value[f["name"]])
    elif t == "array":
        if value:
            buf += _zigzag(len(value))
            for v in value:
                _encode(buf, schema["items"], v)
        buf += _zigzag(0)
    elif t == "map":
        if value:
            buf += _zigzag(len(value))
            for k, v in value.items():
                raw = k.encode("utf-8")
                buf += _zigzag(len(raw)) + raw
                _encode(buf, schema["values"], v)
        buf += _zigzag(0)
    else:
        raise NotImplementedError(f"avro: unsupported schema type {t!r}")


def _accepts(schema, value) -> bool:
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, float) or (
            isinstance(value, int) and not isinstance(value, bool)
        )
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, (list, tuple))
    if t == "map":
        return isinstance(value, dict)
    return False


def write_avro_file(
    path: str | os.PathLike,
    schema: dict | str,
    records: list,
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
    records_per_block: int = 1000,
    extra_metadata: dict | None = None,
) -> None:
    """Write an object container.  ``sync`` is deterministic by
    default (metadata files should be byte-reproducible; pass random
    bytes if appending semantics ever matter).  ``extra_metadata``
    adds file-level key/value pairs to the header map (str or bytes
    values) — Iceberg keys its manifests this way ('schema',
    'partition-spec', 'format-version', ...); keys may not collide
    with the reserved ``avro.*`` entries."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    parsed = json.loads(schema) if isinstance(schema, str) else schema
    schema_json = json.dumps(parsed, separators=(",", ":"))
    resolved = _resolve_names(json.loads(schema_json), {})
    buf = bytearray(_MAGIC)
    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
    }
    for k, v in (extra_metadata or {}).items():
        if k in meta:
            raise ValueError(
                f"write_avro_file: extra_metadata key {k!r} collides "
                "with a reserved avro.* entry"
            )
        meta[k] = v.encode() if isinstance(v, str) else bytes(v)
    _encode(buf, {"type": "map", "values": "bytes"}, meta)
    buf += sync
    for lo in range(0, len(records), records_per_block) or (0,):
        chunk = records[lo : lo + records_per_block]
        if not chunk and records:
            continue
        block = bytearray()
        for rec in chunk:
            _encode(block, resolved, rec)
        payload = bytes(block)
        if codec == "deflate":
            c = zlib.compressobj(wbits=-15)
            payload = c.compress(payload) + c.flush()
        buf += _zigzag(len(chunk)) + _zigzag(len(payload)) + payload + sync
        if not records:
            break
    with open(path, "wb") as fh:
        fh.write(bytes(buf))
