"""Iceberg partition-transform functions, from the published spec.

The Iceberg table spec (https://iceberg.apache.org/spec/) defines the
partition transforms ``identity``, ``bucket[N]``, ``truncate[W]``,
``year``, ``month``, ``day``, ``hour`` and ``void``.  ``read_iceberg``
uses these to PRUNE the file list for ``partition_filter`` probes on
non-identity specs: the probe value is run through the same transform
the writer used and compared against the manifests' stored partition
values — a file is dropped only when its stored value provably differs,
so pruning is an optimization, never a filter (for bucket/truncate the
kept files still contain OTHER rows from the same bucket; callers apply
the real predicate on the result).

``bucket[N]`` hashes the spec's single-value binary serialization with
32-bit Murmur3 (seed 0) and takes ``(hash & Integer.MAX_VALUE) % N``.
The Murmur3 implementation below is written from Austin Appleby's
public-domain MurmurHash3 reference (murmur3_x86_32); the per-type
serializations and the expected hash values pinned in
tests/test_iceberg_transforms.py come from the spec's Appendix B table.

All functions are pure and driver-side: transforms apply to the ONE
probe value per filter key, never per row — pruning cost is
O(#manifest entries) regardless of data size.
"""

from __future__ import annotations

import datetime as _dt
import re
import struct
import uuid as _uuid
from decimal import Decimal

__all__ = [
    "murmur3_x86_32",
    "bucket_value",
    "truncate_value",
    "temporal_value",
    "apply_transform",
    "parse_transform",
]

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """32-bit MurmurHash3 (x86 variant), returning a SIGNED int32 —
    Java int semantics, which is what Iceberg's bucket transform
    expects."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    length = len(data)
    rounded = length & ~0x3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = _rotl32(k, 15)
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = _rotl32(k, 15)
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h & 0x80000000 else h


def _days(value) -> int:
    """Coerce a probe onto days-from-epoch (the internal date form):
    datetime.date, ISO 'YYYY-MM-DD' string, or an already-internal
    int."""
    if isinstance(value, bool):
        raise TypeError("date probe cannot be a bool")
    if isinstance(value, int):
        return value
    if isinstance(value, _dt.datetime):
        value = value.date()
    if isinstance(value, _dt.date):
        return (value - _EPOCH_DATE).days
    if isinstance(value, str):
        return (_dt.date.fromisoformat(value) - _EPOCH_DATE).days
    raise TypeError(f"cannot interpret {value!r} as a date probe")


def _micros(value) -> int:
    """Coerce a probe onto microseconds-from-epoch (the internal
    timestamp form): datetime (naive = UTC), ISO string, or int."""
    if isinstance(value, bool):
        raise TypeError("timestamp probe cannot be a bool")
    if isinstance(value, int):
        return value
    if isinstance(value, str):
        value = _dt.datetime.fromisoformat(value)
    if isinstance(value, _dt.datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
        delta = value - _EPOCH_TS
        return (delta.days * 86400 + delta.seconds) * 1_000_000 + (
            delta.microseconds
        )
    raise TypeError(f"cannot interpret {value!r} as a timestamp probe")


def _hash_bytes(type_str: str, value) -> bytes:
    """The spec's single-value binary serialization FOR HASHING
    (Appendix B): ints and longs widen to 8-byte little-endian longs
    so bucket(int) == bucket(long) for equal values; temporal types
    hash their internal long form."""
    t = type_str
    if t in ("int", "long"):
        return struct.pack("<q", int(value))
    if t == "date":
        return struct.pack("<q", _days(value))
    if t in ("timestamp", "timestamptz", "timestamp_ns", "timestamptz_ns"):
        return struct.pack("<q", _micros(value))
    if t == "time":
        return struct.pack("<q", int(value))  # micros from midnight
    if t == "string":
        return str(value).encode("utf-8")
    if t == "uuid":
        u = value if isinstance(value, _uuid.UUID) else _uuid.UUID(str(value))
        return u.bytes
    if t in ("binary",) or t.startswith("fixed"):
        return bytes(value)
    if t.startswith("decimal"):
        unscaled = _unscaled(t, value)
        length = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(length, "big", signed=True)
    raise NotImplementedError(
        f"iceberg bucket transform over source type {type_str!r}"
    )


def _unscaled(type_str: str, value) -> int:
    m = re.fullmatch(r"decimal\(\s*\d+\s*,\s*(\d+)\s*\)", type_str)
    if not m:
        raise ValueError(f"malformed decimal type {type_str!r}")
    scale = int(m.group(1))
    d = value if isinstance(value, Decimal) else Decimal(str(value))
    quantized = d.scaleb(scale)
    if quantized != quantized.to_integral_value():
        raise ValueError(
            f"decimal probe {value} does not fit scale {scale}"
        )
    return int(quantized)


def bucket_value(type_str: str, value, n: int) -> int:
    """``bucket[N]``: (murmur3_x86_32(serialize(v)) & IntMax) % N."""
    if value is None:
        raise ValueError("bucket transform of null is null — probe "
                         "with None via identity semantics instead")
    h = murmur3_x86_32(_hash_bytes(type_str, value))
    return (h & 0x7FFFFFFF) % int(n)


def truncate_value(type_str: str, value, w: int):
    """``truncate[W]``: ints/longs floor to a multiple of W (always
    toward negative infinity), strings keep the first W unicode
    characters, decimals floor their unscaled value, binary keeps the
    first W bytes."""
    if value is None:
        return None
    w = int(w)
    if w <= 0:
        raise ValueError(f"truncate width must be positive, got {w}")
    t = type_str
    if t in ("int", "long"):
        v = int(value)
        return v - (v % w)  # python % is already nonnegative for w>0
    if t == "string":
        return str(value)[:w]
    if t in ("binary",) or t.startswith("fixed"):
        return bytes(value)[:w]
    if t.startswith("decimal"):
        unscaled = _unscaled(t, value)
        scale = int(re.fullmatch(
            r"decimal\(\s*\d+\s*,\s*(\d+)\s*\)", t).group(1))
        trunc = unscaled - (unscaled % w)
        return Decimal(trunc).scaleb(-scale)
    raise NotImplementedError(
        f"iceberg truncate transform over source type {type_str!r}"
    )


def temporal_value(transform: str, type_str: str, value) -> int:
    """``year``/``month``/``day``/``hour``: the internal int forms —
    years from 1970, months from 1970-01, days from epoch, hours from
    epoch.  ``hour`` is only defined for timestamps."""
    if value is None:
        return None
    t = type_str
    if t == "date":
        days = _days(value)
        micros = None
    elif t in ("timestamp", "timestamptz", "timestamp_ns", "timestamptz_ns"):
        micros = _micros(value)
        days = micros // 86_400_000_000
    else:
        raise NotImplementedError(
            f"iceberg {transform!r} transform over source type "
            f"{type_str!r} (date/timestamp sources only)"
        )
    if transform == "day":
        return int(days)
    if transform == "hour":
        if micros is None:
            raise NotImplementedError(
                "iceberg 'hour' transform is only defined for "
                "timestamp sources"
            )
        return int(micros // 3_600_000_000)
    d = _EPOCH_DATE + _dt.timedelta(days=int(days))
    if transform == "year":
        return d.year - 1970
    if transform == "month":
        return (d.year - 1970) * 12 + (d.month - 1)
    raise NotImplementedError(f"iceberg transform {transform!r}")


def parse_transform(transform: str) -> tuple[str, int | None]:
    """'bucket[16]' -> ('bucket', 16); 'identity' -> ('identity',
    None)."""
    m = re.fullmatch(r"(\w+)\[(\d+)\]", transform)
    if m:
        return m.group(1), int(m.group(2))
    return transform, None


def apply_transform(transform: str, type_str: str, value):
    """Run one probe value through a partition transform, returning
    the value the writer would have stored in the manifests' partition
    record.  Raises NotImplementedError for transforms/types outside
    the spec set (the caller's loud-refusal contract)."""
    name, arg = parse_transform(transform)
    if name == "identity":
        return value
    if name == "bucket":
        return bucket_value(type_str, value, arg)
    if name == "truncate":
        return truncate_value(type_str, value, arg)
    if name in ("year", "month", "day", "hour"):
        return temporal_value(name, type_str, value)
    raise NotImplementedError(f"iceberg partition transform {transform!r}")
