"""Iceberg partition transforms (sources/iceberg_transforms.py):
bucket hashing pinned to the spec's Appendix B expected values,
truncate/temporal semantics, and file-list pruning through
read_iceberg on a hand-synthesized bucket/days-partitioned table."""

from __future__ import annotations

import datetime as dt
import uuid
from decimal import Decimal

import pytest

from snapflow_spark.sources.iceberg_transforms import (
    apply_transform,
    bucket_value,
    murmur3_x86_32,
    parse_transform,
    temporal_value,
    truncate_value,
)


def test_bucket_hashes_match_spec_appendix_b():
    """The spec's Appendix B table of hash results — each row is
    (type, value, expected murmur3 hash of the serialized value)."""
    import struct

    assert murmur3_x86_32(struct.pack("<q", 34)) == 2017239379  # int
    assert murmur3_x86_32(struct.pack("<q", 34)) == 2017239379  # long
    assert murmur3_x86_32(b"iceberg") == 1210000089  # string
    # date 2017-11-16 = 17486 days
    assert murmur3_x86_32(struct.pack("<q", 17486)) == -653330422
    # time 22:31:08 = 81068000000 micros
    assert murmur3_x86_32(struct.pack("<q", 81068000000)) == -662762989
    # timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert (
        murmur3_x86_32(struct.pack("<q", 1510871468000000)) == -2047944441
    )
    # decimal 14.20 -> unscaled 1420 as minimal big-endian
    assert murmur3_x86_32((1420).to_bytes(2, "big")) == -500754589
    u = uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    assert murmur3_x86_32(u.bytes) == 1488055340
    assert murmur3_x86_32(bytes([0, 1, 2, 3])) == -188683207


def test_bucket_value_end_to_end():
    # (hash & IntMax) % N over the serialized form
    assert bucket_value("int", 34, 16) == 2017239379 % 16
    assert bucket_value("long", 34, 16) == bucket_value("int", 34, 16)
    assert bucket_value("string", "iceberg", 16) == 1210000089 % 16
    assert bucket_value("date", dt.date(2017, 11, 16), 8) == (
        bucket_value("date", 17486, 8)
    )
    assert bucket_value("date", "2017-11-16", 8) == bucket_value(
        "date", 17486, 8
    )
    assert bucket_value(
        "timestamp", dt.datetime(2017, 11, 16, 22, 31, 8), 1000
    ) == bucket_value("timestamp", 1510871468000000, 1000)
    assert bucket_value("decimal(9,2)", Decimal("14.20"), 32) == (
        (-500754589 & 0x7FFFFFFF) % 32
    )
    with pytest.raises(NotImplementedError, match="struct"):
        bucket_value("struct", object(), 4)


def test_truncate_semantics():
    assert truncate_value("int", 7, 5) == 5
    assert truncate_value("int", -7, 5) == -10  # toward -inf, spec rule
    assert truncate_value("long", 0, 5) == 0
    assert truncate_value("string", "snowflake", 4) == "snow"
    assert truncate_value("string", "ab", 4) == "ab"
    assert truncate_value("binary", b"\x01\x02\x03", 2) == b"\x01\x02"
    assert truncate_value("decimal(9,2)", Decimal("10.65"), 50) == (
        Decimal("10.50")
    )
    with pytest.raises(ValueError, match="positive"):
        truncate_value("int", 1, 0)


def test_temporal_semantics():
    d = dt.date(2017, 11, 16)
    ts = dt.datetime(2017, 11, 16, 22, 31, 8)
    assert temporal_value("year", "date", d) == 47
    assert temporal_value("month", "date", d) == 47 * 12 + 10
    assert temporal_value("day", "date", d) == 17486
    assert temporal_value("day", "timestamp", ts) == 17486
    assert temporal_value("hour", "timestamp", ts) == (
        1510871468000000 // 3_600_000_000
    )
    # pre-epoch floors toward -inf
    assert temporal_value("year", "date", dt.date(1969, 12, 31)) == -1
    assert temporal_value("month", "date", dt.date(1969, 12, 31)) == -1
    assert temporal_value("day", "date", dt.date(1969, 12, 31)) == -1
    with pytest.raises(NotImplementedError, match="hour"):
        temporal_value("hour", "date", d)


def test_parse_and_apply():
    assert parse_transform("bucket[16]") == ("bucket", 16)
    assert parse_transform("identity") == ("identity", None)
    assert apply_transform("identity", "string", "x") == "x"
    assert apply_transform("bucket[4]", "long", 34) == 2017239379 % 4
    assert apply_transform("truncate[3]", "string", "abcdef") == "abc"
    assert apply_transform("day", "date", dt.date(2017, 11, 16)) == 17486
    with pytest.raises(NotImplementedError, match="void"):
        apply_transform("void", "int", 5)
