"""Avro object-container codec (functions/avro_codec.py): writer→
reader round trips over every schema construct, hand-crafted byte
layouts pinning the binary encoding (zigzag varints, union indices,
block runs, sync markers), hypothesis fuzz, and loud guards — all
Spark-free (it is a driver-side metadata codec)."""

from __future__ import annotations

import json
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from snapflow_spark.functions.avro_codec import (
    read_avro_file,
    write_avro_file,
)

MANIFESTISH = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "r102",
                            "fields": [
                                {
                                    "name": "lang",
                                    "type": ["null", "string"],
                                    "default": None,
                                }
                            ],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}


def _entry(i, lang):
    return {
        "status": 1,
        "data_file": {
            "file_path": f"data/f{i}.parquet",
            "file_format": "PARQUET",
            "partition": {"lang": lang},
            "record_count": 10 * i,
            "file_size_in_bytes": 1 << i,
        },
    }


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_round_trip_manifest_shape(tmp_path, codec):
    recs = [_entry(1, "en"), _entry(2, None), _entry(3, "de")]
    p = tmp_path / "m.avro"
    write_avro_file(p, MANIFESTISH, recs, codec=codec)
    schema, got = read_avro_file(p)
    assert got == recs
    assert schema["name"] == "manifest_entry"


def test_all_constructs_round_trip(tmp_path):
    schema = {
        "type": "record",
        "name": "everything",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "fx", "type": {"type": "fixed", "name": "x4", "size": 4}},
            {
                "name": "e",
                "type": {
                    "type": "enum",
                    "name": "col",
                    "symbols": ["RED", "GREEN"],
                },
            },
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "u", "type": ["null", "long", "string"]},
            # named-type REFERENCE: x4 reused by name
            {"name": "fx2", "type": ["null", "x4"], "default": None},
        ],
    }
    rows = [
        {
            "b": True,
            "i": -(2**31) + 1,
            "l": 2**62,
            "f": 0.5,
            "d": -1e300,
            "s": "héllo  ",
            "by": b"\x00\xff",
            "fx": b"abcd",
            "e": "GREEN",
            "arr": [0, -1, 2**40],
            "m": {"k1": "v1", "k2": ""},
            "u": None,
            "fx2": b"wxyz",
        },
        {
            "b": False,
            "i": 0,
            "l": -(2**62),
            "f": -2.0,
            "d": 3.14,
            "s": "",
            "by": b"",
            "fx": b"\x00\x00\x00\x00",
            "e": "RED",
            "arr": [],
            "m": {},
            "u": "str branch",
            "fx2": None,
        },
    ]
    p = tmp_path / "e.avro"
    write_avro_file(p, schema, rows)
    _, got = read_avro_file(p)
    # float is 32-bit: compare via struct round trip
    assert got[0]["f"] == struct.unpack("<f", struct.pack("<f", 0.5))[0]
    for row, want in zip(got, rows):
        row.pop("f"), want.pop("f")
    assert got == rows


def test_hand_crafted_bytes_pin_the_encoding(tmp_path):
    """A container built byte-by-byte from the spec reads back
    correctly — the reader is pinned to the FORMAT, not to our
    writer's habits."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "n", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    sj = json.dumps(schema).encode()

    def zz(n):  # zigzag varint
        acc = (n << 1) ^ (n >> 63) if n < 0 else n << 1
        out = b""
        while True:
            b, acc = acc & 0x7F, acc >> 7
            out += bytes([b | 0x80] if acc else [b])
            if not acc:
                return out

    sync = bytes(range(16))
    meta = (
        zz(2)
        + zz(len(b"avro.schema")) + b"avro.schema" + zz(len(sj)) + sj
        + zz(len(b"avro.codec")) + b"avro.codec" + zz(4) + b"null"
        + zz(0)
    )
    # two records: (-3, null) and (150, "hi") — union branch indices
    body = zz(-3) + zz(0) + zz(150) + zz(1) + zz(2) + b"hi"
    blob = b"Obj\x01" + meta + sync + zz(2) + zz(len(body)) + body + sync
    p = tmp_path / "hand.avro"
    p.write_bytes(blob)
    _, got = read_avro_file(p)
    assert got == [{"n": -3, "s": None}, {"n": 150, "s": "hi"}]
    # and 150 zigzags to 300 = 0xAC 0x02 — pin one varint literally
    assert zz(150) == b"\xac\x02"


def test_loud_guards(tmp_path):
    p = tmp_path / "bad.avro"
    p.write_bytes(b"PAR1 not avro")
    with pytest.raises(ValueError, match="not an Avro"):
        read_avro_file(p)
    write_avro_file(
        tmp_path / "ok.avro",
        {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]},
        [{"x": 1}],
    )
    raw = bytearray((tmp_path / "ok.avro").read_bytes())
    raw[-1] ^= 0xFF  # corrupt the trailing sync
    (tmp_path / "corrupt.avro").write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="sync"):
        read_avro_file(tmp_path / "corrupt.avro")
    with pytest.raises(NotImplementedError, match="snappy"):
        write_avro_file(tmp_path / "s.avro", "\"long\"", [1], codec="snappy")


def test_skippable_negative_block_counts(tmp_path):
    """Array/map block runs with NEGATIVE counts (byte size follows —
    the spec's skippable form other writers emit) decode correctly."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": {"type": "array", "items": "long"}}],
    }
    sj = json.dumps(schema).encode()

    def zz(n):
        acc = (n << 1) ^ (n >> 63) if n < 0 else n << 1
        out = b""
        while True:
            b, acc = acc & 0x7F, acc >> 7
            out += bytes([b | 0x80] if acc else [b])
            if not acc:
                return out

    items = zz(7) + zz(8)
    body = zz(-2) + zz(len(items)) + items + zz(1) + zz(9) + zz(0)
    sync = b"\x01" * 16
    meta = (
        zz(1)
        + zz(len(b"avro.schema")) + b"avro.schema" + zz(len(sj)) + sj
        + zz(0)
    )
    blob = b"Obj\x01" + meta + sync + zz(1) + zz(len(body)) + body + sync
    (tmp_path / "neg.avro").write_bytes(blob)
    _, got = read_avro_file(tmp_path / "neg.avro")
    assert got == [{"a": [7, 8, 9]}]


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.fixed_dictionaries(
            {
                "n": st.integers(min_value=-(2**63), max_value=2**63 - 1),
                "s": st.one_of(st.none(), st.text(max_size=40)),
                "d": st.floats(allow_nan=False),
                "tags": st.lists(st.text(max_size=8), max_size=5),
            }
        ),
        max_size=25,
    ),
    codec=st.sampled_from(["null", "deflate"]),
)
def test_fuzz_round_trip(tmp_path_factory, rows, codec):
    schema = {
        "type": "record",
        "name": "fz",
        "fields": [
            {"name": "n", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
        ],
    }
    p = tmp_path_factory.mktemp("avro_fuzz") / "f.avro"
    write_avro_file(p, schema, rows, codec=codec, records_per_block=7)
    _, got = read_avro_file(p)
    assert got == rows


def test_read_avro_files_distributed(spark, tmp_path):
    """The distributed DATA on-ramp: multi-file directory, executor-
    side decode, schema inferred from one header read, nullable
    unions, arrays; glob prunes sidecars; schema= pins the type for
    an empty dir."""
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": ["null", "string"], "default": None},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
        ],
    }
    rows_a = [
        {"doc_id": 1, "text": "alpha", "tags": ["x", "y"]},
        {"doc_id": 2, "text": None, "tags": []},
    ]
    rows_b = [{"doc_id": 3, "text": "beta", "tags": ["z"]}]
    write_avro_file(tmp_path / "a.avro", schema, rows_a)
    write_avro_file(tmp_path / "b.avro", schema, rows_b, codec="null")
    (tmp_path / "junk.txt").write_text("not avro")

    from snapflow_spark.sources.io import read_avro_files

    out = read_avro_files(spark, str(tmp_path))
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,tags:array<string>>"
    )
    got = {
        r.doc_id: (r.text, list(r.tags)) for r in out.collect()
    }
    assert got == {1: ("alpha", ["x", "y"]), 2: (None, []), 3: ("beta", ["z"])}

    empty = tmp_path / "none"
    empty.mkdir()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no files"):
        read_avro_files(spark, str(empty))
    pinned = read_avro_files(
        spark, str(empty), schema="doc_id bigint, text string"
    )
    assert pinned.count() == 0 and pinned.columns == ["doc_id", "text"]


def test_avro_to_spark_schema_guards():
    from snapflow_spark.sources.io import avro_to_spark_schema

    with pytest.raises(NotImplementedError, match="union"):
        avro_to_spark_schema(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "x", "type": ["long", "string"]}],
            }
        )
    with pytest.raises(ValueError, match="must be a record"):
        avro_to_spark_schema("long")


def test_yaml_scan_avro_builtin(spark, tmp_path):
    from snapflow_spark.plans import load_graph

    write_avro_file(
        tmp_path / "d.avro",
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "n", "type": "long"}],
        },
        [{"n": 1}, {"n": 2}],
    )
    cfg = {
        "warehouse": str(tmp_path / "wh_avro"),
        "nodes": [
            {
                "name": "navro",
                "function": "core.scan_avro",
                "params": {"path": str(tmp_path)},
                "overwrite": True,
            }
        ],
    }
    g = load_graph(cfg)
    assert g.produce(spark) == 1
    assert {r.n for r in g.read(spark, "navro").collect()} == {1, 2}
