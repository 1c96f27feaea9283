"""Iceberg format-version 3 READ tier (round 16): a HAND-synthesized
v3 table — metadata JSON + Avro manifests built from the spec, not by
our writer — whose position deletes are puffin DELETION VECTORS
(``deletion-vector-v1``: 4-byte BE length, the D1 D3 39 64 magic =
the portable RoaringBitmapArray magic little-endian, the 64-bit
portable bitmap, a BE CRC-32).  Reads apply the DV per referenced
data file; v3 writes refuse loudly."""

from __future__ import annotations

import json
import struct
import zlib
from pathlib import Path

import pytest

from snapflow_spark.functions.avro_codec import write_avro_file
from snapflow_spark.sources.deletion_vectors import encode_dv_data
from snapflow_spark.sources.iceberg import (
    _decode_puffin_dv,
    iceberg_snapshot,
    read_iceberg,
    write_iceberg,
)

_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition",
                     "type": {"type": "record", "name": "r102",
                              "fields": []}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "referenced_data_file",
                     "type": ["null", "string"], "default": None},
                    {"name": "content_offset",
                     "type": ["null", "long"], "default": None},
                    {"name": "content_size_in_bytes",
                     "type": ["null", "long"], "default": None},
                ],
            },
        },
    ],
}

_ML_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None},
    ],
}


def _dv_blob(positions) -> bytes:
    """The spec's deletion-vector-v1 blob: BE length + (magic LE +
    portable bitmap) + BE CRC-32 of the magic+vector bytes."""
    vector = encode_dv_data(positions)  # magic-prefixed portable
    return (
        struct.pack(">I", len(vector))
        + vector
        + struct.pack(">I", zlib.crc32(vector) & 0xFFFFFFFF)
    )


def _synthesize_v3(spark, table: Path, dv_positions) -> None:
    """One data file of rows id 0..9, one puffin DV deleting
    ``dv_positions`` of it, format-version 3 metadata."""
    md = table / "metadata"
    data = table / "data"
    md.mkdir(parents=True)
    data.mkdir(parents=True)
    # the data file
    dfile = data / "f1.parquet"
    tmp = str(dfile) + ".tmp"
    spark.createDataFrame(
        [(i, f"row{i}") for i in range(10)], "id bigint, text string"
    ).coalesce(1).write.parquet(tmp)
    next(Path(tmp).glob("*.parquet")).rename(dfile)
    import shutil

    shutil.rmtree(tmp)
    # the puffin file: a header blob we must NOT misread, then the DV
    # at a recorded offset, then trailing bytes
    puffin = data / "dv.puffin"
    head = b"PFA1" + b"\x00" * 13
    blob = _dv_blob(dv_positions)
    puffin.write_bytes(head + blob + b"\xaa" * 7)
    # manifests
    write_avro_file(
        md / "m-data.avro",
        _ENTRY_SCHEMA,
        [
            {
                "status": 1,
                "snapshot_id": 1,
                "sequence_number": 1,
                "data_file": {
                    "content": 0,
                    "file_path": str(dfile),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 10,
                    "file_size_in_bytes": dfile.stat().st_size,
                },
            }
        ],
        extra_metadata={"content": "data"},
    )
    write_avro_file(
        md / "m-dv.avro",
        _ENTRY_SCHEMA,
        [
            {
                "status": 1,
                "snapshot_id": 2,
                "sequence_number": 2,
                "data_file": {
                    "content": 1,
                    "file_path": str(puffin),
                    "file_format": "PUFFIN",
                    "partition": {},
                    "record_count": len(dv_positions),
                    "file_size_in_bytes": puffin.stat().st_size,
                    "referenced_data_file": str(dfile),
                    "content_offset": len(head),
                    "content_size_in_bytes": len(blob),
                },
            }
        ],
        extra_metadata={"content": "deletes"},
    )
    write_avro_file(
        md / "ml.avro",
        _ML_SCHEMA,
        [
            {"manifest_path": str(md / "m-data.avro"),
             "manifest_length": (md / "m-data.avro").stat().st_size,
             "partition_spec_id": 0, "content": 0,
             "sequence_number": 1},
            {"manifest_path": str(md / "m-dv.avro"),
             "manifest_length": (md / "m-dv.avro").stat().st_size,
             "partition_spec_id": 0, "content": 1,
             "sequence_number": 2},
        ],
    )
    meta = {
        "format-version": 3,
        "table-uuid": "v3-tbl",
        "location": str(table),
        "last-updated-ms": 1,
        "last-column-id": 2,
        "last-sequence-number": 2,
        "next-row-id": 10,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "id", "required": False,
                     "type": "long"},
                    {"id": 2, "name": "text", "required": False,
                     "type": "string"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": 2,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1,
             "summary": {"operation": "append"},
             "manifest-list": str(md / "ml.avro")},
            {"snapshot-id": 2, "timestamp-ms": 2,
             "summary": {"operation": "delete"},
             "manifest-list": str(md / "ml.avro")},
        ],
    }
    (md / "v1.metadata.json").write_text(json.dumps(meta))
    (md / "version-hint.text").write_text("1")


def test_v3_deletion_vector_read(spark, tmp_path):
    table = tmp_path / "v3"
    _synthesize_v3(spark, table, [1, 3, 7])
    snap = iceberg_snapshot(spark, table)
    assert len(snap.dv_deletes) == 1
    ref, puf, off, sz = snap.dv_deletes[0]
    assert ref.endswith("f1.parquet") and off == 17
    got = {(r.id, r.text) for r in read_iceberg(spark, table).collect()}
    assert got == {
        (i, f"row{i}") for i in range(10) if i not in (1, 3, 7)
    }


def test_v3_large_dv_and_decoder_framing(spark, tmp_path):
    """A DV spanning multiple 64k containers decodes exactly, and the
    decoder validates length + CRC framing."""
    positions = sorted(
        set(range(0, 500)) | {65536 + i for i in range(0, 1000, 3)}
    )
    blob = _dv_blob(positions)
    p = tmp_path / "x.puffin"
    p.write_bytes(b"\x01" * 5 + blob)
    assert _decode_puffin_dv(str(p), 5, len(blob)) == positions
    # corrupted CRC refuses
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    p2 = tmp_path / "bad.puffin"
    p2.write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="CRC"):
        _decode_puffin_dv(str(p2), 0, len(bad))
    # garbage at the offset refuses with the magic named
    p3 = tmp_path / "junk.puffin"
    p3.write_bytes(b"\x00" * 32)
    with pytest.raises(ValueError, match="magic"):
        _decode_puffin_dv(str(p3), 0, 32)


def test_v3_writes_refuse_loudly(spark, tmp_path):
    from snapflow_spark.sources.iceberg import (
        delete_iceberg_by_key,
        upsert_iceberg,
    )

    table = tmp_path / "v3"
    _synthesize_v3(spark, table, [0])
    df = spark.createDataFrame([(99, "x")], "id bigint, text string")
    with pytest.raises(NotImplementedError, match="READ-only"):
        write_iceberg(df, table, mode="append")
    with pytest.raises(NotImplementedError, match="READ-only"):
        delete_iceberg_by_key(
            spark, table, spark.createDataFrame([(1,)], "id bigint")
        )
    with pytest.raises(NotImplementedError, match="READ-only"):
        upsert_iceberg(spark, table, df, keys=["id"])
    # format-version BEYOND the read tier still refuses at read
    meta_p = table / "metadata" / "v1.metadata.json"
    m = json.loads(meta_p.read_text())
    m["format-version"] = 4
    meta_p.write_text(json.dumps(m))
    with pytest.raises(NotImplementedError, match="format-version 4"):
        read_iceberg(spark, table)
