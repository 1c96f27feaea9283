"""Nested columns on column-mapped Delta tables (round 16): struct
fields rename physically at EVERY level (the on-disk shape modern
Databricks mode=name tables store).  Reads rebuild the logical shape
with one positional struct cast (pure codegen); mode=name writes cast
the other way; mode=id nested reads bind by the footer field ids of
INNER fields.  Enabling mapping on a nested table binds every level
by current-name; evolution assigns fresh uuids to nested children."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from snapflow_spark.sources.delta import (
    delete_from_delta,
    delta_snapshot,
    read_delta,
    set_delta_properties,
    write_delta,
)


def _nested_mapped_table(spark, table: Path):
    """Hand-publish a mode=name table with a struct column: parquet
    columns AND inner struct fields carry physical uuids."""
    import shutil

    log = table / "_delta_log"
    log.mkdir(parents=True)
    d = table / "part-0.parquet"
    tmp = str(d) + ".tmp"
    spark.createDataFrame(
        [(0, ("alice", 30)), (1, ("bob", 40))],
        "`c-id` bigint, `c-p` struct<`c-nm`: string, `c-age`: int>",
    ).coalesce(1).write.parquet(tmp)
    next(Path(tmp).glob("*.parquet")).rename(d)
    shutil.rmtree(tmp)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "c-id"}},
            {
                "name": "person",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "c-p",
                },
                "type": {
                    "type": "struct",
                    "fields": [
                        {"name": "name", "type": "string",
                         "nullable": True,
                         "metadata": {
                             "delta.columnMapping.id": 3,
                             "delta.columnMapping.physicalName":
                                 "c-nm"}},
                        {"name": "age", "type": "integer",
                         "nullable": True,
                         "metadata": {
                             "delta.columnMapping.id": 4,
                             "delta.columnMapping.physicalName":
                                 "c-age"}},
                    ],
                },
            },
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "nested-cm",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": "4",
            },
        }},
        {"add": {"path": d.name, "partitionValues": {},
                 "size": d.stat().st_size, "modificationTime": 0,
                 "dataChange": True}},
    ]
    (log / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n"
    )


def _rows(df):
    return {
        (r.id, r.person.name, r.person.age) for r in df.collect()
    }


def test_nested_mapped_read_write_delete(spark, tmp_path):
    table = tmp_path / "t"
    _nested_mapped_table(spark, table)
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "person"]
    assert [f.name for f in got.schema["person"].dataType.fields] == [
        "name", "age"
    ]
    assert _rows(got) == {(0, "alice", 30), (1, "bob", 40)}
    # nested predicates work on the LOGICAL names
    assert got.where("person.age > 35").count() == 1
    # engine APPEND stages the nested physical shape
    write_delta(
        spark.createDataFrame(
            [(2, ("carol", 50))],
            "id long, person struct<name: string, age: int>",
        ),
        table, mode="append",
    )
    assert _rows(read_delta(spark, table)) == {
        (0, "alice", 30), (1, "bob", 40), (2, "carol", 50)
    }
    # the appended file's parquet columns are PHYSICAL at both levels
    import pyarrow.parquet as pq

    snap = delta_snapshot(spark, table)
    new = [rel for rel, _pv, _sz, _st in snap.files
           if rel != "part-0.parquet"]
    assert new
    sch = pq.ParquetFile(table / new[0]).schema_arrow
    assert set(sch.names) == {"c-id", "c-p"}
    inner = {f.name for f in sch.field("c-p").type}
    assert inner == {"c-nm", "c-age"}
    # DV DELETE with a NESTED predicate
    n = delete_from_delta(spark, table, "person.name = 'bob'")
    assert n == 1
    assert _rows(read_delta(spark, table)) == {
        (0, "alice", 30), (2, "carol", 50)
    }


def test_enable_mapping_binds_nested_levels(spark, tmp_path):
    table = tmp_path / "t"
    write_delta(
        spark.createDataFrame(
            [(1, ("x", 9))],
            "id long, person struct<name: string, age: int>",
        ),
        table,
    )
    set_delta_properties(
        spark, table, {"delta.columnMapping.mode": "name"}
    )
    snap = delta_snapshot(spark, table)
    person = snap.schema["person"]
    assert person.metadata["delta.columnMapping.physicalName"] == (
        "person"
    )
    for f in person.dataType.fields:
        assert f.metadata["delta.columnMapping.physicalName"] == f.name
        assert "delta.columnMapping.id" in f.metadata
    assert int(
        snap.metadata["configuration"]["delta.columnMapping.maxColumnId"]
    ) == 4
    # pre-mapping files (logical names on disk) still read
    assert _rows(read_delta(spark, table)) == {(1, "x", 9)}
    # and appends + evolution keep working; a NEW struct column's
    # nested children get fresh uuids
    write_delta(
        spark.createDataFrame(
            [(2, ("y", 8), (1.0, 2.0))],
            "id long, person struct<name: string, age: int>, "
            "loc struct<lat: double, lon: double>",
        ),
        table, mode="append", merge_schema=True,
    )
    snap2 = delta_snapshot(spark, table)
    loc = snap2.schema["loc"]
    assert loc.metadata["delta.columnMapping.physicalName"].startswith(
        "col-"
    )
    for f in loc.dataType.fields:
        assert f.metadata["delta.columnMapping.physicalName"].startswith(
            "col-"
        )
    got = {
        (r.id, None if r.loc is None else (r.loc.lat, r.loc.lon))
        for r in read_delta(spark, table).collect()
    }
    assert got == {(1, None), (2, (1.0, 2.0))}


def test_id_mode_nested_read_binds_inner_field_ids(spark, tmp_path):
    """mode=id with a struct column: inner parquet fields bind by
    their footer field ids even under legacy physical names."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = tmp_path / "t"
    log = table / "_delta_log"
    log.mkdir(parents=True)
    d = table / "legacy.parquet"
    inner = pa.struct([
        pa.field("old_nm", pa.string(),
                 metadata={b"PARQUET:field_id": b"3"}),
        pa.field("old_age", pa.int32(),
                 metadata={b"PARQUET:field_id": b"4"}),
    ])
    arrow_schema = pa.schema([
        pa.field("old_id", pa.int64(),
                 metadata={b"PARQUET:field_id": b"1"}),
        pa.field("old_p", inner,
                 metadata={b"PARQUET:field_id": b"2"}),
    ])
    pq.write_table(
        pa.table(
            {"old_id": [0, 1],
             "old_p": [{"old_nm": "a", "old_age": 7},
                       {"old_nm": "b", "old_age": 8}]},
            schema=arrow_schema,
        ),
        d,
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "pp-1"}},
            {"name": "person", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "pp-2"},
             "type": {"type": "struct", "fields": [
                 {"name": "name", "type": "string", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 3,
                               "delta.columnMapping.physicalName":
                                   "pp-3"}},
                 {"name": "age", "type": "integer", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 4,
                               "delta.columnMapping.physicalName":
                                   "pp-4"}},
             ]}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "nested-id",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
        }},
        {"add": {"path": d.name, "partitionValues": {},
                 "size": d.stat().st_size, "modificationTime": 0,
                 "dataChange": True}},
    ]
    (log / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n"
    )
    got = read_delta(spark, table)
    assert _rows(got) == {(0, "a", 7), (1, "b", 8)}
    # mode=id nested WRITES stay loud
    with pytest.raises(NotImplementedError, match="mode=id"):
        write_delta(
            spark.createDataFrame(
                [(2, ("c", 9))],
                "id long, person struct<name: string, age: int>",
            ),
            table, mode="append",
        )
