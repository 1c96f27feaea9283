"""Nested-column Iceberg exports (round 16): structs, arrays, maps
and decimals write with depth-first unique field ids (element-id /
key-id / value-id included) and read back through the existing
nested-aware reader; merge_schema shifts EVERY id in a fresh nested
subtree past the table ceiling (never-reuse)."""

from __future__ import annotations

import json
from decimal import Decimal

import pytest

from snapflow_spark.sources.iceberg import (
    _iceberg_schema,
    _max_field_id,
    _metadata_path,
    iceberg_snapshot,
    read_iceberg,
    upsert_iceberg,
    write_iceberg,
)

SCHEMA = (
    "id long, person struct<name: string, age: int>, "
    "tags array<string>, counts map<string, long>, price decimal(10,2)"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


ROWS = [
    (0, ("alice", 30), ["a", "b"], {"x": 1}, Decimal("9.50")),
    (1, ("bob", 40), [], {}, Decimal("0.05")),
    (2, (None, None), None, None, None),
]


def _rows(df):
    return {
        (
            r.id,
            None if r.person is None else (r.person.name, r.person.age),
            None if r.tags is None else tuple(r.tags),
            None if r.counts is None else tuple(sorted(r.counts.items())),
            r.price,
        )
        for r in df.collect()
    }


def test_nested_schema_ids_unique_and_spec_shaped(spark):
    sch = _iceberg_schema(_df(spark, ROWS).schema)
    ids = []

    def walk(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                for f in t["fields"]:
                    ids.append(int(f["id"]))
                    walk(f["type"])
            elif t.get("type") == "list":
                ids.append(int(t["element-id"]))
                walk(t["element"])
            elif t.get("type") == "map":
                ids.append(int(t["key-id"]))
                ids.append(int(t["value-id"]))
                walk(t["key"])
                walk(t["value"])

    walk(sch)
    assert len(ids) == len(set(ids)) == 10  # 5 top + 2 struct + 1 + 2
    assert _max_field_id(sch["fields"]) == 10
    by_name = {f["name"]: f for f in sch["fields"]}
    assert by_name["price"]["type"] == "decimal(10,2)"
    assert by_name["tags"]["type"]["type"] == "list"
    assert by_name["counts"]["type"]["type"] == "map"


def test_nested_write_read_append_upsert(spark, tmp_path):
    t = tmp_path / "t"
    write_iceberg(_df(spark, ROWS), t)
    got = read_iceberg(spark, t)
    assert _rows(got) == _rows(_df(spark, ROWS))
    # nested predicates on the read
    assert got.where("person.age > 35").count() == 1
    s0 = iceberg_snapshot(spark, t).snapshot_id
    # append keeps ids; upsert replaces by key on the nested table
    write_iceberg(
        _df(spark, [(3, ("carol", 50), ["z"], {"k": 9},
                     Decimal("1.00"))]),
        t, mode="append",
    )
    res = upsert_iceberg(
        spark, t,
        _df(spark, [(0, ("ALICE", 31), ["a"], {"x": 2},
                     Decimal("9.99"))]),
        keys=["id"],
    )
    assert res["keys"] == 1
    final = {r.id: (None if r.person is None else r.person.name)
             for r in read_iceberg(spark, t).collect()}
    assert final == {0: "ALICE", 1: "bob", 2: None, 3: "carol"}
    assert _rows(read_iceberg(spark, t, snapshot_id=s0)) == _rows(
        _df(spark, ROWS)
    )


def test_merge_schema_shifts_nested_ids(spark, tmp_path):
    t = tmp_path / "t"
    write_iceberg(_df(spark, ROWS), t)
    write_iceberg(
        spark.createDataFrame(
            [(9, ("dave", 60), ["q"], {"m": 3}, Decimal("2.00"),
              (4.5, 6.7))],
            SCHEMA + ", loc struct<lat: double, lon: double>",
        ),
        t, mode="append", merge_schema=True,
    )
    meta = json.loads(_metadata_path(t).read_text())
    fields = meta["schema"]["fields"]
    loc = next(f for f in fields if f["name"] == "loc")
    inner_ids = [int(g["id"]) for g in loc["type"]["fields"]]
    prev_max = 10  # the base schema's ceiling
    assert int(loc["id"]) > prev_max
    assert all(i > prev_max for i in inner_ids)
    assert int(meta["last-column-id"]) == _max_field_id(fields)
    got = {
        (r.id, None if r.loc is None else (r.loc.lat, r.loc.lon))
        for r in read_iceberg(spark, t).collect()
    }
    assert got == {(0, None), (1, None), (2, None), (9, (4.5, 6.7))}
