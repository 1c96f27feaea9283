"""Iceberg table-layout bridge (sources/iceberg.py): export→read
round trips, snapshot time travel, and a HAND-synthesized v2 table
(metadata JSON + Avro manifest list + Avro manifests built from the
spec, not by our writer) proving the reader against the format —
including identity-transform partition pruning on the file list,
DELETED-entry handling, and every loud guard."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from snapflow_spark.functions.avro_codec import write_avro_file
from snapflow_spark.sources.iceberg import (
    iceberg_snapshot,
    read_iceberg,
    write_iceberg,
)

ROWS_V0 = [(0, "alpha", "en"), (1, "beta", "en"), (2, "gamma", "de")]
ROWS_V1 = [(3, "delta", "fr"), (4, "epsilon", "de")]
SCHEMA = "doc_id bigint, text string, lang string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return {(r.doc_id, r.text, r.lang) for r in df.collect()}


def test_write_read_round_trip(spark, tmp_path):
    path = tmp_path / "tbl"
    s0 = write_iceberg(_df(spark, ROWS_V0), path)
    out = read_iceberg(spark, path)
    assert _rows(out) == set(ROWS_V0)
    assert [f.name for f in out.schema.fields] == ["doc_id", "text", "lang"]
    snap = iceberg_snapshot(spark, path)
    assert snap.snapshot_id == s0
    assert snap.files and all(n > 0 for _p, _pv, n, _bd in snap.files)


def test_append_overwrite_time_travel(spark, tmp_path):
    path = tmp_path / "tbl"
    s0 = write_iceberg(_df(spark, ROWS_V0), path)
    s1 = write_iceberg(_df(spark, ROWS_V1), path, mode="append")
    assert _rows(read_iceberg(spark, path)) == set(ROWS_V0) | set(ROWS_V1)
    assert _rows(read_iceberg(spark, path, snapshot_id=s0)) == set(ROWS_V0)
    s2 = write_iceberg(
        _df(spark, [(9, "omega", "zz")]), path, mode="overwrite"
    )
    assert _rows(read_iceberg(spark, path)) == {(9, "omega", "zz")}
    assert _rows(read_iceberg(spark, path, snapshot_id=s1)) == set(
        ROWS_V0
    ) | set(ROWS_V1)
    assert s0 != s1 != s2
    with pytest.raises(ValueError, match="snapshot 12345"):
        read_iceberg(spark, path, snapshot_id=12345)
    with pytest.raises(FileExistsError):
        write_iceberg(_df(spark, ROWS_V0), path, mode="error")
    with pytest.raises(ValueError, match="schema differs"):
        write_iceberg(
            _df(spark, ROWS_V0).withColumnRenamed("text", "body"),
            path,
            mode="append",
        )


def _synthesize_v2(spark, table: Path, plant_delete_manifest=False,
                   plant_delete_file=False, fmt_version=2,
                   position_deletes=None, plant_equality_delete=False):
    """A partitioned v2 table written from the SPEC: identity
    partition on lang, one data file per lang, one extra file
    tombstoned by a DELETED manifest entry.  ``position_deletes``
    = [(lang, pos), ...] plants a real v2 position-delete file +
    DELETE manifest naming those data rows."""
    md = table / "metadata"
    md.mkdir(parents=True)
    files = []
    for lang, rows in (
        ("en", [(0, "a", "en"), (1, "b", "en")]),
        ("de", [(2, "c", "de")]),
        ("fr", [(3, "dead", "fr")]),  # will be status=DELETED
    ):
        d = table / "data" / f"part-{lang}.parquet"
        d.parent.mkdir(parents=True, exist_ok=True)
        df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
        tmp = str(d) + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        next(Path(tmp).glob("*.parquet")).rename(d)
        import shutil

        shutil.rmtree(tmp)
        files.append((lang, d))

    entry_schema = {
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
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [
                                    {"name": "lang",
                                     "type": ["null", "string"],
                                     "default": None},
                                    {"name": "id_bucket",
                                     "type": ["null", "int"],
                                     "default": None},
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

    def entry(lang, p, status=1, content=0, id_bucket=None):
        return {
            "status": status,
            "data_file": {
                "content": content,
                "file_path": f"file://{p}",  # exercise the scheme strip
                "file_format": "parquet",
                "partition": {"lang": lang, "id_bucket": id_bucket},
                "record_count": 1,
                "file_size_in_bytes": p.stat().st_size,
            },
        }

    # true bucket[4] values of each file's doc_ids (spec murmur3:
    # ids 0,1,2 all land in bucket 0; id 3 lands in bucket 3)
    entries = [
        entry("en", files[0][1], id_bucket=0),
        entry("de", files[1][1], id_bucket=0),
        entry("fr", files[2][1], status=2, id_bucket=3),  # DELETED
    ]
    if plant_delete_file:
        entries.append(entry("en", files[0][1], content=1))
    write_avro_file(md / "m1.avro", entry_schema, entries)

    ml_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "content", "type": "int"},
        ],
    }
    ml_entries = [
        {
            "manifest_path": str(md / "m1.avro"),
            "manifest_length": (md / "m1.avro").stat().st_size,
            "partition_spec_id": 0,
            "content": 0,
        }
    ]
    if plant_delete_manifest:
        ml_entries.append({**ml_entries[0], "content": 1})
    if position_deletes or plant_equality_delete:
        # a real v2 DELETE manifest: its entries carry content=1
        # (position) / content=2 (equality) data_file records
        by_lang = dict(files)
        if position_deletes:
            pd_file = table / "data" / "pos-deletes.parquet"
            spark.createDataFrame(
                [
                    (f"file://{by_lang[lang]}", int(pos))
                    for lang, pos in position_deletes
                ],
                "file_path string, pos long",
            ).coalesce(1).write.mode("overwrite").parquet(str(pd_file) + ".tmp")
            next(Path(str(pd_file) + ".tmp").glob("*.parquet")).rename(
                pd_file
            )
            import shutil as _sh

            _sh.rmtree(str(pd_file) + ".tmp")
            del_entries = [entry(None, pd_file, content=1)]
        else:
            del_entries = [entry(None, by_lang["en"], content=2)]
        write_avro_file(md / "m2-deletes.avro", entry_schema, del_entries)
        ml_entries.append(
            {
                "manifest_path": str(md / "m2-deletes.avro"),
                "manifest_length": (md / "m2-deletes.avro").stat().st_size,
                "partition_spec_id": 0,
                "content": 1,
            }
        )
    write_avro_file(md / "snap-1-ml.avro", ml_schema, ml_entries)

    meta = {
        "format-version": fmt_version,
        "table-uuid": "ext-v2",
        "location": str(table),
        "last-updated-ms": 1,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "doc_id", "required": False,
                     "type": "long"},
                    {"id": 2, "name": "text", "required": False,
                     "type": "string"},
                    {"id": 3, "name": "lang", "required": False,
                     "type": "string"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {"name": "lang", "transform": "identity",
                     "source-id": 3, "field-id": 1000},
                    {"name": "id_bucket", "transform": "bucket[4]",
                     "source-id": 1, "field-id": 1001},
                ],
            }
        ],
        "properties": {},
        "current-snapshot-id": 77,
        "snapshots": [
            {
                "snapshot-id": 77,
                "timestamp-ms": 1,
                "summary": {"operation": "append"},
                "manifest-list": str(md / "snap-1-ml.avro"),
            }
        ],
    }
    (md / "v1.metadata.json").write_text(json.dumps(meta))
    (md / "version-hint.text").write_text("1")


def test_reader_against_hand_synthesized_v2(spark, tmp_path):
    table = tmp_path / "ext"
    _synthesize_v2(spark, table)
    got = read_iceberg(spark, table)
    # the fr file is tombstoned by its DELETED manifest entry
    assert _rows(got) == {(0, "a", "en"), (1, "b", "en"), (2, "c", "de")}
    # identity partition pruning hits the FILE LIST
    en = read_iceberg(spark, table, partition_filter={"lang": "en"})
    assert _rows(en) == {(0, "a", "en"), (1, "b", "en")}
    assert all("part-en" in f for f in en.inputFiles())
    # bucket-transform pruning: the probe runs through the spec's
    # murmur3 bucket[4] (doc_ids 0..2 -> bucket 0, 3 -> bucket 3)
    b0 = read_iceberg(spark, table, partition_filter={"id_bucket": 2})
    assert _rows(b0) == {(0, "a", "en"), (1, "b", "en"), (2, "c", "de")}
    assert len(b0.inputFiles()) == 2  # en + de files, fr pruned
    # ... by the SOURCE column name too, and bucket 3 holds only the
    # tombstoned fr file -> zero files survive the prune
    b3 = read_iceberg(spark, table, partition_filter={"doc_id": 3})
    assert b3.count() == 0
    # prune composes with identity on the same spec
    both = read_iceberg(
        spark, table, partition_filter={"lang": "de", "id_bucket": 0}
    )
    assert _rows(both) == {(2, "c", "de")}
    with pytest.raises(ValueError, match="not in"):
        read_iceberg(spark, table, partition_filter={"nope": 1})


def test_loud_guards_on_synthesized_tables(spark, tmp_path):
    # a "delete manifest" whose entries are plain DATA records is
    # malformed — loud, not resurrecting or double-counting
    t1 = tmp_path / "delmanifest"
    _synthesize_v2(spark, t1, plant_delete_manifest=True)
    with pytest.raises(ValueError, match="DELETE manifest"):
        read_iceberg(spark, t1)
    t2 = tmp_path / "delfile"
    _synthesize_v2(spark, t2, plant_delete_file=True)
    with pytest.raises(NotImplementedError, match="DATA manifest"):
        read_iceberg(spark, t2)
    # an equality delete WITHOUT a sequence number cannot be scoped
    # to the data it predates: loud, not silently matching nothing
    t4 = tmp_path / "eqdelete"
    _synthesize_v2(spark, t4, plant_equality_delete=True)
    with pytest.raises(ValueError, match="sequence number"):
        read_iceberg(spark, t4)
    # round 16: format-version 3 now OPENS (the v3 read tier); only
    # versions beyond it refuse — and v3 WRITES stay loud
    t3 = tmp_path / "v3"
    _synthesize_v2(spark, t3, fmt_version=3)
    assert read_iceberg(spark, t3).count() > 0
    with pytest.raises(NotImplementedError, match="READ-only"):
        from snapflow_spark.sources.iceberg import write_iceberg as _wi

        _wi(
            spark.createDataFrame(
                [(9, "x", "zz")],
                "doc_id long, text string, lang string",
            ),
            t3,
            mode="append",
        )
    t5 = tmp_path / "v4"
    _synthesize_v2(spark, t5, fmt_version=4)
    with pytest.raises(NotImplementedError, match="format-version 4"):
        read_iceberg(spark, t5)
    with pytest.raises(FileNotFoundError, match="metadata"):
        read_iceberg(spark, tmp_path / "nothing")


def test_yaml_scan_iceberg_builtin(spark, tmp_path):
    from snapflow_spark.plans import load_graph

    path = tmp_path / "tbl"
    s0 = write_iceberg(_df(spark, ROWS_V0), path)
    write_iceberg(_df(spark, ROWS_V1), path, mode="append")
    cfg = {
        "warehouse": str(tmp_path / "wh_ice"),
        "nodes": [
            {
                "name": "first_commit",
                "function": "core.scan_iceberg",
                "params": {"path": str(path), "snapshot_id": s0},
                "overwrite": True,
            }
        ],
    }
    g = load_graph(cfg)
    assert g.produce(spark) == 1
    assert _rows(g.read(spark, "first_commit")) == set(ROWS_V0)


def test_snapshot_store_export(spark, tmp_path):
    from snapflow_spark.incremental.store import SnapshotStore
    from snapflow_spark.sources.iceberg import snapshot_store_to_iceberg

    store = SnapshotStore(tmp_path / "store")
    store.append(_df(spark, ROWS_V0))
    store.append(_df(spark, ROWS_V1))
    path = tmp_path / "ice_out"
    sid = snapshot_store_to_iceberg(store, spark, path)
    assert sid is not None
    assert _rows(read_iceberg(spark, path)) == set(ROWS_V0) | set(ROWS_V1)
    empty = SnapshotStore(tmp_path / "empty")
    assert snapshot_store_to_iceberg(empty, spark, tmp_path / "i2") is None


def test_bounds_data_skipping(spark, tmp_path):
    """write_iceberg emits lower/upper_bounds (the spec's k/v-record
    arrays, single-value binary serialization) from parquet footers;
    min_max_filter prunes the file list on the decoded ranges and
    keeps bound-less files."""
    import struct

    path = tmp_path / "tbl"
    lo = [(i, f"t{i:03d}", "en") for i in range(10)]
    hi = [(i, f"t{i:03d}", "en") for i in range(100, 110)]
    write_iceberg(_df(spark, lo).coalesce(1), path)
    write_iceberg(_df(spark, hi).coalesce(1), path, mode="append")
    snap = iceberg_snapshot(spark, path)
    ranges = sorted(bd["doc_id"] for _p, _pv, _n, bd in snap.files)
    assert ranges == [(0, 9), (100, 109)]
    assert all("text" in bd for _p, _pv, _n, bd in snap.files)

    probe = read_iceberg(spark, path, min_max_filter={"doc_id": (100, None)})
    assert len(probe.inputFiles()) == 1
    assert {r.doc_id for r in probe.collect()} == set(range(100, 110))
    # string bounds prune too
    sprobe = read_iceberg(
        spark, path, min_max_filter={"text": ("t100", "t109")}
    )
    assert len(sprobe.inputFiles()) == 1
    assert read_iceberg(
        spark, path, min_max_filter={"doc_id": (50, 60)}
    ).count() == 0

    # hand-synthesized manifests without bounds: files always kept
    t2 = tmp_path / "ext"
    _synthesize_v2(spark, t2)
    allkept = read_iceberg(spark, t2, min_max_filter={"doc_id": (999, None)})
    assert len(allkept.inputFiles()) == 2  # no bounds -> cannot skip

    # the binary encoding itself is pinned: 8-byte LE long
    raw = struct.pack("<q", 109)
    from snapflow_spark.sources.iceberg import _decode_bound

    assert _decode_bound("long", raw) == 109
    assert _decode_bound("string", b"abc") == "abc"
    assert _decode_bound("uuid", b"x") is None  # unsupported -> no bound


def test_append_preserves_external_field_ids(spark, tmp_path):
    """Appending to a table whose schema carries NON-sequential field
    ids (schema evolution by an external writer) must reuse those ids:
    regenerating 1..n would remap metadata ids while prior manifests'
    bounds stay keyed by the originals, silently mis-pruning."""
    from snapflow_spark.functions.avro_codec import read_avro_metadata

    path = tmp_path / "tbl"
    write_iceberg(_df(spark, ROWS_V0), path)
    # simulate schema evolution: rewrite the metadata with ids 5/6/7
    md = path / "metadata"
    hint = int((md / "version-hint.text").read_text().strip())
    meta = json.loads((md / f"v{hint}.metadata.json").read_text())
    remap = {1: 5, 2: 6, 3: 7}
    for f in meta["schema"]["fields"]:
        f["id"] = remap[f["id"]]
    meta["last-column-id"] = 7
    (md / f"v{hint}.metadata.json").write_text(json.dumps(meta))

    write_iceberg(_df(spark, ROWS_V1), path, mode="append")
    meta2 = json.loads(
        (md / f"v{hint + 1}.metadata.json").read_text()
    )
    assert [f["id"] for f in meta2["schema"]["fields"]] == [5, 6, 7]
    assert meta2["last-column-id"] == 7
    assert _rows(read_iceberg(spark, path)) == set(ROWS_V0) | set(ROWS_V1)
    # the NEW manifest's bounds are keyed by the preserved ids, so
    # min_max_filter decodes them against the right columns
    probe = read_iceberg(spark, path, min_max_filter={"doc_id": (3, 4)})
    assert _rows(probe) >= set(ROWS_V1)
    # and the new manifest's own schema metadata carries the same ids
    snaps = {s["snapshot-id"]: s for s in meta2["snapshots"]}
    ml = snaps[meta2["current-snapshot-id"]]["manifest-list"]
    ml_local = path / "metadata" / Path(ml).name
    m_meta = read_avro_metadata(ml_local)
    assert m_meta["format-version"] == b"1"


def test_manifest_avro_key_metadata(spark, tmp_path):
    """Manifests and manifest lists carry the Iceberg-required Avro
    key/value metadata ('schema', 'partition-spec', ... on manifests;
    'snapshot-id' lineage on manifest lists) so genuine Iceberg
    readers can open the export."""
    from snapflow_spark.functions.avro_codec import (
        read_avro_file,
        read_avro_metadata,
    )

    path = tmp_path / "tbl"
    s0 = write_iceberg(_df(spark, ROWS_V0), path)
    s1 = write_iceberg(_df(spark, ROWS_V1), path, mode="append")
    md = path / "metadata"
    hint = int((md / "version-hint.text").read_text().strip())
    meta = json.loads((md / f"v{hint}.metadata.json").read_text())
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}

    ml_path = md / Path(snaps[s1]["manifest-list"]).name
    ml_meta = read_avro_metadata(ml_path)
    assert ml_meta["snapshot-id"] == str(s1).encode()
    assert ml_meta["parent-snapshot-id"] == str(s0).encode()
    assert ml_meta["format-version"] == b"1"

    _schema, manifests = read_avro_file(ml_path)
    for m in manifests:
        mpath = md / Path(m["manifest_path"]).name
        mm = read_avro_metadata(mpath)
        for k in (
            "schema",
            "schema-id",
            "partition-spec",
            "partition-spec-id",
            "format-version",
            "content",
        ):
            assert k in mm, f"manifest missing metadata key {k}"
        sch = json.loads(mm["schema"].decode())
        assert [f["name"] for f in sch["fields"]] == [
            "doc_id",
            "text",
            "lang",
        ]
        assert json.loads(mm["partition-spec"].decode()) == []
        assert mm["content"] == b"data"
    # the first snapshot's manifest list has no parent
    ml0 = read_avro_metadata(md / Path(snaps[s0]["manifest-list"]).name)
    assert ml0["parent-snapshot-id"] == b"null"


def _run_ice_stream_once(spark, table, out, ckpt, **opts):
    from snapflow_spark.sources.iceberg import IcebergStreamDataSource

    spark.dataSource.register(IcebergStreamDataSource)
    reader = spark.readStream.format("iceberg_snaps").option(
        "path", str(table)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_source_appends_exactly_once(spark, tmp_path):
    """readStream.format('iceberg_snaps'): the snapshot-lineage
    position is the offset — restart from Spark's own offset log
    consumes ONLY the snapshots that arrived while the stream was
    down (the delta_log source's twin)."""
    table = tmp_path / "tbl"
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    write_iceberg(_df(spark, ROWS_V0), table)
    _run_ice_stream_once(spark, table, out, ckpt)
    assert _rows(spark.read.parquet(str(out))) == set(ROWS_V0)
    # nothing new: a second run appends nothing
    _run_ice_stream_once(spark, table, out, ckpt)
    assert spark.read.parquet(str(out)).count() == len(ROWS_V0)
    # append while the stream is down; restart consumes ONLY the delta
    write_iceberg(_df(spark, ROWS_V1), table, mode="append")
    _run_ice_stream_once(spark, table, out, ckpt)
    assert _rows(spark.read.parquet(str(out))) == set(ROWS_V0) | set(ROWS_V1)
    assert spark.read.parquet(str(out)).count() == len(ROWS_V0) + len(
        ROWS_V1
    )


def test_stream_source_overwrites_and_lineage(spark, tmp_path):
    from snapflow_spark.sources.iceberg import IcebergStreamDataSource

    table = tmp_path / "tbl"
    write_iceberg(_df(spark, ROWS_V0), table)
    out, ckpt = tmp_path / "o1", tmp_path / "c1"
    _run_ice_stream_once(spark, table, out, ckpt)
    assert _rows(spark.read.parquet(str(out))) == set(ROWS_V0)

    # an overwrite snapshot refuses by default ...
    write_iceberg(_df(spark, [(9, "omega", "zz")]), table, mode="overwrite")
    spark.dataSource.register(IcebergStreamDataSource)
    q = (
        spark.readStream.format("iceberg_snaps")
        .option("path", str(table))
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "o2"))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="ignore_overwrites"):
        q.awaitTermination(120)
        q.stop()
    # ... and streams the overwrite's ADDED files with the flag, from
    # a fresh checkpoint + output (FileStreamSink dedupes by batch id)
    md = table / "metadata"
    hint = int((md / "version-hint.text").read_text().strip())
    meta = json.loads((md / f"v{hint}.metadata.json").read_text())
    s_over = meta["current-snapshot-id"]
    _run_ice_stream_once(
        spark, table, tmp_path / "o3", tmp_path / "c2",
        ignore_overwrites="true", starting_snapshot=str(s_over),
    )
    assert _rows(spark.read.parquet(str(tmp_path / "o3"))) == {
        (9, "omega", "zz")
    }
    # starting_snapshot="latest" sees nothing until a NEW commit lands
    _run_ice_stream_once(
        spark, table, tmp_path / "o4", tmp_path / "c3",
        starting_snapshot="latest",
    )
    import os

    assert not any(
        f.endswith(".parquet") for f in os.listdir(tmp_path / "o4")
    ) or spark.read.parquet(str(tmp_path / "o4")).count() == 0


def test_position_deletes_applied(spark, tmp_path):
    """A hand-synthesized v2 table with a REAL position-delete file
    (DELETE manifest -> content=1 parquet of (file_path, pos)): the
    named rows disappear, other files are untouched, and pruning
    still composes."""
    table = tmp_path / "pdel"
    _synthesize_v2(spark, table, position_deletes=[("en", 1)])
    got = read_iceberg(spark, table)
    # en row at pos 1 == (1, "b", "en") is deleted; fr was tombstoned
    assert _rows(got) == {(0, "a", "en"), (2, "c", "de")}
    assert [f.name for f in got.schema.fields] == ["doc_id", "text", "lang"]
    # partition pruning composes with delete application
    en = read_iceberg(spark, table, partition_filter={"lang": "en"})
    assert _rows(en) == {(0, "a", "en")}
    de = read_iceberg(spark, table, partition_filter={"lang": "de"})
    assert _rows(de) == {(2, "c", "de")}
    # deleting EVERY row of a file leaves the others alone
    t2 = tmp_path / "pdel_all"
    _synthesize_v2(spark, t2, position_deletes=[("en", 0), ("en", 1)])
    assert _rows(read_iceberg(spark, t2)) == {(2, "c", "de")}


def test_as_of_ms_time_travel(spark, tmp_path):
    """read_iceberg(as_of_ms=...) picks the newest snapshot whose
    timestamp-ms is at or before the probe."""
    path = tmp_path / "tbl"
    s0 = write_iceberg(_df(spark, ROWS_V0), path)
    s1 = write_iceberg(_df(spark, ROWS_V1), path, mode="append")
    md = path / "metadata"
    hint = int((md / "version-hint.text").read_text().strip())
    mpath = md / f"v{hint}.metadata.json"
    meta = json.loads(mpath.read_text())
    # pin deterministic commit times: s0 at 1000ms, s1 at 2000ms
    for s in meta["snapshots"]:
        s["timestamp-ms"] = 1000 if s["snapshot-id"] == s0 else 2000
    mpath.write_text(json.dumps(meta))
    assert _rows(read_iceberg(spark, path, as_of_ms=1500)) == set(ROWS_V0)
    assert _rows(read_iceberg(spark, path, as_of_ms=2000)) == set(
        ROWS_V0
    ) | set(ROWS_V1)
    with pytest.raises(ValueError, match="no snapshot at or before"):
        read_iceberg(spark, path, as_of_ms=999)
    with pytest.raises(ValueError, match="not several"):
        read_iceberg(spark, path, snapshot_id=s1, as_of_ms=1500)


def test_expire_snapshots_reclaims_storage(spark, tmp_path):
    """expire_iceberg_snapshots: snapshots outside keep_last expire,
    files ONLY they referenced are deleted (manifest lists, manifests,
    data files), shared files survive, the metadata rewrites with the
    pruned lineage, and time travel to an expired id now raises."""
    from snapflow_spark.sources.iceberg import expire_iceberg_snapshots

    path = tmp_path / "tbl"
    s0 = write_iceberg(_df(spark, ROWS_V0), path)
    s1 = write_iceberg(_df(spark, ROWS_V1), path, mode="append")
    # s2 overwrites: s0/s1 data no longer referenced by the tail
    s2 = write_iceberg(
        _df(spark, [(9, "omega", "zz")]), path, mode="overwrite"
    )
    s0_files = {p for p, *_ in iceberg_snapshot(spark, path, snapshot_id=s0).files}
    s1_files = {p for p, *_ in iceberg_snapshot(spark, path, snapshot_id=s1).files}
    assert s0_files <= s1_files  # append kept s0's manifests
    dry = expire_iceberg_snapshots(spark, path, keep_last=1, dry_run=True)
    assert dry and all((path / rel).exists() for rel in dry)
    gone = expire_iceberg_snapshots(spark, path, keep_last=1)
    assert gone == dry
    assert not any((path / rel).exists() for rel in gone)
    # every s0/s1 data file is gone; the current snapshot reads fine
    assert not any(Path(p).exists() for p in s1_files)
    assert _rows(read_iceberg(spark, path)) == {(9, "omega", "zz")}
    with pytest.raises(ValueError, match=f"snapshot {s0}"):
        read_iceberg(spark, path, snapshot_id=s0)
    # expiring again is a no-op
    assert expire_iceberg_snapshots(spark, path, keep_last=1) == []
    assert s2 == iceberg_snapshot(spark, path).snapshot_id


def test_expire_snapshots_keeps_shared_files(spark, tmp_path):
    """keep_last=2 on an append chain: the expired snapshot's files
    are ALL shared with the kept ones (append re-lists manifests), so
    nothing is deleted except its own manifest list."""
    from snapflow_spark.sources.iceberg import expire_iceberg_snapshots

    path = tmp_path / "tbl"
    s0 = write_iceberg(_df(spark, ROWS_V0), path)
    write_iceberg(_df(spark, ROWS_V1), path, mode="append")
    write_iceberg(_df(spark, [(9, "omega", "zz")]), path, mode="append")
    gone = expire_iceberg_snapshots(spark, path, keep_last=2)
    # only s0's manifest LIST is uniquely s0's; its manifest + data
    # files are re-listed by the kept appends and survive
    assert len(gone) == 1 and "manifest-list" in gone[0]
    assert _rows(read_iceberg(spark, path)) == set(ROWS_V0) | set(
        ROWS_V1
    ) | {(9, "omega", "zz")}
    with pytest.raises(ValueError, match=f"snapshot {s0}"):
        read_iceberg(spark, path, snapshot_id=s0)
    # older_than_ms in the future + keep_last=1 expires the middle one
    with pytest.raises(ValueError, match="keep_last"):
        expire_iceberg_snapshots(spark, path, keep_last=0)


def test_iceberg_stream_sink_exactly_once(spark, tmp_path):
    """foreachBatch -> iceberg_stream_sink: micro-batches land as
    summary-stamped snapshots; re-running the SAME batches from a
    fresh checkpoint does not duplicate rows (the snapshot lineage is
    the idempotence ledger, the Flink-sink recipe)."""
    from snapflow_spark.sources.iceberg import iceberg_stream_sink

    src = tmp_path / "src"
    table = tmp_path / "tbl"
    _df(spark, ROWS_V0).write.parquet(str(src), mode="overwrite")

    def run(ckpt):
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(str(src))
            .writeStream.foreachBatch(
                iceberg_stream_sink(table, "ingest-test")
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ck1")
    assert _rows(read_iceberg(spark, table)) == set(ROWS_V0)
    n1 = read_iceberg(spark, table).count()
    # fresh checkpoint replays batch 0: the summary high-water mark
    # (streaming.ingest-test.batch-id = 0) suppresses the duplicate
    run("ck2")
    assert read_iceberg(spark, table).count() == n1
    # an interleaved NON-sink commit doesn't drop the mark
    write_iceberg(_df(spark, [(9, "omega", "zz")]), table, mode="append")
    run("ck3")
    assert read_iceberg(spark, table).count() == n1 + 1
    # new data arrives; the next batch id commits normally
    _df(spark, ROWS_V1).write.parquet(str(src), mode="append")
    run("ck1")
    assert _rows(read_iceberg(spark, table)) == set(ROWS_V0) | set(
        ROWS_V1
    ) | {(9, "omega", "zz")}


def test_remove_orphan_files(spark, tmp_path):
    """remove_orphan_iceberg_files deletes unreferenced data/ files
    outside the retention window, never referenced ones, never
    metadata, and never fresh (in-flight) files."""
    import os as _os

    from snapflow_spark.sources.iceberg import remove_orphan_iceberg_files

    table = tmp_path / "tbl"
    write_iceberg(_df(spark, ROWS_V0), table)
    orphan = table / "data" / "crashed-stage.parquet"
    orphan.write_bytes(b"leftover")
    # fresh orphan: retention keeps it (default AND explicit 0 with a
    # future mtime)
    assert remove_orphan_iceberg_files(spark, table) == []
    future = __import__("time").time() + 3600
    _os.utime(orphan, (future, future))
    assert remove_orphan_iceberg_files(spark, table, retention_hours=0) == []
    # aged orphan: listed by dry run, then reclaimed
    _os.utime(orphan, (1000, 1000))
    dry = remove_orphan_iceberg_files(
        spark, table, retention_hours=0, dry_run=True
    )
    assert dry == ["data/crashed-stage.parquet"] and orphan.exists()
    gone = remove_orphan_iceberg_files(spark, table, retention_hours=0)
    assert gone == dry and not orphan.exists()
    # referenced files survive even when aged
    ref = Path(iceberg_snapshot(spark, table).files[0][0])
    _os.utime(ref, (1000, 1000))
    assert remove_orphan_iceberg_files(spark, table, retention_hours=0) == []
    assert _rows(read_iceberg(spark, table)) == set(ROWS_V0)
    with pytest.raises(ValueError, match="retention_hours"):
        remove_orphan_iceberg_files(spark, table, retention_hours=-1)


def test_equality_deletes_scoped_by_sequence(spark, tmp_path):
    """v2 equality deletes: a delete file of equality_ids columns
    removes MATCHING rows only from data files with a strictly
    smaller data sequence number — rows written after the delete
    survive, null-safe matching applies, and unscoped (sequence-less)
    deletes raise (covered in the loud-guards test)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = tmp_path / "eq"
    md = table / "metadata"
    md.mkdir(parents=True)
    (table / "data").mkdir(parents=True)

    def data_file(name, rows):
        p = table / "data" / name
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(p) + ".tmp")
        next(Path(str(p) + ".tmp").glob("*.parquet")).rename(p)
        import shutil

        shutil.rmtree(str(p) + ".tmp")
        return p

    old = data_file(
        "old.parquet",
        [(0, "a", "en"), (1, "b", "de"), (2, "c", None)],
    )
    new = data_file("new.parquet", [(3, "d", "en"), (4, "e", None)])
    # the equality delete file: lang column only (field id 3),
    # deleting 'en' AND the null lang
    eq = table / "data" / "eq-del.parquet"
    pq.write_table(
        pa.table({"lang": pa.array(["en", None], type=pa.string())}), eq
    )

    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
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
                        {"name": "equality_ids",
                         "type": ["null", {"type": "array",
                                           "items": "int"}],
                         "default": None},
                    ],
                },
            },
        ],
    }

    def entry(p, content=0, seq=None, eq_ids=None):
        return {
            "status": 1,
            "sequence_number": seq,
            "data_file": {
                "content": content,
                "file_path": f"file://{p}",
                "file_format": "parquet",
                "partition": {},
                "record_count": 1,
                "file_size_in_bytes": p.stat().st_size,
                "equality_ids": eq_ids,
            },
        }

    write_avro_file(md / "m-old.avro", entry_schema, [entry(old)])
    write_avro_file(md / "m-new.avro", entry_schema, [entry(new)])
    write_avro_file(
        md / "m-del.avro", entry_schema,
        [entry(eq, content=2, eq_ids=[3])],
    )
    ml_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "content", "type": "int"},
            {"name": "sequence_number", "type": "long"},
        ],
    }

    def ml_entry(name, content, seq):
        return {
            "manifest_path": str(md / name),
            "manifest_length": (md / name).stat().st_size,
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": seq,
        }

    write_avro_file(
        md / "snap-1-ml.avro",
        ml_schema,
        [
            ml_entry("m-old.avro", 0, 1),  # data written BEFORE the delete
            ml_entry("m-del.avro", 1, 2),  # the equality delete
            ml_entry("m-new.avro", 0, 3),  # data written AFTER it
        ],
    )
    meta = {
        "format-version": 2,
        "table-uuid": "eq-tbl",
        "location": str(table),
        "last-updated-ms": 1,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "doc_id", "required": False,
                     "type": "long"},
                    {"id": 2, "name": "text", "required": False,
                     "type": "string"},
                    {"id": 3, "name": "lang", "required": False,
                     "type": "string"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": 77,
        "snapshots": [
            {"snapshot-id": 77, "timestamp-ms": 1,
             "summary": {"operation": "overwrite"},
             "manifest-list": str(md / "snap-1-ml.avro")},
        ],
    }
    (md / "v1.metadata.json").write_text(json.dumps(meta))
    (md / "version-hint.text").write_text("1")

    got = read_iceberg(spark, table)
    # old 'en' and old NULL-lang rows die (null-safe match); old 'de'
    # survives; BOTH new rows survive despite matching the predicate
    assert _rows(got) == {
        (1, "b", "de"),
        (3, "d", "en"),
        (4, "e", None),
    }


def test_stream_skips_compaction_existing_entries(spark, tmp_path):
    """Manifest compaction (Iceberg's ManifestMergeManager during a
    plain append) rewrites old files into a NEW manifest as status
    EXISTING(0) entries with added_snapshot_id = the compacting
    snapshot.  The stream must replay ONLY status ADDED(1) entries or
    every compacted row duplicates."""
    from snapflow_spark.functions.avro_codec import read_avro_file
    from snapflow_spark.sources.iceberg import (
        _MANIFEST_ENTRY_SCHEMA,
        _MANIFEST_FILE_SCHEMA,
        _localize,
    )

    table = tmp_path / "tbl"
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    write_iceberg(_df(spark, ROWS_V0), table)
    _run_ice_stream_once(spark, table, out, ckpt)
    assert _rows(spark.read.parquet(str(out))) == set(ROWS_V0)

    md = table / "metadata"
    meta = json.loads(
        (md / f"v{(md / 'version-hint.text').read_text().strip()}.metadata.json").read_text()
    )
    location = meta["location"]
    # stage one new data file
    stage = tmp_path / "stage"
    _df(spark, ROWS_V1).coalesce(1).write.parquet(str(stage))
    part = next(stage.glob("*.parquet"))
    new_rel = "data/compacted-new.parquet"
    (table / "data").mkdir(exist_ok=True)
    dest = table / new_rel
    part.rename(dest)
    # old entries -> EXISTING in the new merged manifest
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, old_manifests = read_avro_file(
        _localize(cur["manifest-list"], location, table)
    )
    old_entries = []
    for m in old_manifests:
        _, es = read_avro_file(
            _localize(m["manifest_path"], location, table)
        )
        old_entries.extend(es)
    sid = 990001
    merged = [
        {**e, "status": 0, "snapshot_id": sid} for e in old_entries
    ] + [
        {
            "status": 1,
            "snapshot_id": sid,
            "data_file": {
                "file_path": f"{location}/{new_rel}",
                "file_format": "PARQUET",
                "partition": {},
                "record_count": len(ROWS_V1),
                "file_size_in_bytes": dest.stat().st_size,
                "block_size_in_bytes": 67108864,
            },
        }
    ]
    mname = "manifest-merged.avro"
    write_avro_file(
        md / mname, _MANIFEST_ENTRY_SCHEMA, merged,
        extra_metadata={
            "schema": json.dumps(meta["schema"], separators=(",", ":")),
            "schema-id": "0",
            "partition-spec": "[]",
            "partition-spec-id": "0",
            "format-version": "1",
            "content": "data",
        },
    )
    ml_name = f"snap-{sid}-manifest-list.avro"
    write_avro_file(
        md / ml_name, _MANIFEST_FILE_SCHEMA,
        [{
            "manifest_path": f"{location}/metadata/{mname}",
            "manifest_length": (md / mname).stat().st_size,
            "partition_spec_id": 0,
            "added_snapshot_id": sid,
        }],
        extra_metadata={
            "snapshot-id": str(sid),
            "parent-snapshot-id": str(meta["current-snapshot-id"]),
            "format-version": "1",
        },
    )
    meta["snapshots"].append({
        "snapshot-id": sid,
        "timestamp-ms": 1700000000000,
        "summary": {"operation": "append"},
        "manifest-list": f"{location}/metadata/{ml_name}",
    })
    meta["current-snapshot-id"] = sid
    hint = int((md / "version-hint.text").read_text().strip())
    (md / f"v{hint + 1}.metadata.json").write_text(json.dumps(meta))
    (md / "version-hint.text").write_text(str(hint + 1))

    # batch reader sees everything exactly once
    assert _rows(read_iceberg(spark, table)) == set(ROWS_V0) | set(ROWS_V1)
    # the restarted stream appends ONLY the ADDED file's rows
    _run_ice_stream_once(spark, table, out, ckpt)
    got = spark.read.parquet(str(out))
    assert _rows(got) == set(ROWS_V0) | set(ROWS_V1)
    assert got.count() == len(ROWS_V0) + len(ROWS_V1)


def test_expire_tolerates_interrupted_prior_pass(spark, tmp_path):
    """Crash-safety: expire publishes pruned metadata BEFORE deleting
    files, and a later pass tolerates manifests a half-done earlier
    pass already removed instead of failing the walk."""
    from snapflow_spark.functions.avro_codec import read_avro_file
    from snapflow_spark.sources.iceberg import (
        _localize,
        expire_iceberg_snapshots,
    )

    table = tmp_path / "tbl"
    write_iceberg(_df(spark, ROWS_V0), table)
    write_iceberg(_df(spark, ROWS_V1), table, mode="overwrite")
    write_iceberg(_df(spark, ROWS_V0), table, mode="overwrite")
    md = table / "metadata"
    meta = json.loads(
        (md / f"v{(md / 'version-hint.text').read_text().strip()}.metadata.json").read_text()
    )
    # simulate an interrupted earlier expire: the OLDEST snapshot's
    # manifest-list is gone but it is still listed in metadata
    oldest = meta["snapshots"][0]
    Path(_localize(oldest["manifest-list"], meta["location"], table)).unlink()
    gone = expire_iceberg_snapshots(spark, table, keep_last=1)
    assert gone  # the second snapshot's files reclaimed
    # current snapshot still reads
    assert _rows(read_iceberg(spark, table)) == set(ROWS_V0)
    # metadata no longer lists expired snapshots
    meta2 = json.loads(
        (md / f"v{(md / 'version-hint.text').read_text().strip()}.metadata.json").read_text()
    )
    assert len(meta2["snapshots"]) == 1


def test_delete_from_iceberg_position_deletes(spark, tmp_path):
    """delete_from_iceberg: merge-on-read row deletes end-to-end —
    matching rows vanish via a sorted (file_path, pos) delete file +
    DELETE manifest, repeat deletes are idempotent, later appends are
    untouched by earlier deletes, and old snapshots time-travel."""
    from snapflow_spark.sources.iceberg import delete_from_iceberg

    table = tmp_path / "tbl"
    s0 = write_iceberg(_df(spark, ROWS_V0), table)
    assert delete_from_iceberg(spark, table, "lang = 'en'") == 2
    assert _rows(read_iceberg(spark, table)) == {(2, "gamma", "de")}
    # idempotent: the same predicate deletes nothing new
    assert delete_from_iceberg(spark, table, "lang = 'en'") == 0
    # no-match predicate commits nothing
    assert delete_from_iceberg(spark, table, "doc_id = 999") == 0
    # time travel to s0 still sees everything
    assert _rows(read_iceberg(spark, table, snapshot_id=s0)) == set(ROWS_V0)
    # append AFTER the delete: new rows survive even when matching
    write_iceberg(_df(spark, ROWS_V1), table, mode="append")
    assert delete_from_iceberg(spark, table, "doc_id = 0") == 0  # already gone? no: 0 was 'en', deleted
    got = _rows(read_iceberg(spark, table))
    assert got == {(2, "gamma", "de")} | set(ROWS_V1)
    # delete spanning old + new data files
    n = delete_from_iceberg(spark, table, "lang = 'de'")
    assert n == 2  # (2, gamma, de) and (4, epsilon, de)
    assert _rows(read_iceberg(spark, table)) == {(3, "delta", "fr")}
    # the delete parquet is sorted by (file_path, pos) as the spec asks
    import pyarrow.parquet as pq

    dels = sorted((table / "data").glob("*-deletes.parquet"))
    assert dels
    t = pq.read_table(dels[0])
    rows = list(zip(t.column("file_path").to_pylist(),
                    t.column("pos").to_pylist()))
    assert rows == sorted(rows)
    # metadata moved to v2 with a positive last-sequence-number
    import json as _json

    md = table / "metadata"
    meta = _json.loads(
        (md / f"v{(md / 'version-hint.text').read_text().strip()}.metadata.json").read_text()
    )
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] >= 1
    assert meta["snapshots"][-1]["summary"]["operation"] == "delete"


def test_partitioned_export_and_pruning(spark, tmp_path):
    """write_iceberg(partition_by=...): identity spec, TYPED partition
    values in the manifests, data files that still CONTAIN the
    partition column (the Iceberg rule hive layout breaks), metadata
    pruning via partition_filter, and spec-checked appends."""
    table = tmp_path / "tbl"
    s0 = write_iceberg(
        _df(spark, ROWS_V0), table, partition_by=["lang"]
    )
    got = read_iceberg(spark, table)
    assert _rows(got) == set(ROWS_V0)
    # the data files carry lang (not dropped into dirs)
    snap = iceberg_snapshot(spark, table)
    import pyarrow.parquet as pq

    for p, pv, _n, _bd in snap.files:
        cols = pq.ParquetFile(p).schema_arrow.names
        assert "lang" in cols
        assert pv["lang"] in {"en", "de"}
    # metadata pruning: only the en file(s) scan
    en = read_iceberg(spark, table, partition_filter={"lang": "en"})
    assert _rows(en) == {(0, "alpha", "en"), (1, "beta", "en")}
    assert len(en.inputFiles()) < len(snap.files)
    # append keeps the spec; mismatched partitioning refuses
    write_iceberg(_df(spark, ROWS_V1), table, mode="append")
    assert _rows(read_iceberg(spark, table)) == set(ROWS_V0) | set(ROWS_V1)
    de = read_iceberg(spark, table, partition_filter={"lang": "de"})
    assert _rows(de) == {(2, "gamma", "de"), (4, "epsilon", "de")}
    with pytest.raises(ValueError, match="partition_by"):
        write_iceberg(
            _df(spark, ROWS_V1), table, mode="append", partition_by=[]
        )
    # typed int partitioning + bucket-free identity probe by value
    t2 = tmp_path / "byid"
    write_iceberg(
        _df(spark, ROWS_V0 + ROWS_V1), t2, partition_by=["doc_id"]
    )
    one = read_iceberg(spark, t2, partition_filter={"doc_id": 3})
    assert _rows(one) == {(3, "delta", "fr")}
    assert len(one.inputFiles()) == 1
    # time travel across the partitioned history still works
    assert _rows(read_iceberg(spark, table, snapshot_id=s0)) == set(ROWS_V0)
    # unsupported partition source type refuses loudly
    with pytest.raises(NotImplementedError, match="partition column"):
        write_iceberg(
            spark.createDataFrame(
                [(1.5, "x")], "score double, text string"
            ),
            tmp_path / "bad",
            partition_by=["score"],
        )


def test_delete_iceberg_by_key_equality(spark, tmp_path):
    """delete_iceberg_by_key: equality deletes with NO data scan —
    keys recorded at the next sequence number delete matching rows
    written BEFORE, while rows appended AFTER survive (the read
    side's sequence scoping, now produced by our own writer)."""
    from snapflow_spark.sources.iceberg import delete_iceberg_by_key

    table = tmp_path / "tbl"
    write_iceberg(_df(spark, ROWS_V0), table)
    n = delete_iceberg_by_key(
        spark, table, spark.createDataFrame([("en",), ("en",)],
                                            "lang string")
    )
    assert n == 1  # deduplicated keys
    assert _rows(read_iceberg(spark, table)) == {(2, "gamma", "de")}
    # rows appended AFTER the delete survive even when matching
    write_iceberg(
        _df(spark, [(7, "eta", "en")]), table, mode="append"
    )
    assert _rows(read_iceberg(spark, table)) == {
        (2, "gamma", "de"), (7, "eta", "en")
    }
    # multi-column keys and null-safe matching
    n2 = delete_iceberg_by_key(
        spark, table,
        spark.createDataFrame([(2, "de")], "doc_id bigint, lang string"),
    )
    assert n2 == 1
    assert _rows(read_iceberg(spark, table)) == {(7, "eta", "en")}
    # unknown column refuses
    with pytest.raises(ValueError, match="not in"):
        delete_iceberg_by_key(
            spark, table, spark.createDataFrame([(1,)], "nope bigint")
        )
    # empty key set commits nothing
    hint = (table / "metadata" / "version-hint.text").read_text()
    assert delete_iceberg_by_key(
        spark, table,
        spark.createDataFrame([], "lang string"),
    ) == 0
    assert (table / "metadata" / "version-hint.text").read_text() == hint
    # position + equality writers compose on one table
    from snapflow_spark.sources.iceberg import delete_from_iceberg

    assert delete_from_iceberg(spark, table, "doc_id = 7") == 1
    assert _rows(read_iceberg(spark, table)) == set()


def test_rewrite_iceberg_files_materializes_deletes(spark, tmp_path):
    """rewrite_iceberg_files: the merge-on-read debt (position +
    equality delete files) materializes into fresh delete-free
    manifests; content row-identical; field ids preserved; old
    snapshots still time-travel; second pass is a no-op."""
    import json as _json

    from snapflow_spark.sources.iceberg import (
        delete_from_iceberg,
        delete_iceberg_by_key,
        rewrite_iceberg_files,
    )

    table = tmp_path / "tbl"
    s0 = write_iceberg(_df(spark, ROWS_V0), table)
    write_iceberg(_df(spark, ROWS_V1), table, mode="append")
    assert delete_from_iceberg(spark, table, "doc_id = 0") == 1
    assert delete_iceberg_by_key(
        spark, table, spark.createDataFrame([("de",)], "lang string")
    ) == 1
    want = {(1, "beta", "en"), (3, "delta", "fr")}
    assert _rows(read_iceberg(spark, table)) == want
    md = table / "metadata"
    ids_before = {
        f["name"]: f["id"]
        for f in _json.loads(
            (md / f"v{(md / 'version-hint.text').read_text().strip()}.metadata.json").read_text()
        )["schema"]["fields"]
    }

    out = rewrite_iceberg_files(spark, table)
    assert out["delete_files_removed"] == 2
    assert out["files_after"] <= out["files_before"]
    snap = iceberg_snapshot(spark, table)
    assert snap.position_deletes == [] and snap.equality_deletes == []
    assert _rows(read_iceberg(spark, table)) == want
    # field ids preserved through the same-schema overwrite
    meta = _json.loads(
        (md / f"v{(md / 'version-hint.text').read_text().strip()}.metadata.json").read_text()
    )
    assert {
        f["name"]: f["id"] for f in meta["schema"]["fields"]
    } == ids_before
    # old snapshot still reads pre-delete state
    assert _rows(read_iceberg(spark, table, snapshot_id=s0)) == set(ROWS_V0)
    # compaction of a compact table is a no-op (no new snapshot)
    n_snaps = len(meta["snapshots"])
    out2 = rewrite_iceberg_files(spark, table)
    assert out2["delete_files_removed"] == 0
    meta2 = _json.loads(
        (md / f"v{(md / 'version-hint.text').read_text().strip()}.metadata.json").read_text()
    )
    assert len(meta2["snapshots"]) == n_snaps


def test_refs_tags_branches(spark, tmp_path):
    """v2 named refs: writers maintain the main branch, tags pin
    snapshots against expiry, read_iceberg(ref=) resolves, dropped
    refs release the pin."""
    import json as _json

    from snapflow_spark.sources.iceberg import (
        drop_iceberg_ref,
        expire_iceberg_snapshots,
        tag_iceberg_snapshot,
    )

    table = tmp_path / "tbl"
    s0 = write_iceberg(_df(spark, ROWS_V0), table)
    tag_iceberg_snapshot(table, "v1.0")  # tag the current snapshot
    s1 = write_iceberg(_df(spark, ROWS_V1), table, mode="overwrite")
    s2 = write_iceberg(
        _df(spark, [(9, "omega", "zz")]), table, mode="overwrite"
    )
    # ref resolution
    assert _rows(read_iceberg(spark, table, ref="v1.0")) == set(ROWS_V0)
    assert _rows(read_iceberg(spark, table, ref="main")) == {
        (9, "omega", "zz")
    }
    md = table / "metadata"
    meta = _json.loads(
        (md / f"v{(md / 'version-hint.text').read_text().strip()}.metadata.json").read_text()
    )
    assert meta["refs"]["main"]["snapshot-id"] == s2
    assert meta["refs"]["v1.0"] == {"snapshot-id": s0, "type": "tag"}
    with pytest.raises(ValueError, match="not in the table's refs"):
        read_iceberg(spark, table, ref="nope")
    with pytest.raises(ValueError, match="not several"):
        read_iceberg(spark, table, ref="main", snapshot_id=s1)
    # expire: the TAGGED snapshot survives keep_last=1; s1 reclaims
    gone = expire_iceberg_snapshots(spark, table, keep_last=1)
    assert gone  # something reclaimed (s1's files)
    assert _rows(read_iceberg(spark, table, ref="v1.0")) == set(ROWS_V0)
    with pytest.raises(ValueError, match="not in metadata"):
        read_iceberg(spark, table, snapshot_id=s1)
    # dropping the tag releases the pin: next expire reclaims s0
    drop_iceberg_ref(table, "v1.0")
    gone2 = expire_iceberg_snapshots(spark, table, keep_last=1)
    assert gone2
    with pytest.raises(ValueError, match="not in metadata"):
        read_iceberg(spark, table, snapshot_id=s0)
    assert _rows(read_iceberg(spark, table)) == {(9, "omega", "zz")}
    with pytest.raises(ValueError, match="not in"):
        drop_iceberg_ref(table, "v1.0")
    with pytest.raises(ValueError, match="snapshot 12345"):
        tag_iceberg_snapshot(table, "x", snapshot_id=12345)


def test_merge_schema_append_evolution(spark, tmp_path):
    """write_iceberg(merge_schema=True): added columns get FRESH
    field ids past last-column-id (Iceberg's never-reuse rule),
    existing ids stay put, old files read back with nulls for the new
    columns, and drops/retypes refuse."""
    import json as _json

    table = tmp_path / "tbl"
    write_iceberg(_df(spark, ROWS_V0), table)
    evolved = spark.createDataFrame(
        [(10, "zeta", "fr", 0.9)],
        "doc_id bigint, text string, lang string, score double",
    )
    with pytest.raises(ValueError, match="merge_schema"):
        write_iceberg(evolved, table, mode="append")
    write_iceberg(evolved, table, mode="append", merge_schema=True)
    got = read_iceberg(spark, table)
    assert [f.name for f in got.schema.fields] == [
        "doc_id", "text", "lang", "score"
    ]
    rows = {(r.doc_id, r.text, r.lang, r.score) for r in got.collect()}
    assert rows == {(d, t, lg, None) for d, t, lg in ROWS_V0} | {
        (10, "zeta", "fr", 0.9)
    }
    md = table / "metadata"
    meta = _json.loads(
        (md / f"v{(md / 'version-hint.text').read_text().strip()}.metadata.json").read_text()
    )
    ids = {f["name"]: f["id"] for f in meta["schema"]["fields"]}
    assert ids == {"doc_id": 1, "text": 2, "lang": 3, "score": 4}
    assert meta["last-column-id"] == 4
    # evolved-schema appends need no flag now
    write_iceberg(
        spark.createDataFrame(
            [(11, "eta", "de", 0.1)],
            "doc_id bigint, text string, lang string, score double",
        ),
        table,
        mode="append",
    )
    assert read_iceberg(spark, table).count() == 5
    with pytest.raises(ValueError, match="ADD columns"):
        write_iceberg(
            spark.createDataFrame([(1, "x")], "doc_id bigint, text string"),
            table, mode="append", merge_schema=True,
        )


def test_partition_filter_keeps_pre_spec_files(spark, tmp_path):
    """Spec evolution safety: a file whose manifest partition record
    LACKS the filtered field (written under an older spec) is
    unprunable and must be KEPT — pruning may never drop rows."""
    from snapflow_spark.functions.avro_codec import read_avro_file

    table = tmp_path / "tbl"
    _synthesize_v2(spark, table)
    # strip id_bucket from the en entry's partition record by
    # rewriting the manifest with a schema that has only lang
    md = table / "metadata"
    _, entries = read_avro_file(md / "m1.avro")
    slim_schema = {
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
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "partition",
                         "type": {"type": "record", "name": "r102",
                                  "fields": [
                                      {"name": "lang",
                                       "type": ["null", "string"],
                                       "default": None}]}},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }
    slim = []
    for e in entries:
        rec = dict(e["data_file"])
        rec["partition"] = {"lang": e["data_file"]["partition"].get("lang")}
        slim.append({"status": e["status"], "data_file": rec})
    write_avro_file(md / "m1.avro", slim_schema, slim)
    # bucket-filter on doc_id: NO file carries id_bucket now, so the
    # prune keeps everything that the identity/lang state allows
    got = read_iceberg(spark, table, partition_filter={"doc_id": 3})
    assert _rows(got) == {(0, "a", "en"), (1, "b", "en"), (2, "c", "de")}


def test_rollback_iceberg(spark, tmp_path):
    """rollback_iceberg: current-snapshot-id (and main) move back;
    lineage intact, reversible; expired/unknown snapshots refuse."""
    from snapflow_spark.sources.iceberg import rollback_iceberg

    table = tmp_path / "tbl"
    s0 = write_iceberg(_df(spark, ROWS_V0), table)
    s1 = write_iceberg(
        _df(spark, [(9, "omega", "zz")]), table, mode="overwrite"
    )
    assert _rows(read_iceberg(spark, table)) == {(9, "omega", "zz")}
    rollback_iceberg(table, s0)
    assert _rows(read_iceberg(spark, table)) == set(ROWS_V0)
    assert _rows(read_iceberg(spark, table, ref="main")) == set(ROWS_V0)
    # reversible
    rollback_iceberg(table, s1)
    assert _rows(read_iceberg(spark, table)) == {(9, "omega", "zz")}
    with pytest.raises(ValueError, match="not in the table"):
        rollback_iceberg(table, 123456)
    # an append after a rollback keeps working (history branches
    # forward from the restored head)
    rollback_iceberg(table, s0)
    write_iceberg(_df(spark, ROWS_V1), table, mode="append")
    assert _rows(read_iceberg(spark, table)) == set(ROWS_V0) | set(ROWS_V1)
