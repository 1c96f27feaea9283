"""set_delta_properties (round 16 — r15 Missing #3): one metaData
commit that sets/unsets table properties AND upgrades the protocol in
the same commit for feature-gating properties, so ENGINE-created
tables can turn on CDF / column mapping / v2 checkpoints / retention
without hand-editing the log."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from snapflow_spark.sources.delta import (
    delta_snapshot,
    read_delta,
    read_delta_cdf,
    set_delta_properties,
    write_delta,
    write_delta_checkpoint,
)


def _tbl(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


def test_set_and_unset_plain_properties(spark, tmp_path):
    table = tmp_path / "t"
    write_delta(_tbl(spark, [(1, "a"), (2, "b")]), table)
    v = set_delta_properties(
        spark, table,
        {"delta.logRetentionDuration": "interval 7 days",
         "team.owner": "pipeline"},
    )
    assert v == 1
    snap = delta_snapshot(spark, table)
    cfg = snap.metadata["configuration"]
    assert cfg["delta.logRetentionDuration"] == "interval 7 days"
    assert cfg["team.owner"] == "pipeline"
    # no protocol action for non-feature properties
    lines = (
        (table / "_delta_log" / f"{1:020d}.json").read_text()
        .splitlines()
    )
    assert not any("protocol" in json.loads(l) for l in lines)
    # None UNSETs; other keys survive
    set_delta_properties(spark, table, {"team.owner": None})
    cfg = delta_snapshot(spark, table).metadata["configuration"]
    assert "team.owner" not in cfg
    assert cfg["delta.logRetentionDuration"] == "interval 7 days"
    # data unchanged throughout
    assert read_delta(spark, table).count() == 2


def test_enable_cdf_then_writers_emit_cdc(spark, tmp_path):
    """The Done criterion: enable CDF on an ENGINE table, then
    delete_from_delta emits cdc actions and read_delta_cdf sees
    them."""
    from snapflow_spark.sources.delta import delete_from_delta

    table = tmp_path / "t"
    write_delta(_tbl(spark, [(i, f"v{i}") for i in range(6)]), table)
    set_delta_properties(
        spark, table, {"delta.enableChangeDataFeed": "true"}
    )
    snap = delta_snapshot(spark, table)
    assert int(snap.protocol["minWriterVersion"]) >= 4
    n = delete_from_delta(spark, table, "id >= 4")
    assert n == 2
    # cdc actions landed in the delete commit
    lines = (
        (table / "_delta_log" / f"{2:020d}.json").read_text()
        .splitlines()
    )
    assert any("cdc" in json.loads(l) for l in lines)
    changes = read_delta_cdf(spark, table, starting_version=2)
    got = {(r.id, r._change_type) for r in changes.collect()}
    assert got == {(4, "delete"), (5, "delete")}
    assert read_delta(spark, table).count() == 4


def test_enable_v2_checkpoint_policy_upgrades_protocol(spark, tmp_path):
    """delta.checkpointPolicy=v2 -> protocol 3/7 carrying
    v2Checkpoint plus the features the OLD legacy versions implied
    (the spec's explicit-listing upgrade rule) — external readers
    are guaranteed to open v2 checkpoints."""
    table = tmp_path / "t"
    write_delta(_tbl(spark, [(1, "a")]), table)
    set_delta_properties(
        spark, table, {"delta.checkpointPolicy": "v2"}
    )
    snap = delta_snapshot(spark, table)
    p = snap.protocol
    assert (p["minReaderVersion"], p["minWriterVersion"]) == (3, 7)
    assert "v2Checkpoint" in p["readerFeatures"]
    assert "v2Checkpoint" in p["writerFeatures"]
    # legacy writer 2 implied features are listed explicitly
    assert {"appendOnly", "invariants"} <= set(p["writerFeatures"])
    # the v2 checkpoint now lands on a table whose protocol admits it
    write_delta(_tbl(spark, [(2, "b")]), table, mode="append")
    v = write_delta_checkpoint(spark, table, v2=True)
    assert v == 2
    assert read_delta(spark, table).count() == 2


def test_enable_column_mapping_binds_existing_files(spark, tmp_path):
    """none -> name: existing columns get physicalName = their
    CURRENT name (uuids would orphan the already-written files) and
    sequential ids; reads keep working; later merge_schema evolution
    assigns a FRESH uuid past maxColumnId."""
    table = tmp_path / "t"
    write_delta(_tbl(spark, [(1, "a"), (2, "b")]), table)
    set_delta_properties(
        spark, table, {"delta.columnMapping.mode": "name"}
    )
    snap = delta_snapshot(spark, table)
    cfg = snap.metadata["configuration"]
    assert cfg["delta.columnMapping.mode"] == "name"
    assert cfg["delta.columnMapping.maxColumnId"] == "2"
    p = snap.protocol
    assert int(p["minReaderVersion"]) >= 2
    assert int(p["minWriterVersion"]) >= 5
    for i, f in enumerate(snap.schema.fields, start=1):
        assert f.metadata["delta.columnMapping.id"] == i
        assert f.metadata["delta.columnMapping.physicalName"] == f.name
    # pre-mapping files still read (physical name == logical name)
    assert {(r.id, r.val) for r in read_delta(spark, table).collect()} \
        == {(1, "a"), (2, "b")}
    # appends stage under the (name-equal) physical layout
    write_delta(_tbl(spark, [(3, "c")]), table, mode="append")
    assert read_delta(spark, table).count() == 3
    # evolution on the now-mapped table: fresh uuid, id past max
    write_delta(
        spark.createDataFrame(
            [(4, "d", 1.5)], "id long, val string, score double"
        ),
        table, mode="append", merge_schema=True,
    )
    snap2 = delta_snapshot(spark, table)
    meta = {f.name: f for f in snap2.schema.fields}["score"].metadata
    assert int(meta["delta.columnMapping.id"]) == 3
    assert meta["delta.columnMapping.physicalName"].startswith("col-")
    assert snap2.metadata["configuration"][
        "delta.columnMapping.maxColumnId"
    ] == "3"
    got = {(r.id, r.score) for r in read_delta(spark, table).collect()}
    assert got == {(1, None), (2, None), (3, None), (4, 1.5)}


def test_mode_change_and_bad_mode_refuse(spark, tmp_path):
    table = tmp_path / "t"
    write_delta(_tbl(spark, [(1, "a")]), table)
    set_delta_properties(
        spark, table, {"delta.columnMapping.mode": "name"}
    )
    with pytest.raises(NotImplementedError, match="none -> name"):
        set_delta_properties(
            spark, table, {"delta.columnMapping.mode": "id"}
        )
    table2 = tmp_path / "t2"
    write_delta(_tbl(spark, [(1, "a")]), table2)
    with pytest.raises(ValueError, match="spec modes"):
        set_delta_properties(
            spark, table2, {"delta.columnMapping.mode": "zz"}
        )


def test_mode_id_upgrade_refused_with_data_files(spark, tmp_path):
    """ADVICE r16 (medium): none -> 'id' on a table with existing
    data files must refuse — those parquet files carry no footer
    field ids, so the id-binding read path would fail or null-fill
    on them.  delta-spark restricts existing-table upgrades to
    'name' for this reason; 'id' is creation-time only."""
    table = tmp_path / "t"
    write_delta(_tbl(spark, [(1, "a")]), table)
    with pytest.raises(ValueError, match="existing data files"):
        set_delta_properties(
            spark, table, {"delta.columnMapping.mode": "id"}
        )
    # the table is untouched (no half-commit)
    snap = delta_snapshot(spark, table)
    assert "delta.columnMapping.mode" not in (
        snap.metadata.get("configuration") or {}
    )
    assert read_delta(spark, table).count() == 1


def test_enable_deletion_vectors_feature(spark, tmp_path):
    table = tmp_path / "t"
    write_delta(_tbl(spark, [(1, "a")]), table)
    set_delta_properties(
        spark, table, {"delta.enableDeletionVectors": "true"}
    )
    p = delta_snapshot(spark, table).protocol
    assert (p["minReaderVersion"], p["minWriterVersion"]) == (3, 7)
    assert "deletionVectors" in p["readerFeatures"]
    assert read_delta(spark, table).count() == 1


def _box_hits(snap, lo, hi):
    """Files whose log-recorded min/max stats INTERSECT the box
    [lo,hi]^2 on (x, y) — what stats-based pruning must scan."""
    hits = 0
    for _rel, _pv, _sz, st in snap.files:
        mn, mx = st["minValues"], st["maxValues"]
        if mn["x"] <= hi and mx["x"] >= lo \
                and mn["y"] <= hi and mx["y"] >= lo:
            hits += 1
    return hits


def test_optimize_delta_zorder_clusters_for_box_pruning(
    spark, tmp_path
):
    """optimize_delta(zorder_by=) — OPTIMIZE ZORDER BY: after the
    clustering rewrite, a box probe's stats pruning (straight from
    the re-emitted per-file min/max in the log) skips most files,
    where the unclustered layout had to scan all of them; the row
    set is unchanged and the rewrite is dataChange=false."""
    import json as _json

    from snapflow_spark.sources.delta import optimize_delta

    table = tmp_path / "t"
    rows = [(i, i % 64, (i * 7) % 64) for i in range(4096)]
    df = (
        spark.createDataFrame(rows, "id long, x long, y long")
        .repartition(8)  # random spray: every file spans both domains
    )
    write_delta(df, table)
    before = delta_snapshot(spark, table)
    assert len(before.files) == 8
    before_hits = _box_hits(before, 0, 7)
    assert before_hits == 8  # unclustered: the box touches everything

    res = optimize_delta(
        spark, table, zorder_by=["x", "y"], zorder_ranges=8
    )
    assert res["files_removed"] == 8 and res["files_added"] >= 4
    after = delta_snapshot(spark, table)
    after_hits = _box_hits(after, 0, 7)
    assert after_hits < before_hits / 2, (after_hits, before_hits)
    # identical rows, schema unchanged (no leaked __z column)
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "x", "y"]
    assert got.count() == 4096
    assert got.agg({"id": "sum"}).collect()[0][0] == sum(
        r[0] for r in rows
    )
    # CDF-invisible: the OPTIMIZE commit is dataChange=false on both
    # sides
    lines = (
        (table / "_delta_log" / f"{1:020d}.json").read_text()
        .splitlines()
    )
    for line in lines:
        a = _json.loads(line)
        for side in ("add", "remove"):
            if side in a:
                assert a[side]["dataChange"] is False
    # zorder_by validation is loud
    with pytest.raises(ValueError, match="2 or 3"):
        optimize_delta(spark, table, zorder_by=["x"])
    with pytest.raises(ValueError, match="not in the"):
        optimize_delta(spark, table, zorder_by=["x", "nope"])


def test_rename_and_drop_column_on_mapped_table(spark, tmp_path):
    """Round 16: metadata-only column surgery — the point of column
    mapping.  RENAME changes the logical name while the physicalName
    keeps binding every existing file (partition columns update
    partitionColumns in the same commit); DROP removes the field
    from the schema with the physical data left in place; both
    refuse on unmapped tables."""
    from tests.test_delta import _column_mapped_table
    from snapflow_spark.sources.delta import (
        drop_delta_column,
        rename_delta_column,
    )

    table = tmp_path / "cm"
    _column_mapped_table(spark, table)
    v = rename_delta_column(spark, table, "text", "body")
    assert v == 1
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == [
        "doc_id", "body", "lang"
    ]
    assert {(r.doc_id, r.body) for r in got.collect()} == {
        (0, "a"), (1, "b"), (2, "c")
    }
    # physicalName untouched — the files keep binding
    snap = delta_snapshot(spark, table)
    assert {f.name: f.metadata["delta.columnMapping.physicalName"]
            for f in snap.schema.fields}["body"] == "col-bbbb"
    # renaming the PARTITION column updates partitionColumns too
    rename_delta_column(spark, table, "lang", "language")
    snap2 = delta_snapshot(spark, table)
    assert snap2.partition_columns == ["language"]
    assert {r.language for r in read_delta(spark, table).collect()} \
        == {"en", "de"}
    # appends keep working against the renamed logical surface
    write_delta(
        spark.createDataFrame(
            [(9, "z", "fr")], "doc_id long, body string, language string"
        ),
        table, mode="append",
    )
    assert read_delta(spark, table).count() == 4
    # collisions and unknowns are loud
    with pytest.raises(ValueError, match="already exists"):
        rename_delta_column(spark, table, "doc_id", "body")
    with pytest.raises(ValueError, match="not in"):
        rename_delta_column(spark, table, "nope", "x")
    # DROP: the field leaves the schema, data files untouched
    drop_delta_column(spark, table, "body")
    got2 = read_delta(spark, table)
    assert [f.name for f in got2.schema.fields] == [
        "doc_id", "language"
    ]
    assert got2.count() == 4
    with pytest.raises(ValueError, match="partition column"):
        drop_delta_column(spark, table, "language")
    # unmapped tables refuse with the enable-mapping pointer
    plain = tmp_path / "plain"
    write_delta(_tbl(spark, [(1, "a")]), plain)
    with pytest.raises(NotImplementedError, match="not column-mapped"):
        rename_delta_column(spark, plain, "val", "v2")
    with pytest.raises(NotImplementedError, match="not column-mapped"):
        drop_delta_column(spark, plain, "val")


def test_rename_drop_refuse_constraint_referenced(spark, tmp_path):
    """ADVICE r16: a column referenced by delta.constraints.* cannot
    be renamed or dropped — later writes' CHECK gates would fail
    with an unresolved column the user can't trace.  Dropping the
    constraint first unblocks."""
    from tests.test_delta import _column_mapped_table
    from snapflow_spark.sources.delta import (
        drop_delta_column,
        rename_delta_column,
    )

    table = tmp_path / "cm"
    _column_mapped_table(spark, table)
    set_delta_properties(
        spark, table, {"delta.constraints.docid_pos": "doc_id >= 0"}
    )
    with pytest.raises(ValueError, match="docid_pos"):
        rename_delta_column(spark, table, "doc_id", "id2")
    with pytest.raises(ValueError, match="docid_pos"):
        drop_delta_column(spark, table, "doc_id")
    # substring names don't false-positive (`doc_id` vs `doc_id2`…);
    # other columns stay renameable
    rename_delta_column(spark, table, "text", "body")
    # dropping the constraint unblocks the surgery
    set_delta_properties(
        spark, table, {"delta.constraints.docid_pos": None}
    )
    rename_delta_column(spark, table, "doc_id", "id2")
    assert [f.name for f in read_delta(spark, table).schema.fields] \
        == ["id2", "body", "lang"]


def test_merge_schema_id_floor_sees_nested_ids(spark, tmp_path):
    """ADVICE r16: the fresh-id floor for merge_schema evolution must
    walk NESTED struct field ids — a foreign-written mapped table
    with a stale maxColumnId must not hand a new column a nested
    field's id."""
    import json as _json

    table = tmp_path / "t"
    log = table / "_delta_log"
    log.mkdir(parents=True)
    # hand-published mapped table: top-level ids 1,2 but the struct's
    # NESTED fields carry ids 3,4 while maxColumnId lies at 2
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "id"}},
            {"name": "person", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "person"},
             "type": {"type": "struct", "fields": [
                 {"name": "name", "type": "string", "nullable": True,
                  "metadata": {
                      "delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName": "name"}},
                 {"name": "age", "type": "long", "nullable": True,
                  "metadata": {
                      "delta.columnMapping.id": 4,
                      "delta.columnMapping.physicalName": "age"}},
             ]}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "stale-max", "format": {"provider": "parquet",
                                          "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": "2",  # STALE
            },
        }},
    ]
    with open(log / f"{0:020d}.json", "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(_json.dumps(a) + "\n")
    write_delta(
        spark.createDataFrame(
            [(1, ("ann", 30), 1.5)],
            "id long, person struct<name:string,age:long>, "
            "score double",
        ),
        table, mode="append", merge_schema=True,
    )
    snap = delta_snapshot(spark, table)
    meta = {f.name: f for f in snap.schema.fields}["score"].metadata
    # fresh id is past the NESTED maximum (4), not the stale max (2)
    assert int(meta["delta.columnMapping.id"]) == 5
    assert snap.metadata["configuration"][
        "delta.columnMapping.maxColumnId"] == "5"


def test_cli_property_and_column_ops(spark, tmp_path, capsys):
    """CLI dispatch for the round-16 surface: table set-props /
    rename-column / drop-column / optimize --zorder."""
    import json as _json

    from snapflow_spark.cli import main

    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame(
            [(i, (i * 7) % 50, f"v{i}") for i in range(80)],
            "a long, b long, s string",
        ).repartition(4),
        t,
    )
    assert main([
        "table", "set-props", str(t),
        "--props", _json.dumps({"delta.columnMapping.mode": "name"}),
    ]) == 0
    assert main([
        "table", "rename-column", str(t), "--column", "s", "--to", "tag"
    ]) == 0
    assert main([
        "table", "drop-column", str(t), "--column", "tag"
    ]) == 0
    assert main([
        "table", "optimize", str(t), "--zorder", "a,b"
    ]) == 0
    out = capsys.readouterr().out
    assert '"op": "set-props"' in out and '"op": "optimize"' in out
    assert [f.name for f in read_delta(spark, t).schema.fields] == [
        "a", "b"
    ]
    # missing-arg dispatches fail loudly with exit 2
    assert main(["table", "set-props", str(t)]) == 2
    assert main(["table", "rename-column", str(t), "--column", "a"]) == 2
    assert main(["table", "drop-column", str(t)]) == 2
    # zorder over a non-integer column refuses with the type named
    t2 = tmp_path / "t2"
    write_delta(
        spark.createDataFrame([(1, "x")], "a long, s string"), t2
    )
    from snapflow_spark.sources.delta import optimize_delta
    with pytest.raises(ValueError, match="non-integer"):
        optimize_delta(spark, t2, zorder_by=["a", "s"])


def test_operation_parameters_in_history(spark, tmp_path):
    """Round 16: commitInfo.operationParameters — delta-spark's
    DESCRIBE HISTORY provenance column: WRITE carries mode +
    partitionBy, DELETE its predicate, UPDATE predicate + set
    columns, OPTIMIZE targetSize/zOrderBy — values stringified."""
    import json as _json

    from snapflow_spark.sources.delta import (
        delete_from_delta,
        describe_delta_history,
        optimize_delta,
        update_delta,
    )

    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame(
            [(i, (i * 3) % 7, f"v{i}") for i in range(40)],
            "id long, k long, val string",
        ).repartition(4),
        t,
    )
    delete_from_delta(spark, t, "id >= 35")
    update_delta(spark, t, "id = 0", {"val": "'zero'"})
    optimize_delta(spark, t, zorder_by=["id", "k"])
    hist = {
        r.version: (r.operation, r.operation_parameters)
        for r in describe_delta_history(spark, t).collect()
    }
    op, p = hist[0]
    assert op == "WRITE"
    assert _json.loads(p)["mode"] == "Append"
    op, p = hist[1]
    assert op == "DELETE" and _json.loads(p)["predicate"] == "id >= 35"
    op, p = hist[2]
    pp = _json.loads(p)
    assert op == "UPDATE" and pp["predicate"] == "id = 0"
    assert _json.loads(pp["set"]) == ["val"]
    op, p = hist[3]
    pp = _json.loads(p)
    assert op == "OPTIMIZE"
    assert _json.loads(pp["zOrderBy"]) == ["id", "k"]


def test_check_constraints_end_to_end(spark, tmp_path):
    """Round 16 CHECK constraints: ADD CONSTRAINT validates existing
    rows and bumps the writer protocol; appends / updates / merges
    are gated row-exactly BEFORE staging; NULL passes (SQL CHECK
    semantics); violating commits leave the table untouched."""
    from snapflow_spark.sources.delta import (
        merge_delta,
        update_delta,
    )

    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, None)],
            "id long, price double",
        ),
        t,
    )
    # existing rows conform (NULL passes) -> constraint lands
    v = set_delta_properties(
        spark, t, {"delta.constraints.price_pos": "price > 0"}
    )
    snap = delta_snapshot(spark, t)
    assert snap.metadata["configuration"][
        "delta.constraints.price_pos"
    ] == "price > 0"
    assert int(snap.protocol["minWriterVersion"]) >= 3
    # a constraint the EXISTING rows violate refuses, no commit
    with pytest.raises(ValueError, match="id_small"):
        set_delta_properties(
            spark, t, {"delta.constraints.id_small": "id < 2"}
        )
    assert delta_snapshot(spark, t).version == v
    # violating append refuses BEFORE touching the log
    with pytest.raises(ValueError, match="price_pos"):
        write_delta(
            spark.createDataFrame(
                [(4, -1.0)], "id long, price double"
            ),
            t, mode="append",
        )
    assert delta_snapshot(spark, t).version == v
    assert read_delta(spark, t).count() == 3
    # conforming append (with a NULL) passes
    write_delta(
        spark.createDataFrame(
            [(4, 5.0), (5, None)], "id long, price double"
        ),
        t, mode="append",
    )
    assert read_delta(spark, t).count() == 5
    # UPDATE producing a violation refuses
    with pytest.raises(ValueError, match="price_pos"):
        update_delta(spark, t, "id = 1", {"price": "-price"})
    # MERGE whose inserts violate refuses
    with pytest.raises(ValueError, match="price_pos"):
        merge_delta(
            spark, t,
            spark.createDataFrame(
                [(9, -3.0)], "id long, price double"
            ),
            on=["id"],
        )
    assert {r.id for r in read_delta(spark, t).collect()} == {
        1, 2, 3, 4, 5
    }
    # dropping the constraint re-opens the gate
    set_delta_properties(
        spark, t, {"delta.constraints.price_pos": None}
    )
    write_delta(
        spark.createDataFrame([(6, -1.0)], "id long, price double"),
        t, mode="append",
    )
    assert read_delta(spark, t).count() == 6
