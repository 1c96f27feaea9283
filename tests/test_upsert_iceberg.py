"""upsert_iceberg (round 15) — the Flink upsert-sink commit shape:
equality delete + new data at the SAME sequence in ONE snapshot —
plus the round-15 ADVICE fixes (delete_from_iceberg excludes rows
already equality-deleted; no-current-snapshot raises a named
ValueError; partition pruning keeps files on representation
mismatches)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from snapflow_spark.sources.iceberg import (
    delete_from_iceberg,
    delete_iceberg_by_key,
    iceberg_snapshot,
    read_iceberg,
    upsert_iceberg,
    write_iceberg,
)


def _tbl(spark, rows):
    return spark.createDataFrame(rows, "id long, val long, grp string")


def _state(spark, path, **kw):
    return {
        (r.id, r.val, r.grp)
        for r in read_iceberg(spark, path, **kw).collect()
    }


def test_upsert_replaces_by_key_in_one_snapshot(spark, tmp_path):
    path = tmp_path / "t"
    target = [(i, i * 10, "ab"[i % 2]) for i in range(10)]
    write_iceberg(_tbl(spark, target), path)
    before = iceberg_snapshot(spark, path)
    n_snaps_before = len(before.metadata["snapshots"])

    src = [(i, i * 100, "ab"[i % 2]) for i in range(5, 15)]
    res = upsert_iceberg(spark, path, _tbl(spark, src), keys=["id"])
    assert res["keys"] == 10 and res["rows"] == 10

    expected = {r for r in target if r[0] < 5} | set(src)
    assert _state(spark, path) == expected
    # ONE snapshot: delete manifest + data manifest committed together
    after = iceberg_snapshot(spark, path)
    assert len(after.metadata["snapshots"]) == n_snaps_before + 1
    assert after.metadata["snapshots"][-1]["summary"]["operation"] == (
        "overwrite"
    )
    # time travel to the pre-upsert snapshot still sees the old rows
    assert _state(
        spark, path, snapshot_id=before.snapshot_id
    ) == set(target)


def test_upsert_replay_converges(spark, tmp_path):
    path = tmp_path / "t"
    write_iceberg(_tbl(spark, [(i, i, "a") for i in range(5)]), path)
    src = _tbl(spark, [(3, 99, "a"), (7, 77, "b")])
    upsert_iceberg(spark, path, src, keys=["id"])
    first = _state(spark, path)
    assert first == {(0, 0, "a"), (1, 1, "a"), (2, 2, "a"),
                     (4, 4, "a"), (3, 99, "a"), (7, 77, "b")}
    # replaying the same changelog converges (each upsert's delete
    # scopes to strictly-earlier sequences, so its own rows survive)
    upsert_iceberg(spark, path, src, keys=["id"])
    assert _state(spark, path) == first


def test_upsert_creates_table_and_guards(spark, tmp_path):
    path = tmp_path / "t"
    res = upsert_iceberg(
        spark, path, _tbl(spark, [(1, 1, "a")]), keys=["id"]
    )
    assert res["keys"] == 0 and res["rows"] == 1
    assert _state(spark, path) == {(1, 1, "a")}
    with pytest.raises(ValueError, match="key columns"):
        upsert_iceberg(
            spark, path, _tbl(spark, [(1, 1, "a")]), keys=["nope"]
        )
    with pytest.raises(ValueError, match="schema differs"):
        upsert_iceberg(
            spark,
            path,
            spark.createDataFrame([(1,)], "id long"),
            keys=["id"],
        )
    with pytest.raises(ValueError, match="empty key list"):
        upsert_iceberg(spark, path, _tbl(spark, [(1, 1, "a")]), keys=[])


def test_upsert_keeps_identity_partition_spec(spark, tmp_path):
    path = tmp_path / "t"
    write_iceberg(
        _tbl(spark, [(i, i, "ab"[i % 2]) for i in range(6)]),
        path,
        partition_by=["grp"],
    )
    upsert_iceberg(
        spark, path, _tbl(spark, [(0, 100, "a"), (9, 9, "b")]),
        keys=["id"],
    )
    assert _state(spark, path) == {
        (0, 100, "a"), (1, 1, "b"), (2, 2, "a"), (3, 3, "b"),
        (4, 4, "a"), (5, 5, "b"), (9, 9, "b"),
    }
    # the new data files carry typed partition values: pruning works
    snap = iceberg_snapshot(spark, path)
    assert all(
        pv.get("grp") in ("a", "b") for _p, pv, _n, _bd in snap.files
    )
    got = _state(spark, path, partition_filter={"grp": "b"})
    assert {(1, 1, "b"), (3, 3, "b"), (5, 5, "b"), (9, 9, "b")} <= got
    assert (0, 100, "a") not in got


def test_delete_from_iceberg_excludes_equality_deleted_rows(
    spark, tmp_path
):
    """Rows already dead via a sequence-scoped equality delete must
    not be matched again: the count reflects LIVE rows only and no
    redundant position-delete rows are written."""
    path = tmp_path / "t"
    write_iceberg(_tbl(spark, [(i, i, "a") for i in range(10)]), path)
    assert delete_iceberg_by_key(
        spark, path, spark.createDataFrame([(3,), (4,)], "id long")
    ) == 2
    # ids 3 and 4 are already equality-deleted: only 0,1,2,5 are live
    assert delete_from_iceberg(spark, path, "id < 6") == 4
    assert _state(spark, path) == {
        (i, i, "a") for i in (6, 7, 8, 9)
    }
    # repeat: nothing newly deleted (idempotent)
    assert delete_from_iceberg(spark, path, "id < 6") == 0


def test_delete_without_current_snapshot_raises_named(spark, tmp_path):
    """An external/empty table whose current-snapshot-id is -1 gets a
    descriptive ValueError, not a bare StopIteration."""
    table = tmp_path / "t"
    md = table / "metadata"
    md.mkdir(parents=True)
    meta = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": str(table),
        "last-updated-ms": 0,
        "last-column-id": 1,
        "schema": {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "id", "required": False,
                 "type": "long"},
            ],
        },
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "properties": {},
        "current-snapshot-id": -1,
        "snapshots": [],
    }
    (md / "v1.metadata.json").write_text(json.dumps(meta))
    (md / "version-hint.text").write_text("1")
    with pytest.raises(ValueError, match="no live current snapshot"):
        delete_iceberg_by_key(
            spark, table, spark.createDataFrame([(1,)], "id long")
        )


def test_partition_pruning_keeps_files_on_type_mismatch(
    spark, tmp_path
):
    """A probe whose python type cannot be compared to the stored
    manifest representation must KEEP every file (pruning is an
    optimization, never a filter) instead of silently pruning the
    table to empty."""
    path = tmp_path / "t"
    rows = [(i, i, str(i % 2)) for i in range(8)]
    write_iceberg(_tbl(spark, rows), path, partition_by=["grp"])
    # exact-type probe prunes normally
    assert (
        read_iceberg(spark, path, partition_filter={"grp": "1"}).count()
        == 4
    )
    # int probe vs string-stored partition value: incomparable — keep
    assert (
        read_iceberg(spark, path, partition_filter={"grp": 1}).count()
        == 8
    )


def test_iceberg_stream_sink_upsert_mode_exactly_once(spark, tmp_path):
    """iceberg_stream_sink(keys=): Flink's upsert=true shape — each
    micro-batch is one equality-delete+data snapshot; a fresh
    checkpoint's replay is suppressed by the batch-id summary."""
    from snapflow_spark.sources.iceberg import iceberg_stream_sink

    src = tmp_path / "src"
    table = tmp_path / "tbl"
    schema = "id long, val long, grp string"
    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a")], schema
    ).coalesce(1).write.parquet(str(src), mode="overwrite")

    def run(ckpt):
        q = (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .writeStream.foreachBatch(
                iceberg_stream_sink(table, "cdc-test", keys=["id"])
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ck1")
    assert _state(spark, table) == {(1, 10, "a"), (2, 20, "a")}
    spark.createDataFrame(
        [(2, 99, "a"), (3, 30, "b")], schema
    ).coalesce(1).write.parquet(str(src), mode="append")
    run("ck1")
    want = {(1, 10, "a"), (2, 99, "a"), (3, 30, "b")}
    assert _state(spark, table) == want
    run("ck2")
    assert _state(spark, table) == want


def test_update_iceberg_merge_on_read(spark, tmp_path):
    """update_iceberg (round 15): matched rows die via a position-
    delete file and their rewritten copies land in the SAME snapshot;
    already-dead rows never resurrect; partition specs preserved."""
    from snapflow_spark.sources.iceberg import update_iceberg

    path = tmp_path / "t"
    write_iceberg(
        _tbl(spark, [(i, i, "ab"[i % 2]) for i in range(8)]),
        path,
        partition_by=["grp"],
    )
    before = iceberg_snapshot(spark, path)
    n = update_iceberg(
        spark, path, "id >= 6", {"val": "val * 100"}
    )
    assert n == 2
    after = iceberg_snapshot(spark, path)
    # ONE new snapshot carrying both the delete and the rewrite
    assert (
        len(after.metadata["snapshots"])
        == len(before.metadata["snapshots"]) + 1
    )
    assert _state(spark, path) == {
        (0, 0, "a"), (1, 1, "b"), (2, 2, "a"), (3, 3, "b"),
        (4, 4, "a"), (5, 5, "b"), (6, 600, "a"), (7, 700, "b"),
    }
    # a second update composes (the first's deletes are honored)
    assert update_iceberg(spark, path, "id = 6", {"val": "0"}) == 1
    got = _state(spark, path)
    assert (6, 0, "a") in got and (6, 600, "a") not in got
    # prior equality-deleted rows never resurrect as updated copies
    assert delete_iceberg_by_key(
        spark, path, spark.createDataFrame([(7,)], "id long")
    ) == 1
    assert update_iceberg(spark, path, "id = 7", {"val": "1"}) == 0
    assert all(r[0] != 7 for r in _state(spark, path))
    # guards
    with pytest.raises(ValueError, match="unknown columns"):
        update_iceberg(spark, path, "id = 1", {"zz": "1"})
    with pytest.raises(ValueError, match="empty set_"):
        update_iceberg(spark, path, "id = 1", {})


def test_iceberg_metadata_tables(spark, tmp_path):
    """iceberg_metadata_table (round 15): the table$kind inspection
    surface — snapshots/history/refs/manifests/files — from metadata
    alone."""
    from snapflow_spark.sources.iceberg import (
        iceberg_metadata_table,
        tag_iceberg_snapshot,
    )

    path = tmp_path / "t"
    s0 = write_iceberg(_tbl(spark, [(i, i, "a") for i in range(6)]), path)
    delete_iceberg_by_key(
        spark, path, spark.createDataFrame([(2,)], "id long")
    )
    tag_iceberg_snapshot(path, "v1", snapshot_id=s0)

    snaps = iceberg_metadata_table(spark, path, "snapshots").collect()
    assert [r.operation for r in snaps] == ["append", "delete"]
    assert snaps[0].snapshot_id == s0
    hist = iceberg_metadata_table(spark, path, "history").collect()
    assert [r.is_current for r in hist] == [False, True]
    refs = {
        r.name: (r.type, r.snapshot_id)
        for r in iceberg_metadata_table(spark, path, "refs").collect()
    }
    assert refs["v1"] == ("tag", s0)
    assert refs["main"][0] == "branch"
    mans = iceberg_metadata_table(spark, path, "manifests").collect()
    assert {r.content for r in mans} == {0, 1}  # data + delete
    files = iceberg_metadata_table(spark, path, "files").collect()
    by_content = {}
    for r in files:
        by_content.setdefault(r.content, []).append(r)
    assert sum(r.record_count for r in by_content[0]) == 6  # data rows
    assert sum(r.record_count for r in by_content[2]) == 1  # eq keys
    assert all(r.file_size_in_bytes > 0 for r in files)
    with pytest.raises(ValueError, match="unknown kind"):
        iceberg_metadata_table(spark, path, "bogus")


def test_equality_delete_key_write_distributed(spark, tmp_path):
    """Round 16: above ``max_keys_per_file`` the equality-delete key
    set splits into MANY sorted delete files — all registered in the
    ONE DELETE manifest at the same sequence — and the table reads
    back identically to the single-file shape.  No single task (and
    never the driver) serializes the whole key set."""
    import pyarrow.parquet as pq

    from snapflow_spark.sources.iceberg import (
        _stage_equality_delete_files,
    )

    path = tmp_path / "t"
    target = [(i, i * 10, "ab"[i % 2]) for i in range(40)]
    write_iceberg(_tbl(spark, target), path)
    # tiny threshold forces the multi-file path on 25 keys
    n = delete_iceberg_by_key(
        spark, path,
        spark.createDataFrame([(i,) for i in range(25)], "id long"),
        max_keys_per_file=4,
    )
    assert n == 25
    snap = iceberg_snapshot(spark, path)
    # many delete files, one manifest, one sequence number
    assert len(snap.equality_deletes) >= 6
    seqs = {seq for _p, _cols, seq in snap.equality_deletes}
    assert len(seqs) == 1
    # each staged file is sorted within itself and none holds more
    # than ~threshold keys (range partitioning balances, not exact)
    all_keys = []
    for p, cols, _seq in snap.equality_deletes:
        vals = [r.id for r in spark.read.parquet(p).collect()]
        assert vals == sorted(vals)
        assert cols == ["id"]
        all_keys.extend(vals)
    assert sorted(all_keys) == list(range(25))
    # the read result matches the single-file semantics exactly
    assert _state(spark, path) == {
        (i, i * 10, "ab"[i % 2]) for i in range(25, 40)
    }
    # upsert takes the same path: multi-file delete + data, ONE snapshot
    res = upsert_iceberg(
        spark, path,
        _tbl(spark, [(i, -1, "z") for i in range(30, 38)]),
        keys=["id"],
        max_keys_per_file=3,
    )
    assert res["keys"] == 8
    snap2 = iceberg_snapshot(spark, path)
    new_deletes = [
        e for e in snap2.equality_deletes
        if e not in snap.equality_deletes
    ]
    assert len(new_deletes) >= 2
    assert len({seq for _p, _c, seq in new_deletes}) == 1
    assert _state(spark, path) == (
        {(i, i * 10, "ab"[i % 2]) for i in range(25, 30)}
        | {(i, -1, "z") for i in range(30, 38)}
        | {(38, 380, "a"), (39, 390, "b")}
    )
    # contract: the staging plan splits into parts files without any
    # repartition(1) single-task funnel when above the threshold
    staged, n_keys = _stage_equality_delete_files(
        spark.createDataFrame([(i,) for i in range(10)], "id long"),
        tmp_path / "stage-probe",
        ["id"],
        max_keys_per_file=2,
    )
    assert n_keys == 10 and len(staged) >= 3
    assert sum(r for _n, r in staged) == 10


def test_iceberg_metadata_tables_entries_partitions_all_files(
    spark, tmp_path
):
    """Round 16 kinds: ``entries`` (raw manifest entries, DELETED
    included), ``partitions`` (live data rows grouped by partition
    record), ``all_files`` (every snapshot's files, deduplicated)."""
    from snapflow_spark.sources.iceberg import iceberg_metadata_table

    path = tmp_path / "t"
    df = spark.createDataFrame(
        [(i, i * 10, "ab"[i % 2]) for i in range(8)],
        "id long, val long, grp string",
    )
    write_iceberg(df, path, partition_by=["grp"])
    delete_iceberg_by_key(
        spark, path, spark.createDataFrame([(0,), (1,)], "id long")
    )
    # overwrite makes the previous files current-dead but still
    # reachable through the old snapshot -> all_files keeps them
    write_iceberg(
        spark.createDataFrame([(100, 0, "z")],
                              "id long, val long, grp string"),
        path, mode="overwrite", partition_by=["grp"],
    )

    # partitions: one row per live partition record of the CURRENT
    # snapshot (the overwrite's single z file)
    parts = iceberg_metadata_table(spark, path, "partitions").collect()
    assert len(parts) == 1
    assert json.loads(parts[0].partition) == {"grp": "z"}
    assert (parts[0].file_count, parts[0].record_count) == (1, 1)

    # entries: raw rows with status + content; the current snapshot
    # only references the overwrite's data manifest
    ent = iceberg_metadata_table(spark, path, "entries").collect()
    assert all(r.status in (0, 1, 2) for r in ent)
    assert {r.content for r in ent} == {0}
    assert sum(r.record_count for r in ent) == 1

    # all_files: every snapshot's live files — the pre-overwrite data
    # files (a+b partitions), the equality-delete file, AND the new z
    # file — deduplicated by path
    allf = iceberg_metadata_table(spark, path, "all_files").collect()
    by_content = {}
    for r in allf:
        by_content.setdefault(r.content, []).append(r)
    assert sum(r.record_count for r in by_content[0]) == 9  # 8 + 1
    assert sum(r.record_count for r in by_content[2]) == 2  # eq keys
    assert len(set(r.file_path for r in allf)) == len(allf)
    # partition records decode per file
    pvs = {json.loads(r.partition).get("grp") for r in by_content[0]}
    assert pvs == {"a", "b", "z"}


def test_rewrite_iceberg_manifests(spark, tmp_path):
    """Round 16 manifest compaction: three appends + an equality
    delete fold into ONE data manifest in a metadata-only commit —
    rows identical, per-entry sequence numbers carried EXPLICITLY so
    delete scoping survives, bounds/partition pruning unchanged,
    time travel intact."""
    from snapflow_spark.sources.iceberg import (
        iceberg_metadata_table,
        rewrite_iceberg_manifests,
    )

    path = tmp_path / "t"
    write_iceberg(_tbl(spark, [(i, i, "a") for i in range(5)]), path)
    # delete keys 0,1 at the next sequence
    delete_iceberg_by_key(
        spark, path, spark.createDataFrame([(0,), (1,)], "id long")
    )
    # rows appended AFTER the delete survive even when matching
    write_iceberg(
        _tbl(spark, [(0, 100, "b"), (9, 90, "b")]), path,
        mode="append",
    )
    s_pre = iceberg_snapshot(spark, path)
    before_rows = _state(spark, path)
    assert (0, 100, "b") in before_rows  # post-delete append alive
    assert (0, 0, "a") not in before_rows
    mans_before = iceberg_metadata_table(
        spark, path, "manifests"
    ).collect()
    assert sum(1 for r in mans_before if r.content == 0) >= 2

    res = rewrite_iceberg_manifests(spark, path)
    assert res["manifests_before"] >= 2
    assert res["manifests_after"] == 1
    # identical read through the compacted metadata
    assert _state(spark, path) == before_rows
    mans_after = iceberg_metadata_table(
        spark, path, "manifests"
    ).collect()
    assert sum(1 for r in mans_after if r.content == 0) == 1
    assert sum(1 for r in mans_after if r.content == 1) == 1
    # per-entry sequences explicit: the post-delete file still reads
    # at its ORIGINAL sequence (2 — past the delete's 1), the
    # pre-delete files at theirs (0), through the rewritten manifest
    snap = iceberg_snapshot(spark, path)
    assert sorted(snap.file_seqs.values()) == [0, 0, 0, 0, 2, 2]
    assert [s for _p, _c, s in snap.equality_deletes] == [1]
    # time travel to the pre-rewrite snapshot still works
    assert _state(
        spark, path, snapshot_id=s_pre.snapshot_id
    ) == before_rows
    # bounds survived: min_max pruning still cuts the file list
    wide = read_iceberg(spark, path)
    narrow = read_iceberg(
        spark, path, min_max_filter={"id": (9, 9)}
    )
    assert len(narrow.inputFiles()) < len(wide.inputFiles())
    # a second rewrite is a no-op (already one manifest)
    res2 = rewrite_iceberg_manifests(spark, path)
    assert res2["manifests_after"] == res2["manifests_before"] == 1
    # appends on the compacted table keep working
    write_iceberg(_tbl(spark, [(50, 5, "c")]), path, mode="append")
    assert (50, 5, "c") in _state(spark, path)


def test_rewrite_manifests_on_bucket_partitioned(spark, tmp_path):
    """Partition records pass through the rewrite verbatim: bucket
    pruning on the compacted manifests stays exact."""
    from snapflow_spark.sources.iceberg import (
        rewrite_iceberg_manifests,
    )

    path = tmp_path / "t"
    base = spark.createDataFrame(
        [(i, i * 10, "ab"[i % 2]) for i in range(12)],
        "id long, val long, grp string",
    )
    write_iceberg(base, path, partition_by=[("id", "bucket[4]")])
    write_iceberg(
        spark.createDataFrame([(100, 1, "z")],
                              "id long, val long, grp string"),
        path, mode="append",
    )
    before = _state(spark, path)
    res = rewrite_iceberg_manifests(spark, path)
    assert res["manifests_after"] == 1
    assert _state(spark, path) == before
    pruned = read_iceberg(spark, path, partition_filter={"id": 100})
    assert (100, 1, "z") in {
        (r.id, r.val, r.grp) for r in pruned.collect()
    }
    full = read_iceberg(spark, path)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
