"""Write-side partition TRANSFORMS (sources/iceberg.py round 16):
``write_iceberg(partition_by=[("c", "bucket[4]"), ("ts", "day")])``
stages files through the spec transforms — bucket via the
numpy-vectorized Appendix-B murmur3 Arrow stage, truncate/temporal
via pure codegen — so the whole CDC-apply surface (append, upsert,
update, rewrite) works on the bucket/days-partitioned specs real
external Iceberg tables use.  The codegen/Arrow stage is pinned
value-for-value against the scalar ``iceberg_transforms`` reference
(spec Appendix B), negatives and nulls included."""

from __future__ import annotations

import datetime as dt

import pytest

from snapflow_spark.sources.iceberg import (
    _PartField,
    _result_avro,
    _spec_part_fields,
    _with_partition_value,
    iceberg_snapshot,
    read_iceberg,
    rewrite_iceberg_files,
    update_iceberg,
    upsert_iceberg,
    write_iceberg,
)
from snapflow_spark.sources.iceberg_transforms import (
    apply_transform,
    bucket_value,
)

SCHEMA = "doc_id bigint, day date, stamp timestamp, text string"
ROWS = [
    (0, dt.date(2021, 3, 14), dt.datetime(2021, 3, 14, 5, 30), "a"),
    (1, dt.date(2021, 3, 14), dt.datetime(2021, 3, 14, 23, 59), "b"),
    (2, dt.date(2021, 3, 15), dt.datetime(2021, 3, 15, 0, 1), "c"),
    (3, dt.date(1969, 12, 31), dt.datetime(1969, 12, 31, 23, 0), "d"),
    (4, None, None, "e"),
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, SCHEMA)


def _ids(df):
    return {r.doc_id for r in df.collect()}


def test_transform_stage_matches_scalar_reference(spark):
    """The staged shadow values — codegen for truncate/temporal,
    numpy-murmur3 Arrow for bucket — agree value-for-value with the
    pinned scalar ``apply_transform`` (negatives and nulls too)."""
    rows = [
        (-7, -(2**62), dt.date(1969, 6, 1),
         dt.datetime(1969, 12, 31, 23, 59, 59, 999999), "héllo world"),
        (13, 2**62, dt.date(2024, 2, 29),
         dt.datetime(2024, 2, 29, 12, 0, 0, 123456), "ab"),
        (0, 34, dt.date(1970, 1, 1), dt.datetime(1970, 1, 1), ""),
        (None, None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "i int, l long, d date, ts timestamp, s string"
    )
    cases = [
        ("i", "int", "bucket[16]"),
        ("i", "int", "truncate[5]"),
        ("l", "long", "bucket[7]"),
        ("l", "long", "truncate[100]"),
        ("d", "date", "bucket[4]"),
        ("d", "date", "year"),
        ("d", "date", "month"),
        ("d", "date", "day"),
        ("ts", "timestamptz", "bucket[4]"),
        ("ts", "timestamptz", "year"),
        ("ts", "timestamptz", "month"),
        ("ts", "timestamptz", "day"),
        ("ts", "timestamptz", "hour"),
        ("s", "string", "bucket[8]"),
        ("s", "string", "truncate[3]"),
    ]
    out = df
    names = []
    for i, (src, t, transform) in enumerate(cases):
        name = f"pv_{i}"
        out = _with_partition_value(
            out, _PartField(name, src, transform, t,
                            _result_avro(transform, t)), name
        )
        names.append(name)
    got = out.collect()
    for row_in, row_out in zip(rows, got):
        by_src = dict(zip(["i", "l", "d", "ts", "s"], row_in))
        for (src, t, transform), name in zip(cases, names):
            v = by_src[src]
            want = None if v is None else apply_transform(transform, t, v)
            assert row_out[name] == want, (src, t, transform, v)


def test_bucket_days_create_append_prune(spark, tmp_path):
    """Engine-created bucket[4]+day table: manifests store the
    transform values, partition_filter prunes the FILE LIST exactly,
    appends adopt the spec, time travel holds."""
    table = tmp_path / "tbl"
    write_iceberg(
        _df(spark), table,
        partition_by=[("doc_id", "bucket[4]"), ("day", "day")],
    )
    snap = iceberg_snapshot(spark, table)
    assert snap.partition_fields == [
        ("doc_id_bucket", "bucket[4]"), ("day_day", "day")
    ]
    # every manifest partition value equals the pinned transform
    for _p, pv, _n, _bd in snap.files:
        assert set(pv) == {"doc_id_bucket", "day_day"}
    # null partition values land as nulls, not a crash
    assert any(pv["day_day"] is None for _p, pv, _n, _bd in snap.files)
    # prune by SOURCE column: probe runs through the transform
    d0 = read_iceberg(
        spark, table, partition_filter={"day": dt.date(2021, 3, 14)}
    )
    assert _ids(d0) == {0, 1}
    b = read_iceberg(
        spark, table, partition_filter={"doc_id": 2}
    )
    assert 2 in _ids(b)
    # the probe's bucket holds ONLY files whose stored bucket matches
    want_bucket = bucket_value("long", 2, 4)
    kept = {
        pv["doc_id_bucket"]
        for _p, pv, _n, _bd in snap.files
        if _p in set(b.inputFiles()) or any(
            _p.endswith(x.split("/")[-1]) for x in b.inputFiles()
        )
    }
    assert kept == {want_bucket}
    # append with partition_by=None adopts the transform spec
    write_iceberg(
        _df(spark, [(10, dt.date(2021, 3, 14),
                     dt.datetime(2021, 3, 14, 9, 0), "z")]),
        table, mode="append",
    )
    assert _ids(read_iceberg(spark, table)) == {0, 1, 2, 3, 4, 10}
    d1 = read_iceberg(
        spark, table, partition_filter={"day": dt.date(2021, 3, 14)}
    )
    assert _ids(d1) == {0, 1, 10}
    # a MISMATCHED spec refuses
    with pytest.raises(ValueError, match="partition_by"):
        write_iceberg(
            _df(spark), table, mode="append",
            partition_by=[("doc_id", "bucket[8]"), ("day", "day")],
        )


def test_upsert_update_on_bucket_partitioned(spark, tmp_path):
    """The CDC-apply surface on a transform-partitioned table:
    upsert replaces by key, update rewrites rows — both re-stage
    through the spec transforms and pruning stays exact."""
    table = tmp_path / "tbl"
    write_iceberg(
        _df(spark), table, partition_by=[("doc_id", "bucket[4]")]
    )
    res = upsert_iceberg(
        spark, table,
        _df(spark, [
            (2, dt.date(2022, 1, 1), dt.datetime(2022, 1, 1), "C2"),
            (7, dt.date(2022, 1, 2), dt.datetime(2022, 1, 2), "new"),
        ]),
        keys=["doc_id"],
    )
    assert res["keys"] == 2 and res["rows"] == 2
    got = {
        (r.doc_id, r.text) for r in read_iceberg(spark, table).collect()
    }
    assert got == {(0, "a"), (1, "b"), (2, "C2"), (3, "d"),
                   (4, "e"), (7, "new")}
    # the upserted files carry the right bucket values
    snap = iceberg_snapshot(spark, table)
    for p, pv, _n, _bd in snap.files:
        ids = {r.doc_id for r in
               read_iceberg(spark, table).sparkSession.read.parquet(p)
               .collect()}
        for i in ids:
            assert pv["doc_id_bucket"] == bucket_value("long", i, 4), p
    # row-level UPDATE re-stages through the transform too
    n = update_iceberg(
        spark, table, "doc_id = 7", {"text": "'updated'"}
    )
    assert n == 1
    got = {
        (r.doc_id, r.text) for r in read_iceberg(spark, table).collect()
    }
    assert (7, "updated") in got and len(got) == 6
    # pruning by source key still exact after upsert+update
    one = read_iceberg(spark, table, partition_filter={"doc_id": 7})
    assert {r.text for r in one.collect() if r.doc_id == 7} == {"updated"}


def test_rewrite_compacts_transform_partitioned(spark, tmp_path):
    """Compaction on a bucket spec: the merge-on-read debt
    materializes, the spec survives verbatim (names + field-ids),
    and pruning still works on the rewritten files."""
    table = tmp_path / "tbl"
    write_iceberg(
        _df(spark), table, partition_by=[("doc_id", "bucket[2]")]
    )
    upsert_iceberg(
        spark, table,
        _df(spark, [(0, dt.date(2023, 1, 1),
                     dt.datetime(2023, 1, 1), "A0")]),
        keys=["doc_id"],
    )
    before = iceberg_snapshot(spark, table)
    assert before.equality_deletes
    res = rewrite_iceberg_files(spark, table)
    assert res["delete_files_removed"] >= 1
    after = iceberg_snapshot(spark, table)
    assert not after.equality_deletes and not after.position_deletes
    assert after.partition_fields == [("doc_id_bucket", "bucket[2]")]
    got = {
        (r.doc_id, r.text) for r in read_iceberg(spark, table).collect()
    }
    assert got == {(0, "A0"), (1, "b"), (2, "c"), (3, "d"), (4, "e")}
    # spec fields kept their names: probing by the FIELD name still
    # runs the SOURCE value through the transform and prunes exactly
    want = bucket_value("long", 1, 2)
    b1 = read_iceberg(
        spark, table, partition_filter={"doc_id_bucket": 1}
    )
    assert b1.count() == sum(
        n for _p, pv, n, _bd in after.files
        if pv["doc_id_bucket"] == want
    )


def test_append_onto_external_transform_spec(spark, tmp_path):
    """Append onto a HAND-synthesized table with a bucket[4] spec
    (the external-table shape): the engine adopts the spec verbatim
    — field name ``id_bucket``, field-id 1001 — and its new files
    prune correctly next to the externally-written ones."""
    from tests.test_iceberg import _synthesize_v2

    table = tmp_path / "ext"
    _synthesize_v2(spark, table)
    write_iceberg(
        spark.createDataFrame(
            [(40, "new-row", "es")],
            "doc_id long, text string, lang string",
        ),
        table,
        mode="append",
    )
    got = {(r.doc_id, r.text, r.lang)
           for r in read_iceberg(spark, table).collect()}
    assert (40, "new-row", "es") in got and len(got) == 4
    # the engine-written file stores the spec's murmur3 bucket value
    snap = iceberg_snapshot(spark, table)
    import re

    # engine-staged files are ordinal-prefixed under data/
    new = [
        pv for p, pv, _n, _bd in snap.files
        if re.search(r"data/\d{5}-", p)
    ]
    assert new and all(
        pv["id_bucket"] == bucket_value("long", 40, 4) for pv in new
    )
    # prune by source column reaches the engine-written file too
    hit = read_iceberg(spark, table, partition_filter={"doc_id": 40})
    assert (40, "new-row", "es") in {
        (r.doc_id, r.text, r.lang) for r in hit.collect()
    }
    # spec adoption recorded in metadata: still ONE spec, unchanged
    pf = _spec_part_fields(snap.metadata)
    assert [(f.name, f.transform) for f in pf] == [
        ("lang", "identity"), ("id_bucket", "bucket[4]")
    ]


def test_sql_transform_call_strings(spark, tmp_path):
    """partition_by accepts Iceberg's SQL transform-call strings —
    "bucket(4, col)" / "days(col)" — producing the identical spec
    the tuple form does."""
    t1, t2 = tmp_path / "a", tmp_path / "b"
    write_iceberg(
        _df(spark), t1, partition_by=["bucket(4, doc_id)", "days(day)"]
    )
    write_iceberg(
        _df(spark), t2,
        partition_by=[("doc_id", "bucket[4]"), ("day", "day")],
    )
    s1 = iceberg_snapshot(spark, t1)
    s2 = iceberg_snapshot(spark, t2)
    assert s1.partition_fields == s2.partition_fields == [
        ("doc_id_bucket", "bucket[4]"), ("day_day", "day")
    ]
    assert {pv["doc_id_bucket"] for _p, pv, _n, _bd in s1.files} == \
        {pv["doc_id_bucket"] for _p, pv, _n, _bd in s2.files}
    with pytest.raises(ValueError, match="unknown partition"):
        write_iceberg(_df(spark), tmp_path / "c",
                      partition_by=["wat(doc_id)"])


def test_bucket_long_null_batch_precision(spark, tmp_path):
    """ADVICE r16 (medium): an Arrow batch of a NULLABLE long bucket
    column must not round-trip through float64 — values above 2^53
    would mis-bucket silently and then vanish from
    ``partition_filter`` reads (probe computes the CORRECT bucket,
    file carries the wrong one).  Nulls are handled JVM-side
    (coalesce + re-mask) so pandas never promotes the batch."""
    big = (2**53) + 1  # first long float64 cannot represent
    big2 = (2**62) + 3
    rows = [(big, "a"), (None, "b"), (big2, "c"), (5, "d")]
    df = spark.createDataFrame(rows, "k bigint, text string")
    table = tmp_path / "tbl"
    write_iceberg(df, table, partition_by=[("k", "bucket[8]")])
    snap = iceberg_snapshot(spark, table)
    # every stored bucket equals the pinned scalar spec value
    stored = {}
    for _p, pv, _n, _bd in snap.files:
        stored[_p] = pv["k_bucket"]
    want = {v: bucket_value("long", v, 8) for v in (big, big2, 5)}
    got_buckets = {v for v in stored.values() if v is not None}
    assert got_buckets == set(want.values())
    assert any(v is None for v in stored.values())  # null row's file
    # the round-trip: partition_filter by the BIG values finds them
    for v, txt in ((big, "a"), (big2, "c"), (5, "d")):
        r = read_iceberg(spark, table, partition_filter={"k": v})
        assert (v, txt) in {(x.k, x.text) for x in r.collect()}
