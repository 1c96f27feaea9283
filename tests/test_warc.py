"""WARC / WET ingestion (sources/warc.py): streaming record parser
over plain / member-gzip / whole-file-gzip layouts, the Spark "warc"
DataSource (file-per-partition, type filter, oversize skip, torn-tail
handling), HTTP payload split, and WET text decode."""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from snapflow_spark.sources.warc import (
    WarcDataSource,
    WarcFormatError,
    http_response_parts,
    iter_warc_records,
    open_warc_stream,
    read_warc,
    warc_record_bytes,
    wet_text,
    write_warc,
)

HTTP_BODY = b"<html><body>hello \xe2\x82\xac page</body></html>"
HTTP_PAYLOAD = (
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/html; charset=utf-8\r\n"
    b"X-Junk: \xff\xfe\r\n"  # header bytes are NOT utf-8 — by design
    b"\r\n" + HTTP_BODY
)
WET_TEXT = "hello € page\nsecond line"


def _records():
    mk = lambda i, t, uri, ctype, payload: (  # noqa: E731
        {
            "WARC-Type": t,
            "WARC-Record-ID": f"<urn:uuid:rec-{i}>",
            "WARC-Target-URI": uri,
            "WARC-Date": "2026-08-14T12:00:00Z",
            "Content-Type": ctype,
        },
        payload,
    )
    return [
        (
            {
                "WARC-Type": "warcinfo",
                "WARC-Record-ID": "<urn:uuid:info>",
                "WARC-Date": "2026-08-14T12:00:00Z",
                "Content-Type": "application/warc-fields",
            },
            b"software: snapflow-spark-test\r\n",
        ),
        mk(1, "request", "http://a.example/x", "application/http; msgtype=request",
           b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n"),
        mk(2, "response", "http://a.example/x",
           "application/http; msgtype=response", HTTP_PAYLOAD),
        mk(3, "conversion", "http://a.example/x", "text/plain",
           WET_TEXT.encode("utf-8") + b" \xff tail"),  # invalid utf-8 byte
        mk(4, "response", "http://b.example/y",
           "application/http; msgtype=response",
           b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\ngone"),
    ]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    recs = _records()
    write_warc(str(d / "a.warc"), recs, gzip_members=False)
    write_warc(str(d / "b.warc.gz"), recs)  # member-per-record gzip
    # whole-file single-member gzip (the non-CC layout that must also work)
    blob = b"".join(warc_record_bytes(h, p) for h, p in recs)
    (d / "c.warc.gz").write_bytes(gzip.compress(blob, mtime=0))
    return d


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(WarcDataSource)


def test_parser_all_layouts(warc_dir):
    for name in ("a.warc", "b.warc.gz", "c.warc.gz"):
        with open_warc_stream(str(warc_dir / name)) as s:
            got = list(iter_warc_records(s, where=name))
        assert [h["warc-type"] for h, _ in got] == [
            "warcinfo", "request", "response", "conversion", "response",
        ]
        assert got[2][1] == HTTP_PAYLOAD  # payload byte-exact through gzip
        assert all(h["warc-version"] == "WARC/1.0" for h, _ in got)


def test_scan_schema_and_partitioning(spark, warc_dir):
    df = read_warc(spark, str(warc_dir))
    assert [f.name for f in df.schema.fields] == [
        "record_id", "warc_type", "target_uri", "warc_date", "content_type",
        "content_length", "payload", "warc_file", "record_index",
    ]
    # one partition per file — the scale contract
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 15  # 5 records × 3 files
    by_file = {r.warc_file for r in rows}
    assert len(by_file) == 3
    one = [r for r in rows if r.warc_file.endswith("b.warc.gz")]
    assert [r.record_index for r in sorted(one, key=lambda r: r.record_index)] == [
        0, 1, 2, 3, 4,
    ]
    resp = next(r for r in one if r.record_index == 2)
    assert resp.warc_type == "response"
    assert resp.target_uri == "http://a.example/x"
    assert bytes(resp.payload) == HTTP_PAYLOAD
    assert resp.content_length == len(HTTP_PAYLOAD)
    assert resp.warc_date == datetime(2026, 8, 14, 12, 0, 0)


def test_scan_type_filter(spark, warc_dir):
    df = read_warc(spark, str(warc_dir / "a.warc"), types="response,conversion")
    counts = dict(df.groupBy("warc_type").count().collect())
    assert counts == {"response": 2, "conversion": 1}


def test_scan_oversize_keeps_headers_nulls_payload(spark, warc_dir):
    cap = len(HTTP_PAYLOAD) - 1
    df = read_warc(spark, str(warc_dir / "b.warc.gz"), max_record_bytes=cap)
    rows = {r.record_index: r for r in df.collect()}
    assert len(rows) == 5  # nothing dropped
    assert rows[2].payload is None  # the 200 response exceeded the cap
    assert rows[2].content_length == len(HTTP_PAYLOAD)  # triage metadata kept
    assert rows[4].payload is not None  # smaller records unaffected


def test_torn_tail_stop_vs_fail(spark, warc_dir, tmp_path):
    whole = (warc_dir / "a.warc").read_bytes()
    torn = tmp_path / "torn.warc"
    torn.write_bytes(whole[: len(whole) - 40])  # cut inside the last payload
    with open_warc_stream(str(torn)) as s:
        got = list(iter_warc_records(s, truncated="stop", where="torn"))
    assert len(got) == 4  # clean records preserved, torn tail dropped
    with open_warc_stream(str(torn)) as s:
        with pytest.raises(WarcFormatError, match="EOF inside"):
            list(iter_warc_records(s, where="torn"))
    # DataSource surface: truncated=stop reads the salvageable prefix
    df = read_warc(spark, str(torn), truncated="stop")
    assert df.count() == 4


def test_http_response_parts(spark, warc_dir):
    df = http_response_parts(
        read_warc(spark, str(warc_dir / "a.warc"), types="response")
    )
    rows = {r.record_index: r for r in df.collect()}
    ok = rows[2]
    assert ok.http_status == 200
    assert ok.http_content_type == "text/html; charset=utf-8"
    assert bytes(ok.http_body) == HTTP_BODY
    nf = rows[4]
    assert nf.http_status == 404
    assert bytes(nf.http_body) == b"gone"


def test_wet_text_decode(spark, warc_dir):
    df = wet_text(read_warc(spark, str(warc_dir / "b.warc.gz")))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].text.startswith(WET_TEXT)
    assert "�" in rows[0].text  # invalid byte replaced, not fatal
    assert "payload" not in df.columns


def test_writer_stamps_date_and_length(tmp_path):
    p = str(tmp_path / "d.warc.gz")
    n = write_warc(
        p,
        [({"WARC-Type": "resource", "Content-Length": "999"}, b"abc")],
        date=datetime(2026, 8, 14, 9, 30, tzinfo=timezone.utc),
    )
    assert n == 1
    with open_warc_stream(p) as s:
        [(h, payload)] = list(iter_warc_records(s))
    assert payload == b"abc"
    assert h["content-length"] == "3"  # stale declared length overridden
    assert h["warc-date"] == "2026-08-14T09:30:00Z"


def test_downstream_composition(spark, warc_dir):
    """WET records feed the ordinary text pipeline: decode -> exact
    dedup across the three replica files collapses to one doc."""
    from snapflow_spark.operators.dedup_text import exact_dedup

    docs = (
        wet_text(read_warc(spark, str(warc_dir)))
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("text"),
        )
    )
    kept = exact_dedup(docs, text_col="text", id_col="doc_id")
    assert docs.count() == 3
    assert kept.count() == 1


def test_yaml_builtin_scan_warc(spark, warc_dir, tmp_path):
    """core.scan_warc is a zero-input source node: WET text lands in
    the pipeline store and composes with downstream text builtins."""
    from snapflow_spark.plans import load_graph

    cfg = {
        "warehouse": str(tmp_path / "wh_warc"),
        "nodes": [
            {
                "name": "crawl",
                "function": "core.scan_warc",
                "params": {"path": str(warc_dir / "b.warc.gz"), "wet": True},
                "overwrite": True,
            },
            {
                "name": "long_docs",
                "function": "core.filter",
                "upstream": {"input": "crawl"},
                "params": {"predicate": "length(text) > 5"},
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    assert g.produce(spark) == 2
    rows = g.read(spark, "long_docs").collect()
    assert len(rows) == 1
    assert rows[0].warc_type == "conversion"
    assert rows[0].text.startswith("hello")


def test_cli_warc_stats(spark, warc_dir, capsys):
    """`python -m snapflow_spark warc-stats <path>` triages without
    decode: per-type counts + totals on stdout."""
    from snapflow_spark.cli import main

    assert main(["warc-stats", str(warc_dir / "a.warc")]) == 0
    out = capsys.readouterr().out
    assert "response" in out and "conversion" in out
    assert "total: 5 records" in out


def test_write_warc_shards_round_trip(spark, tmp_path):
    """Distributed WET re-emit: per-partition shards, read back by the
    warc scan byte-exact; NULL texts skipped; empty partitions leave
    no shard."""
    from datetime import timezone as _tz

    from snapflow_spark.sources.warc import read_warc, write_warc_shards

    df = spark.createDataFrame(
        [
            ("https://a.com/1", "alpha doc"),
            ("https://a.com/2", "beta doc"),
            ("https://a.com/3", None),
            ("https://a.com/4", "gamma € doc"),
        ],
        "target_uri string, text string",
    ).repartition(8)  # more partitions than rows -> empty ones exist
    out = str(tmp_path / "wet_out")
    n_shards = write_warc_shards(
        df, out, date=datetime(2026, 8, 14, tzinfo=_tz.utc)
    )
    assert 1 <= n_shards <= 3  # only non-empty partitions shard
    back = wet_text(read_warc(spark, out))
    got = {r.target_uri: r.text for r in back.collect()}
    assert got == {
        "https://a.com/1": "alpha doc",
        "https://a.com/2": "beta doc",
        "https://a.com/4": "gamma € doc",
    }
    rows = read_warc(spark, out).collect()
    assert all(r.warc_date == datetime(2026, 8, 14) for r in rows)


def test_import_warc_files_incremental(spark, warc_dir, tmp_path):
    """File-level incremental ingest: first run imports every file (one
    snapshot each), a new file later imports ALONE, a clean re-run is a
    no-op — crash-safe per-file cursor commits."""
    import shutil

    from snapflow_spark.incremental.store import SnapshotStore
    from snapflow_spark.sources.warc import import_warc_files

    src = tmp_path / "drop"
    src.mkdir()
    for name in ("a.warc", "b.warc.gz"):
        shutil.copy(warc_dir / name, src / name)

    store = SnapshotStore(str(tmp_path / "store"))
    r1 = import_warc_files(spark, str(src), store, wet=True)
    assert r1.n_pages == 2 and len(r1.snapshot_ids) == 2
    assert r1.n_records == 2  # one conversion record per file

    r2 = import_warc_files(spark, str(src), store, wet=True)
    assert r2.n_pages == 0 and r2.snapshot_ids == []  # caught up

    shutil.copy(warc_dir / "c.warc.gz", src / "c.warc.gz")
    r3 = import_warc_files(spark, str(src), store, wet=True)
    assert r3.n_pages == 1  # only the new file
    assert len(r3.cursor) == 3


def test_yaml_warc_source_incremental(spark, warc_dir, tmp_path):
    """`warc:` source in YAML: produce() ingests the drop directory
    incrementally; second produce with no new files is a no-op."""
    import shutil

    from snapflow_spark.plans import load_graph

    src = tmp_path / "drop2"
    src.mkdir()
    shutil.copy(warc_dir / "a.warc", src / "a.warc")
    cfg = {
        "warehouse": str(tmp_path / "wh_warcsrc"),
        "sources": [{"name": "crawl", "warc": str(src), "wet": True}],
        "nodes": [
            {"name": "history", "function": "core.accumulate", "upstream": "crawl"}
        ],
    }
    g = load_graph(cfg)
    assert g.produce(spark) > 0
    assert g.read(spark, "history").count() == 1
    assert g.produce(spark) == 0  # caught up

    shutil.copy(warc_dir / "b.warc.gz", src / "b.warc.gz")
    assert g.produce(spark) > 0
    assert g.read(spark, "history").count() == 2


# --- hypothesis fuzz (Spark-free, test_property.py conventions) ------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_header_name = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127),
    min_size=1, max_size=12,
).map(lambda s: "X-" + s)
_header_value = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30
).map(str.strip)
_record = st.tuples(
    st.dictionaries(_header_name, _header_value, max_size=4),
    st.binary(max_size=400),
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_record, min_size=1, max_size=6), st.booleans())
def test_fuzz_warc_round_trip(tmp_path_factory, records, gz):
    """Any record set round-trips byte-exact through write_warc →
    iter_warc_records in both gzip layouts."""
    d = tmp_path_factory.mktemp("fuzz")
    p = str(d / ("f.warc.gz" if gz else "f.warc"))
    recs = [
        ({**h, "WARC-Type": "resource"}, payload) for h, payload in records
    ]
    assert write_warc(p, recs) == len(recs)
    with open_warc_stream(p) as s:
        got = list(iter_warc_records(s))
    assert len(got) == len(recs)
    for (h_in, payload_in), (h_out, payload_out) in zip(recs, got):
        assert payload_out == payload_in
        # WARC names are case-insensitive: the writer merges names that
        # collide only in case (last value wins, matching the reader's
        # lowercase last-wins fold), so expectations are keyed lowercase.
        expected = {}
        for k, v in h_in.items():
            if k.lower() == "content-length":
                continue  # writer overrides with the real length
            expected[k.lower()] = v
        for lk, v in expected.items():
            assert h_out[lk] == v


@settings(max_examples=60, deadline=None)
@given(
    st.lists(_record, min_size=1, max_size=4),
    st.integers(min_value=0, max_value=1_000_000),
    st.booleans(),
)
def test_fuzz_truncation_never_raises_with_stop(
    tmp_path_factory, records, cut, gz
):
    """truncated='stop' over ANY prefix of a valid warc file — plain
    OR member-gzip (where a cut tears a gzip member, surfacing as a
    stream error, not a short read) — yields a prefix of the records
    and never raises."""
    import gzip as _gzip
    import io as _io

    d = tmp_path_factory.mktemp("fuzztr")
    p = str(d / ("t.warc.gz" if gz else "t.warc"))
    recs = [({**h, "WARC-Type": "resource"}, pl) for h, pl in records]
    write_warc(p, recs)
    whole = open(p, "rb").read()
    cut_bytes = whole[: cut % (len(whole) + 1)]
    stream = (
        _gzip.GzipFile(fileobj=_io.BytesIO(cut_bytes))
        if gz and cut_bytes[:2] == b"\x1f\x8b"
        else _io.BytesIO(cut_bytes)
    )
    got = list(iter_warc_records(stream, truncated="stop"))
    assert len(got) <= len(recs)
    for (h_in, payload_in), (h_out, payload_out) in zip(recs, got):
        assert payload_out == payload_in  # salvaged prefix is intact


def test_warc_readstream_file_per_batch(spark, warc_dir, tmp_path):
    """spark.readStream.format('warc'): one file per micro-batch,
    Spark's offset log is the only state; a file dropped mid-stream
    lands in a later batch; restart resumes past committed files."""
    import shutil
    import time

    src = tmp_path / "streamdrop"
    src.mkdir()
    shutil.copy(warc_dir / "a.warc", src / "0001.warc")

    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "stream_ckpt")

    def run_until(want, seconds=45):
        stream = (
            spark.readStream.format("warc")
            .option("path", str(src))
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + seconds
            n = 0
            while time.time() < deadline:
                try:
                    n = spark.read.parquet(out).count()
                except Exception:
                    n = 0
                if n >= want:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
        return spark.read.parquet(out)

    got = run_until(want=5)
    assert got.count() == 5  # first file's records

    # second file arrives; the SAME checkpoint resumes past file one
    shutil.copy(warc_dir / "b.warc.gz", src / "0002.warc.gz")
    got = run_until(want=10)
    assert got.count() == 10
    assert got.select("warc_file").distinct().count() == 2
    # no duplicates: (file, record_index) unique
    assert (
        got.groupBy("warc_file", "record_index").count().where("count > 1").count()
        == 0
    )


def test_warc_stream_reader_partition_based_and_executor_lazy(warc_dir):
    """Round 9: the streaming source is a partition-based
    DataSourceStreamReader — one InputPartition per new file, and
    read() hands executors the SAME record-streaming generator the
    batch scan uses (never a driver-side pickled row list, which was
    the Simple reader's documented OOM hazard at CC record sizes)."""
    import glob
    import inspect

    from pyspark.sql.datasource import DataSourceStreamReader
    from pyspark.sql.types import _parse_datatype_string

    from snapflow_spark.sources.warc import WARC_SCHEMA_DDL, WarcStreamReader

    schema = _parse_datatype_string(WARC_SCHEMA_DDL)
    r = WarcStreamReader(schema, {"path": str(warc_dir)})
    assert isinstance(r, DataSourceStreamReader)

    files = sorted(glob.glob(str(warc_dir / "*.warc*")))
    start, end = r.initialOffset(), r.latestOffset()
    assert end == {"last": files[-1]}
    parts = r.partitions(start, end)
    assert [p.path for p in parts] == files  # one partition PER file

    it = r.read(parts[0])
    assert inspect.isgenerator(it)  # records stream lazily executor-side
    first = next(it)
    assert len(first) == len(schema.fieldNames())
    assert sum(1 for _ in it) == 4  # the remaining records of file one

    # a committed watermark excludes consumed files from later batches
    parts2 = r.partitions({"last": files[0]}, end)
    assert [p.path for p in parts2] == files[1:]
    # caught-up: empty plan, offset stays monotonic, no error
    assert r.partitions(end, r.latestOffset()) == []


# --- CDX / columnar-index pruning (round 9) --------------------------


def test_prune_files_by_index_matching_forms():
    from snapflow_spark.sources.warc import prune_files_by_index

    files = [
        "/mirror/crawl-data/CC-X/warc/f1.warc.gz",
        "/mirror/crawl-data/CC-X/warc/f2.warc.gz",
        "/mirror/other/f3.warc.gz",
    ]
    # cc-index stores RELATIVE names; basenames and full paths also match
    assert prune_files_by_index(files, {"crawl-data/CC-X/warc/f1.warc.gz"}) == files[:1]
    assert prune_files_by_index(files, {"f2.warc.gz"}) == [files[1]]
    assert prune_files_by_index(files, {files[2]}) == [files[2]]
    assert prune_files_by_index(files, {"nope.warc.gz"}) == []


def test_read_warc_index_prunes_file_partitions(spark, warc_dir):
    from pyspark.sql.types import _parse_datatype_string

    from snapflow_spark.sources.warc import (
        WARC_SCHEMA_DDL,
        WarcBatchReader,
        read_warc,
    )

    idx = spark.createDataFrame([("a.warc",), ("c.warc.gz",)], "warc_filename string")
    got = read_warc(spark, str(warc_dir), index=idx)
    assert {r.warc_file.rsplit("/", 1)[-1] for r in got.select("warc_file").distinct().collect()} == {
        "a.warc", "c.warc.gz"
    }
    # plan-level: the reader's partition list IS the pruned file list —
    # the unlisted file is never opened, not just filtered after read
    reader = WarcBatchReader(
        _parse_datatype_string(WARC_SCHEMA_DDL),
        {"files": f"{warc_dir}/a.warc\n{warc_dir}/c.warc.gz"},
    )
    assert [p.path.rsplit("/", 1)[-1] for p in reader.partitions()] == [
        "a.warc", "c.warc.gz"
    ]


def _write_member_gzip_with_index(path, recs):
    """Member-per-record gzip file + the cc-index rows (relative name,
    offset, length, uri) recorded while writing."""
    import gzip as _gz

    from snapflow_spark.sources.warc import warc_record_bytes

    rows, off = [], 0
    with open(path, "wb") as f:
        for h, payload in recs:
            member = _gz.compress(warc_record_bytes(h, payload), mtime=0)
            rows.append(
                (path.name, off, len(member), h.get("WARC-Target-URI"))
            )
            f.write(member)
            off += len(member)
    return rows


def test_read_warc_ranges_member_gzip(spark, tmp_path):
    from snapflow_spark.sources.warc import read_warc_ranges

    recs = _records()
    rows = _write_member_gzip_with_index(tmp_path / "idx.warc.gz", recs)
    # the filtered index: responses only (rows 2 and 4)
    want = [rows[2], rows[4]]
    idx = spark.createDataFrame(
        want,
        "warc_filename string, warc_record_offset long, "
        "warc_record_length long, url string",
    )
    got = read_warc_ranges(idx, base_path=str(tmp_path)).collect()
    assert len(got) == 2
    by_off = {r.record_offset: r for r in sorted(got, key=lambda r: r.record_offset)}
    for fname, off, ln, url in want:
        r = by_off[off]
        assert r.target_uri == url
        assert r.warc_type == "response"
        assert r.record_index == -1
    # payload byte-exact vs the source records
    assert by_off[want[0][1]].payload == bytes(recs[2][1])


def test_read_warc_ranges_plain_layout_and_mismatch(spark, tmp_path):
    import pytest as _pytest

    from snapflow_spark.sources.warc import (
        WarcFormatError,
        read_warc_ranges,
        warc_record_bytes,
    )

    recs = _records()
    p = tmp_path / "plain.warc"
    rows, off = [], 0
    with open(p, "wb") as f:
        for h, payload in recs:
            blob = warc_record_bytes(h, payload)
            rows.append((str(p), off, len(blob), h.get("WARC-Target-URI")))
            f.write(blob)
            off += len(blob)
    ddl = (
        "warc_filename string, warc_record_offset long, "
        "warc_record_length long, url string"
    )
    idx = spark.createDataFrame([rows[1]], ddl)
    got = read_warc_ranges(idx).collect()
    assert len(got) == 1 and got[0].target_uri == rows[1][3]
    # a wrong length (index/archive mismatch) fails loudly, naming the site
    bad = spark.createDataFrame([(str(p), 5, 40, "x")], ddl)
    with _pytest.raises(Exception, match="plain.warc@5"):
        read_warc_ranges(bad).collect()


def test_import_warc_files_index_pruning(spark, warc_dir, tmp_path):
    from snapflow_spark.incremental.store import SnapshotStore
    from snapflow_spark.sources.warc import import_warc_files

    store = SnapshotStore(str(tmp_path / "wh" / "crawl"))
    idx1 = spark.createDataFrame([("a.warc",)], "warc_filename string")
    r1 = import_warc_files(spark, str(warc_dir), store, index=idx1)
    assert r1.n_pages == 1
    assert [c.rsplit("/", 1)[-1] for c in r1.cursor] == ["a.warc"]
    # widening the index later imports the previously-unlisted file
    idx2 = spark.createDataFrame(
        [("a.warc",), ("b.warc.gz",)], "warc_filename string"
    )
    r2 = import_warc_files(spark, str(warc_dir), store, index=idx2)
    assert r2.n_pages == 1  # only the newly-listed file
    assert [c.rsplit("/", 1)[-1] for c in r2.cursor] == ["a.warc", "b.warc.gz"]
