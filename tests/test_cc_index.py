"""Common Crawl index adapters (sources/cc_index.py): the PUBLIC
columnar-index schema (extra columns, int32 widths, crawl/subset
partitions) and the CDXJ text form both normalize onto the engine's
pruning contracts and drive file pruning (read_warc(index=)) and
record byte-range reads (read_warc_ranges) end-to-end."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F

from snapflow_spark.sources.cc_index import read_cc_cdxj, read_cc_index
from snapflow_spark.sources.warc import (
    read_warc,
    read_warc_ranges,
    warc_record_bytes,
    write_warc,
)


def _rec(uri: str, body: bytes):
    return (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:{abs(hash(uri))}>",
            "WARC-Target-URI": uri,
            "WARC-Date": "2026-08-15T00:00:00Z",
            "Content-Type": "application/http; msgtype=response",
        },
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body,
    )


def _member_gzip(path, recs):
    """Member-per-record gzip WARC + (relative name, offset, length)."""
    rows, off = [], 0
    with open(path, "wb") as f:
        for h, payload in recs:
            member = gzip.compress(warc_record_bytes(h, payload), mtime=0)
            rows.append((path.name, off, len(member)))
            f.write(member)
            off += len(member)
    return rows


@pytest.fixture(scope="module")
def cc_table(spark, tmp_path_factory):
    """A synthetic columnar index in the PUBLIC schema: full column
    set, int32 lengths, partitioned by crawl/subset — plus the two
    member-gzip WARC files its rows point into."""
    root = tmp_path_factory.mktemp("cc")
    recs_a = [_rec(f"https://en.example.com/a{i}", b"A" * (10 + i)) for i in range(3)]
    recs_b = [_rec(f"https://de.beispiel.de/b{i}", b"B" * (10 + i)) for i in range(2)]
    rows_a = _member_gzip(root / "seg-a.warc.gz", recs_a)
    rows_b = _member_gzip(root / "seg-b.warc.gz", recs_b)

    data = []
    for i, (fname, off, ln) in enumerate(rows_a):
        data.append((
            f"com,example,en)/a{i}", f"https://en.example.com/a{i}",
            "en.example.com", "example.com", "com", 200,
            "text/html", "text/html", "eng", f"sha1:{i:040d}",
            fname, off, ln, "1755216000000", "CC-MAIN-2026-33", "warc",
        ))
    for i, (fname, off, ln) in enumerate(rows_b):
        data.append((
            f"de,beispiel,de)/b{i}", f"https://de.beispiel.de/b{i}",
            "de.beispiel.de", "beispiel.de", "de", 200 if i == 0 else 404,
            "text/html" if i == 0 else "text/plain",
            "text/html" if i == 0 else "text/plain",
            "deu", f"sha1:b{i:039d}",
            fname, off, ln, "1755216000001", "CC-MAIN-2026-33", "warc",
        ))
    df = spark.createDataFrame(
        data,
        "url_surtkey string, url string, url_host_name string, "
        "url_host_registered_domain string, url_host_tld string, "
        "fetch_status int, content_mime_type string, "
        "content_mime_detected string, content_languages string, "
        "content_digest string, warc_filename string, "
        "warc_record_offset int, warc_record_length int, "
        "warc_segment string, crawl string, subset string",
    )
    idx_path = str(root / "cc-index")
    df.write.partitionBy("crawl", "subset").parquet(idx_path)
    return root, idx_path


def test_contract_columns_and_type_normalization(spark, cc_table):
    _, idx_path = cc_table
    idx = read_cc_index(spark, idx_path)
    assert idx.count() == 5
    schema = dict(idx.dtypes)
    # the public int32 widths normalize to the contract's long
    assert schema["warc_record_offset"] == "bigint"
    assert schema["warc_record_length"] == "bigint"
    # extra public columns pass through untouched
    assert "url_surtkey" in idx.columns and "crawl" in idx.columns
    # a genuinely wrong table fails loudly
    wrong = str(cc_table[0] / "wrong")
    spark.range(3).write.parquet(wrong)
    with pytest.raises(ValueError, match="not a cc-index"):
        read_cc_index(spark, wrong)


def test_filters_push_down_and_prune(spark, cc_table):
    _, idx_path = cc_table
    idx = read_cc_index(
        spark, idx_path, crawl="CC-MAIN-2026-33", subset="warc",
        status=200, mime="text/html", url_host_suffix="example.com",
        languages="eng",
    )
    rows = idx.collect()
    assert len(rows) == 3 and all("example.com" in r.url for r in rows)
    # crawl/subset + fetch_status reach the scan as pushed filters /
    # partition pruning (PartitionFilters or PushedFilters in the scan)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "fetch_status" in plan
    # host suffix: registered-domain equality OR dotted suffix
    de = read_cc_index(spark, idx_path, url_host_suffix="beispiel.de")
    assert de.count() == 2
    assert read_cc_index(spark, idx_path, status=404).count() == 1
    assert read_cc_index(
        spark, idx_path, where="url LIKE '%/b0'"
    ).count() == 1


def test_index_drives_file_pruning_and_range_reads(spark, cc_table):
    root, idx_path = cc_table
    filtered = read_cc_index(spark, idx_path, url_host_suffix="beispiel.de")
    # file pruning: only seg-b opens
    scan = read_warc(spark, str(root / "*.warc.gz"), index=filtered)
    files = {r.warc_file.rsplit("/", 1)[-1] for r in scan.collect()}
    assert files == {"seg-b.warc.gz"}
    # record range reads: exactly the filtered rows come back,
    # payload byte-exact
    got = read_warc_ranges(filtered, base_path=str(root)).collect()
    assert len(got) == 2
    assert {r.target_uri for r in got} == {
        "https://de.beispiel.de/b0", "https://de.beispiel.de/b1"
    }
    assert all(r.payload.startswith(b"HTTP/1.1") for r in got)


CDXJ_LINES = [
    "com,example)/page1 20260815000000 " + json.dumps({
        "url": "https://example.com/page1", "mime": "text/html",
        "mime-detected": "text/html", "status": "200",
        "digest": "AAAA", "length": "123", "offset": "0",
        "filename": "seg-a.warc.gz", "languages": "eng",
    }),
    "com,example)/page2 20260815000001 " + json.dumps({
        "url": "https://example.com/page2", "mime": "application/pdf",
        "status": "301", "length": "55", "offset": "123",
        "filename": "seg-a.warc.gz",
    }),
    "garbage line with no json payload",
]


def test_cdxj_normalizes_to_contract(spark, tmp_path):
    p = tmp_path / "cdx-00000.gz"
    p.write_bytes(gzip.compress(("\n".join(CDXJ_LINES) + "\n").encode()))
    df = read_cc_cdxj(spark, str(p))
    rows = {r.url_surtkey: r for r in df.collect()}
    assert len(rows) == 2  # the no-json line is dropped at the brace gate
    r1 = rows["com,example)/page1"]
    assert (r1.warc_filename, r1.warc_record_offset, r1.warc_record_length) == (
        "seg-a.warc.gz", 0, 123,
    )
    assert r1.fetch_status == 200 and r1.content_mime_type == "text/html"
    assert r1.fetch_time == "20260815000000"
    assert r1.content_languages == "eng"
    # the filters mirror the columnar form's
    assert read_cc_cdxj(spark, str(p), status=301).count() == 1
    assert read_cc_cdxj(spark, str(p), mime="text/html").count() == 1
    # schema is contract-typed
    dtypes = dict(df.dtypes)
    assert dtypes["warc_record_offset"] == "bigint"
    assert dtypes["fetch_status"] == "int"


def test_cdxj_drives_range_reads_end_to_end(spark, tmp_path):
    recs = [_rec(f"https://x.org/p{i}", b"X" * (20 + i)) for i in range(3)]
    rows = _member_gzip(tmp_path / "x.warc.gz", recs)
    lines = []
    for i, (fname, off, ln) in enumerate(rows):
        lines.append(
            f"org,x)/p{i} 2026081500000{i} " + json.dumps({
                "url": f"https://x.org/p{i}", "mime": "text/html",
                "status": "200", "offset": str(off), "length": str(ln),
                "filename": fname,
            })
        )
    p = tmp_path / "cdx-00001"
    p.write_text("\n".join(lines) + "\n")
    idx = read_cc_cdxj(spark, str(p)).where("url_surtkey LIKE '%p1'")
    got = read_warc_ranges(idx, base_path=str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].target_uri == "https://x.org/p1"
    assert got[0].payload == bytes(recs[1][1])


def test_host_suffix_without_host_columns_fails_loudly(spark, tmp_path):
    """url_host_suffix= on a table with NEITHER host column must raise,
    not silently filter every row against a NULL host (same
    fail-loudly contract as the offset columns)."""
    p = str(tmp_path / "no-host")
    spark.createDataFrame(
        [("u", 0, 10, "f.warc.gz")],
        "url string, warc_record_offset int, warc_record_length int, "
        "warc_filename string",
    ).write.parquet(p)
    with pytest.raises(ValueError, match="neither"):
        read_cc_index(spark, p, url_host_suffix="example.com")
