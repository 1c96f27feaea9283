"""WAT metadata (sources/wat.py): envelope generation (codegen
to_json), distributed shard emit, parse-back (codegen from_json with
the partial Common Crawl schema), malformed-payload safety, and the
WAT → link-graph composition that skips HTML entirely."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from snapflow_spark.sources.warc import read_warc, write_warc
from snapflow_spark.sources.wat import (
    parse_wat,
    wat_payload_expr,
    write_wat_shards,
)


def _pages(spark):
    return spark.createDataFrame(
        [
            ("https://a.com/1", "Title A", ["https://b.com/x", "https://c.org/y"]),
            ("https://b.com/2", None, []),
            ("https://c.org/3", "Title C", None),
        ],
        "target_uri string, title string, links array<string>",
    )


def test_envelope_layout(spark):
    """The generated JSON is the documented Common Crawl envelope."""
    j = json.loads(_pages(spark).select(wat_payload_expr().alias("j")).first().j)
    env = j["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == "https://a.com/1"
    html = env["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert html["Head"]["Title"] == "Title A"
    assert html["Links"] == [
        {"path": "A@/href", "url": "https://b.com/x"},
        {"path": "A@/href", "url": "https://c.org/y"},
    ]


def test_wat_round_trip(spark, tmp_path):
    out = str(tmp_path / "wat_out")
    n = write_wat_shards(_pages(spark), out)
    assert n >= 1
    back = parse_wat(read_warc(spark, out))
    got = {r.target_uri: r for r in back.collect()}
    assert got["https://a.com/1"].title == "Title A"
    assert got["https://a.com/1"].links == ["https://b.com/x", "https://c.org/y"]
    assert got["https://b.com/2"].title is None
    assert got["https://b.com/2"].links == []
    assert got["https://c.org/3"].links is None  # null list absent -> null
    assert got["https://c.org/3"].content_type == "application/json"
    assert "payload" not in back.columns


def test_parse_wat_malformed_payload_yields_nulls(spark, tmp_path):
    p = str(tmp_path / "bad.warc.gz")
    write_warc(
        p,
        [
            (
                {"WARC-Type": "metadata", "WARC-Target-URI": "https://x.com/",
                 "Content-Type": "application/json"},
                b"this is not json {",
            ),
            (
                {"WARC-Type": "response", "WARC-Target-URI": "https://y.com/",
                 "Content-Type": "application/http"},
                b"HTTP/1.1 200 OK\r\n\r\nnot metadata",
            ),
        ],
    )
    rows = parse_wat(read_warc(spark, p)).collect()
    assert len(rows) == 1  # non-metadata records filtered
    assert rows[0].target_uri == "https://x.com/"  # header URI survives
    assert rows[0].title is None and rows[0].links is None


def test_wat_to_link_graph(spark, tmp_path):
    """The cheap path: link graph from WAT, no HTML parse anywhere."""
    from snapflow_spark.operators.linkgraph import link_graph_edges, pagerank

    pages = spark.createDataFrame(
        [
            ("https://one.com/p", "t", ["https://two.com/a", "https://two.com/b"]),
            ("https://two.com/q", "t", ["https://one.com/"]),
        ],
        "target_uri string, title string, links array<string>",
    )
    out = str(tmp_path / "wat_lg")
    write_wat_shards(pages, out)
    edges = link_graph_edges(parse_wat(read_warc(spark, out)))
    got = {(r.src, r.dst): r.weight for r in edges.collect()}
    assert got == {("one.com", "two.com"): 2, ("two.com", "one.com"): 1}
    ranks = {r.id: r.rank for r in pagerank(edges, iterations=6).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_parse_wat_plan_is_codegen(spark, tmp_path):
    """No python in the WAT parse path: the plan is scan + project
    (from_json/transform are JVM expressions), no Arrow/python eval."""
    out = str(tmp_path / "wat_plan")
    write_wat_shards(_pages(spark), out)
    plan = (
        parse_wat(read_warc(spark, out))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_yaml_scan_warc_wat_to_pagerank(spark, tmp_path):
    """core.scan_warc (wat: true) -> core.link_graph -> core.pagerank:
    the whole cheap link-graph pipeline declared in YAML."""
    from snapflow_spark.plans import load_graph

    pages = spark.createDataFrame(
        [
            ("https://one.com/p", "t", ["https://two.com/a"]),
            ("https://two.com/q", "t", ["https://one.com/"]),
        ],
        "target_uri string, title string, links array<string>",
    )
    wat_dir = str(tmp_path / "watsrc")
    write_wat_shards(pages, wat_dir)
    cfg = {
        "warehouse": str(tmp_path / "wh_watscan"),
        "nodes": [
            {"name": "meta", "function": "core.scan_warc",
             "params": {"path": wat_dir, "wat": True}, "overwrite": True},
            {"name": "edges", "function": "core.link_graph",
             "upstream": {"input": "meta"}, "overwrite": True},
            {"name": "ranks", "function": "core.pagerank",
             "upstream": {"input": "edges"},
             "params": {"iterations": 6}, "overwrite": True},
        ],
    }
    g = load_graph(cfg)
    assert g.produce(spark) == 3
    ranks = {r.id: r.rank for r in g.read(spark, "ranks").collect()}
    assert set(ranks) == {"one.com", "two.com"}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
