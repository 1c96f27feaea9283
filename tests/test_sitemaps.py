"""Sitemap parsing (functions/sitemaps.py): XML urlset (with and
without namespace), sitemapindex, plain-text and gzip forms, malformed
salvage, W3C lastmod parsing, robots Sitemap discovery, and the
discovery→parse composition."""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

from snapflow_spark.functions.sitemaps import (
    parse_robots_sitemaps,
    parse_sitemap,
    parse_sitemaps,
    robots_sitemaps,
)

NS_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example/p1</loc>
    <lastmod>2026-08-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> https://a.example/p2 </loc>
       <lastmod>2026-08-14T09:30:00+02:00</lastmod></url>
  <url><lastmod>2026-01-01</lastmod></url> <!-- no loc: dropped -->
</urlset>
"""

PLAIN_INDEX = """<sitemapindex>
  <sitemap><loc>https://a.example/s1.xml</loc></sitemap>
  <sitemap><loc>https://a.example/s2.xml.gz</loc>
           <lastmod>2026-07-01</lastmod></sitemap>
</sitemapindex>
"""


def test_urlset_with_namespace():
    kind, entries = parse_sitemap(NS_URLSET)
    assert kind == "urlset"
    assert [e["loc"] for e in entries] == [
        "https://a.example/p1", "https://a.example/p2"
    ]
    assert entries[0]["changefreq"] == "daily"
    assert entries[0]["priority"] == "0.8"


def test_sitemapindex_without_namespace():
    kind, entries = parse_sitemap(PLAIN_INDEX)
    assert kind == "sitemapindex"
    assert [e["loc"] for e in entries] == [
        "https://a.example/s1.xml", "https://a.example/s2.xml.gz"
    ]


def test_text_and_gzip_forms():
    txt = "# comment\nhttps://t.example/a\n\nhttps://t.example/b\n"
    kind, entries = parse_sitemap(txt)
    assert kind == "text"
    assert [e["loc"] for e in entries] == [
        "https://t.example/a", "https://t.example/b"
    ]
    kind, entries = parse_sitemap(gzip.compress(NS_URLSET.encode()))
    assert kind == "urlset" and len(entries) == 2


def test_malformed_xml_salvages_locs():
    broken = "<urlset><url><loc>https://b.example/x</loc></url><url>"
    kind, entries = parse_sitemap(broken)
    assert kind == "urlset"
    assert [e["loc"] for e in entries] == ["https://b.example/x"]


def test_spark_pass_and_lastmod_parsing(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example/sitemap.xml", bytearray(NS_URLSET.encode())),
            ("https://a.example/index.xml", bytearray(PLAIN_INDEX.encode())),
            ("https://a.example/bad", None),
        ],
        "url string, body binary",
    )
    rows = parse_sitemaps(df).collect()
    by_loc = {r.loc: r for r in rows}
    assert len(rows) == 4
    p1 = by_loc["https://a.example/p1"]
    assert p1.kind == "urlset" and p1.priority == 0.8
    assert p1.lastmod == "2026-08-01"
    assert p1.lastmod_ts == datetime(2026, 8, 1, tzinfo=timezone.utc).replace(
        tzinfo=None
    )  # Spark returns naive UTC under the session's UTC timezone
    p2 = by_loc["https://a.example/p2"]
    assert p2.lastmod_ts == datetime(2026, 8, 14, 7, 30)  # +02:00 → UTC
    assert by_loc["https://a.example/s1.xml"].kind == "sitemapindex"


def test_robots_sitemap_discovery_composes(spark):
    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://h.example/sitemap.xml\n"
        "sitemap: https://h.example/extra.xml  # case-insensitive\n"
    )
    assert parse_robots_sitemaps(body) == [
        "https://h.example/sitemap.xml", "https://h.example/extra.xml"
    ]
    robots_df = spark.createDataFrame(
        [("h.example", body)], "host string, robots_txt string"
    )
    disc = robots_sitemaps(robots_df).collect()
    assert {r.sitemap_url for r in disc} == {
        "https://h.example/sitemap.xml", "https://h.example/extra.xml"
    }
    # discovery -> (fetch happens elsewhere) -> parse the fetched body
    fetched = spark.createDataFrame(
        [("https://h.example/sitemap.xml", bytearray(NS_URLSET.encode()))],
        "url string, body binary",
    )
    frontier = parse_sitemaps(fetched).where("kind = 'urlset'")
    assert frontier.count() == 2
