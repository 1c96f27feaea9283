"""Sitemap parsing (sitemaps.org protocol) — the DISCOVERY side of
the crawl frontier, pairing with functions/robots.py's permission
side: robots.txt advertises sitemap URLs, sitemap indexes point at
child sitemaps, and urlsets carry the page URLs with their
lastmod/changefreq/priority hints that frontier schedulers rank by.

Formats handled (all fetched bodies, no network here — the fetch loop
is sources/connectors.py's job):
- XML ``<urlset>`` (namespace-agnostic tag matching — real sitemaps
  appear with and without the protocol namespace, and with vendor
  extensions interleaved),
- XML ``<sitemapindex>`` (child sitemap locs come back as rows with
  ``kind='sitemapindex'`` — the next fetch frontier),
- plain-text sitemaps (one URL per line),
- gzip-wrapped any-of-the-above (the ``.xml.gz`` convention),
- malformed XML degrades to a regex ``<loc>`` salvage (a crawl always
  contains broken markup; the permissive-scan policy of
  read_jsonl_permissive applies — salvage what parses, never fail the
  batch).

Spark shape: one Arrow pass (``parse_sitemaps``) explodes fetched
(url, body) rows into entry rows — map-only, the corpus-scale work
stays in the fetch/dedup stages that already exist (url_dedup,
robots_filter). ``lastmod`` is surfaced both raw and parsed to a
timestamp (W3C datetime, date-only and full forms) so recrawl
scheduling can compare it without re-parsing.
"""

from __future__ import annotations

import gzip
import re
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "parse_robots_sitemaps",
    "parse_sitemap",
    "parse_sitemaps",
    "robots_sitemaps",
]

_LOC_RE = re.compile(rb"<loc>\s*([^<]+?)\s*</loc>", re.IGNORECASE)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _w3c_datetime(value: str | None) -> datetime | None:
    """W3C datetime (YYYY-MM-DD or full ISO with offset/Z) → aware
    UTC datetime; unparseable values → None (the raw string is kept
    alongside)."""
    if not value:
        return None
    v = value.strip()
    try:
        if len(v) == 10:
            return datetime.fromisoformat(v).replace(tzinfo=timezone.utc)
        dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc)
    except ValueError:
        return None


def parse_sitemap(body: bytes | str) -> tuple[str, list[dict]]:
    """One fetched sitemap body → (kind, entries). kind ∈ {'urlset',
    'sitemapindex', 'text'}; entries carry loc / lastmod / changefreq
    / priority (index children: loc + lastmod only). Gzip is
    transparently unwrapped; malformed XML falls back to a regex
    ``<loc>`` salvage tagged as 'urlset'."""
    if isinstance(body, str):
        raw = body.encode("utf-8", "replace")
    else:
        raw = bytes(body)
    if raw[:2] == b"\x1f\x8b":
        try:
            raw = gzip.decompress(raw)
        except OSError:
            return "text", []
    stripped = raw.lstrip()
    if not stripped.startswith(b"<"):
        text = raw.decode("utf-8", "replace")
        entries = [
            {"loc": ln.strip(), "lastmod": None, "changefreq": None,
             "priority": None}
            for ln in text.splitlines()
            if ln.strip() and not ln.lstrip().startswith("#")
        ]
        return "text", entries

    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(raw.decode("utf-8", "replace"))
    except ET.ParseError:
        entries = [
            {"loc": m.group(1).decode("utf-8", "replace"), "lastmod": None,
             "changefreq": None, "priority": None}
            for m in _LOC_RE.finditer(raw)
        ]
        return "urlset", entries
    kind = _localname(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return kind, []
    entries = []
    for child in root:
        if _localname(child.tag) not in ("url", "sitemap"):
            continue
        e: dict = {"loc": None, "lastmod": None, "changefreq": None,
                   "priority": None}
        for f in child:
            name = _localname(f.tag)
            if name in e and f.text is not None:
                e[name] = f.text.strip()
        if e["loc"]:
            entries.append(e)
    return kind, entries


def parse_sitemaps(
    fetched: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
) -> DataFrame:
    """(sitemap_url, kind, loc, lastmod, lastmod_ts, changefreq,
    priority) entry rows from fetched sitemap bodies — one map-only
    Arrow pass. ``kind='sitemapindex'`` rows are the next fetch
    frontier; 'urlset'/'text' rows are page URLs."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, body in zip(pdf[url_col], pdf[body_col]):
                if body is None:
                    continue
                kind, entries = parse_sitemap(body)
                for e in entries:
                    pr = e["priority"]
                    try:
                        pr = float(pr) if pr is not None else None
                    except ValueError:
                        pr = None
                    rows.append(
                        (
                            url, kind, e["loc"], e["lastmod"],
                            _w3c_datetime(e["lastmod"]),
                            e["changefreq"], pr,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "sitemap_url", "kind", "loc", "lastmod", "lastmod_ts",
                    "changefreq", "priority",
                ],
            )

    return fetched.select(url_col, body_col).mapInPandas(
        _parse,
        schema=(
            "sitemap_url string, kind string, loc string, lastmod string, "
            "lastmod_ts timestamp, changefreq string, priority double"
        ),
    )


def parse_robots_sitemaps(body: str) -> list[str]:
    """``Sitemap:`` advertisement URLs out of one robots.txt —
    group-independent per RFC 9309 (they apply to every crawler)."""
    out = []
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        if key.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(host, sitemap_url) discovery rows from per-host robots bodies
    — one Arrow pass; feed the locs to the fetcher, then the fetched
    bodies to ``parse_sitemaps``."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if not isinstance(body, str):
                    continue
                rows.extend((host, u) for u in parse_robots_sitemaps(body))
            yield pd.DataFrame(rows, columns=["host", "sitemap_url"])

    return robots.select(host_col, body_col).mapInPandas(
        _parse, schema="host string, sitemap_url string"
    )
