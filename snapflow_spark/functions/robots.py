"""robots.txt (RFC 9309) — parse per-host robots files and filter a
URL set by crawl permission, the step between URL hygiene
(functions/urls.py) and fetching/keeping a page that every polite
crawl pipeline runs. Common Crawl archives robots.txt responses in
dedicated WARC files, so the input shape here is exactly what
``read_warc`` + ``http_response_parts`` already produce: one (host,
robots-body) row per site.

RFC 9309 semantics implemented (and pinned by tests):
- Groups: consecutive ``User-agent`` lines open a group; rules that
  follow apply to all of them. Blank lines do NOT close a group (a
  common parser bug); only a new ``User-agent`` run after rules does.
- Group selection: the most specific matching user-agent (longest
  case-insensitive product-token match), ``*`` as fallback; ALL
  groups for the selected token merge.
- Rule matching: longest-pattern match wins; on a length tie
  ``Allow`` wins. Patterns support ``*`` wildcards and the ``$``
  end anchor. An empty ``Disallow:`` value allows everything (it is
  ignored). No matching rule, or no robots.txt for the host at all,
  means ALLOWED — the RFC default.
- Deliberately NOT handled (documented): percent-encoding
  equivalence between rule and path (both sides are matched as the
  bytes they arrived as — same policy as normalize_url_expr),
  ``Crawl-delay`` (non-standard).

Spark shape — robots matching is a JOIN problem, not a UDF problem:
1. ``parse_robots_rules`` — one Arrow pass over (host, body) rows
   explodes each file into (host, allow, like_pattern, plen) RULE
   rows; the robots pattern is compiled ONCE here into a SQL LIKE
   pattern (``*`` → ``%``, specials escaped, ``$`` drops the
   implicit trailing ``%``), so the match side stays codegen.
2. ``filter_robots_disallowed`` — urls join rules on host (plain
   hash join keyed on host — millions of hosts shard fine, AQE
   splits hot hosts), one ``LIKE`` per candidate rule, then ONE
   groupBy(url) taking ``max(struct(plen, allow))`` implements
   longest-match-allow-wins exactly; a left join back marks rows
   with no rules/robots as allowed. Two keyed shuffles total, no
   python in the match path.

At 100 TB: |rules| ≈ hosts × rules-per-host — typically millions of
rows (MBs), broadcastable; the code leaves the join strategy to
Catalyst/AQE so a pathological rules table degrades to a shuffle
join instead of an OOM.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "filter_robots_disallowed",
    "parse_robots_rules",
    "parse_robots_txt",
    "robots_allowed_py",
    "robots_pattern_to_like",
]


def parse_robots_txt(
    body: str, user_agent: str
) -> list[tuple[bool, str]]:
    """RFC 9309 parse of ONE robots.txt for one crawler: returns the
    merged (allow, pattern) rules of the most specific matching
    user-agent group ('*' fallback; [] when nothing matches — which
    means allowed)."""
    ua = user_agent.lower()
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] | None = None
    last_was_ua = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            tok = value.lower()
            if last_was_ua and current is not None:
                current.append(tok)
            else:
                current = [tok]
            groups.setdefault(tok, [])
            last_was_ua = True
        elif key in ("allow", "disallow"):
            last_was_ua = False
            if current is None:
                continue  # rules before any user-agent line: ignored
            if not value:
                continue  # empty Disallow/Allow allows everything
            for tok in current:
                groups.setdefault(tok, []).append((key == "allow", value))
        else:
            last_was_ua = False  # sitemap/crawl-delay etc. end a UA run
    best: str | None = None
    for tok in groups:
        if tok != "*" and tok in ua and (best is None or len(tok) > len(best)):
            best = tok
    if best is not None:
        return groups[best]
    return groups.get("*", [])


def robots_pattern_to_like(pattern: str) -> str:
    """Compile a robots path pattern to a SQL LIKE pattern (escape
    char ``\\``): ``*`` → ``%``, LIKE specials escaped, a trailing
    ``$`` anchors the end (no implicit trailing ``%``)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    if not anchored:
        out.append("%")
    return "".join(out)


def robots_allowed_py(rules: list[tuple[bool, str]], path: str) -> bool:
    """Pure-python twin of the join+LIKE+max decision (tests, driver
    use): longest matching pattern wins, allow wins length ties,
    no match = allowed."""
    import re

    best: tuple[int, int] | None = None
    for allow, pattern in rules:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
        rx = "^" + rx + ("$" if anchored else "")
        if re.match(rx, path):
            key = (len(pattern), 1 if allow else 0)
            if best is None or key > best:
                best = key
    return True if best is None else best[1] == 1


def parse_robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """(host, allow, like_pattern, plen) rule rows from per-host
    robots bodies — one Arrow pass, the pattern compiled to LIKE here
    so matching stays codegen. Hosts whose robots yields no rules for
    this crawler emit nothing (no rules = allowed)."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, allows, likes, plens = [], [], [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if not isinstance(body, str):
                    continue
                for allow, pattern in parse_robots_txt(body, user_agent):
                    hosts.append(host)
                    allows.append(allow)
                    likes.append(robots_pattern_to_like(pattern))
                    plens.append(len(pattern))
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype="object"),
                    "allow": pd.Series(allows, dtype="bool"),
                    "like_pattern": pd.Series(likes, dtype="object"),
                    "plen": pd.Series(plens, dtype="int32"),
                }
            )

    return robots.select(host_col, body_col).mapInPandas(
        _parse,
        schema="host string, allow boolean, like_pattern string, plen int",
    )


def _path_expr(url: Column) -> Column:
    """path[?query] of an absolute URL, '/' when empty — robots rules
    match the full request target, query string included."""
    p = F.regexp_extract(url, r"^[^:/?#]+://[^/?#]+([^#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def filter_robots_disallowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    keep_flag: str | None = None,
) -> DataFrame:
    """Drop URLs a matching robots rule disallows (RFC 9309 winner:
    longest pattern, allow on ties; unmatched/ruleless hosts pass).
    ``rules`` is parse_robots_rules' output. With ``keep_flag`` the
    rows come back unfiltered carrying a boolean column instead (the
    audit form). Plan: urls⋈rules on host + LIKE + one groupBy(url)
    max(struct(plen, allow)) + left join back — module doc."""
    from snapflow_spark.functions.urls import host_expr

    # default ports are the same origin as the bare host (robots
    # scope is the origin): https://h:443/x must match h's rules
    scheme = F.lower(
        F.regexp_extract(F.trim(F.col(url_col)), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = host_expr(F.col(url_col))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    u = urls.withColumn("__rb_host", host)
    # the LIKE with a per-row pattern + escape goes through expr():
    # Column.like takes only literal patterns
    cand = (
        u.select(F.col(url_col).alias("__rb_url"), "__rb_host")
        .withColumn("__rb_path", _path_expr(F.col("__rb_url")))
        .join(rules, F.col("__rb_host") == rules[host_col], "inner")
        .where(F.expr("__rb_path LIKE like_pattern ESCAPE '\\\\'"))
    )
    winner = cand.groupBy("__rb_url").agg(
        F.max(
            F.struct(
                F.col("plen").alias("plen"),
                F.col("allow").cast("int").alias("allow"),
            )
        ).alias("__rb_win")
    )
    out = u.join(
        winner, u[url_col] == winner["__rb_url"], "left"
    ).withColumn(
        "__rb_allowed",
        F.coalesce(F.col("__rb_win.allow") == 1, F.lit(True)),
    )
    if keep_flag is not None:
        return out.withColumnRenamed("__rb_allowed", keep_flag).drop(
            "__rb_host", "__rb_url", "__rb_win"
        )
    return out.where(F.col("__rb_allowed")).drop(
        "__rb_host", "__rb_url", "__rb_win", "__rb_allowed"
    )
