"""robots.txt (functions/robots.py): RFC 9309 parser semantics,
pattern→LIKE compilation, Spark join+LIKE+max decisions vs the python
reference over a generated matrix, audit flag form, and the
WARC-shaped composition."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from snapflow_spark.functions.robots import (
    filter_robots_disallowed,
    parse_robots_rules,
    parse_robots_txt,
    robots_allowed_py,
    robots_pattern_to_like,
)

ROBOTS = """\
# global group
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /tmp*.html$

Disallow: /after-blank
User-agent: samplebot
User-agent: otherbot
Disallow: /
Allow: /blog/
Sitemap: https://site.com/map.xml
Disallow: /after-sitemap
"""


def test_group_parsing_semantics():
    star = parse_robots_txt(ROBOTS, "SomeCrawler/1.0")
    # the blank line does NOT close the group: /after-blank belongs to *
    assert (False, "/after-blank") in star
    assert (True, "/private/ok") in star
    assert (False, "/tmp*.html$") in star
    # a UA-run applies rules to ALL its tokens; non-rule lines end the
    # run but not the group, so /after-sitemap is still samplebot's
    bot = parse_robots_txt(ROBOTS, "Mozilla compatible SampleBot/2")
    assert (False, "/") in bot and (True, "/blog/") in bot
    assert (False, "/after-sitemap") in bot
    other = parse_robots_txt(ROBOTS, "OtherBot")
    assert other == bot
    # specific token beats *, case-insensitively; unknown UA gets *
    assert parse_robots_txt(ROBOTS, "zzz") == star


def test_parse_edge_cases():
    # rules before any user-agent line are ignored
    assert parse_robots_txt("Disallow: /x\nUser-agent: *\nAllow: /a", "u") == [
        (True, "/a")
    ]
    # empty Disallow allows everything (rule dropped)
    assert parse_robots_txt("User-agent: *\nDisallow:", "u") == []
    # no robots content at all -> no rules -> allowed
    assert robots_allowed_py([], "/anything")
    # longest UA token wins among several matches
    body = (
        "User-agent: bot\nDisallow: /a\n"
        "User-agent: samplebot\nDisallow: /b\n"
    )
    assert parse_robots_txt(body, "my samplebot v1") == [(False, "/b")]


def test_pattern_to_like():
    assert robots_pattern_to_like("/a/*.html$") == "/a/%.html"
    assert robots_pattern_to_like("/a/") == "/a/%"
    assert robots_pattern_to_like("/100%_sure") == "/100\\%\\_sure%"
    assert robots_pattern_to_like("/b\\c") == "/b\\\\c%"


def test_longest_match_and_allow_ties():
    rules = [(False, "/p/"), (True, "/p/ok"), (False, "/p/ok$")]
    assert not robots_allowed_py(rules, "/p/x")
    assert robots_allowed_py(rules, "/p/okay")  # Allow /p/ok longer
    # exact-length tie at /p/ok: Allow wins over the anchored Disallow?
    # lengths: '/p/ok' = 5, '/p/ok$' = 6 -> the anchored rule is longer
    assert not robots_allowed_py(rules, "/p/ok")


@pytest.fixture(scope="module")
def matrix(spark):
    """Randomized rule sets + paths; Spark decisions must equal the
    python reference row-for-row."""
    rng = random.Random(7)
    seg = ["a", "b", "cc", "dd", "img", "x1"]
    hosts, bodies, rules_by_host = [], [], {}
    for h in range(12):
        host = f"h{h}.example"
        lines = ["User-agent: *"]
        rules = []
        for _ in range(rng.randint(1, 6)):
            pat = "/" + "/".join(rng.sample(seg, rng.randint(1, 2)))
            if rng.random() < 0.3:
                pat += "*" + rng.choice(seg)
            if rng.random() < 0.3:
                pat += "$"
            allow = rng.random() < 0.4
            lines.append(("Allow: " if allow else "Disallow: ") + pat)
            rules.append((allow, pat))
        hosts.append(host)
        bodies.append("\n".join(lines))
        rules_by_host[host] = rules
    urls = []
    for i in range(300):
        host = rng.choice([*hosts, "norobots.example"])
        path = "/" + "/".join(rng.choices(seg, k=rng.randint(1, 3)))
        if rng.random() < 0.2:
            path += rng.choice(["", "/", ".html"])
        urls.append((i, f"https://{host}{path}", host, path))
    robots_df = spark.createDataFrame(
        list(zip(hosts, bodies)), "host string, robots_txt string"
    )
    urls_df = spark.createDataFrame(
        [(i, u) for i, u, _, _ in urls], "doc_id long, url string"
    )
    return robots_df, urls_df, urls, rules_by_host


def test_spark_decisions_match_reference(spark, matrix):
    robots_df, urls_df, urls, rules_by_host = matrix
    rules = parse_robots_rules(robots_df)
    flagged = filter_robots_disallowed(
        urls_df, rules, keep_flag="crawl_ok"
    )
    got = {r.doc_id: r.crawl_ok for r in flagged.collect()}
    assert len(got) == len(urls)
    for i, _, host, path in urls:
        want = robots_allowed_py(rules_by_host.get(host, []), path)
        assert got[i] == want, (i, host, path)
    # the filtering form keeps exactly the allowed rows
    kept = {r.doc_id for r in filter_robots_disallowed(urls_df, rules).collect()}
    assert kept == {i for i, v in got.items() if v}


def test_query_string_matches_and_no_python_in_match_plan(spark):
    robots_df = spark.createDataFrame(
        [("q.example", "User-agent: *\nDisallow: /s?*sort=")],
        "host string, robots_txt string",
    )
    rules = parse_robots_rules(robots_df)
    urls = spark.createDataFrame(
        [(1, "https://q.example/s?a=1&sort=x"), (2, "https://q.example/s?a=1")],
        "doc_id long, url string",
    )
    kept = filter_robots_disallowed(urls, rules)
    assert [r.doc_id for r in kept.collect()] == [2]
    # rules parsing is the one Arrow pass; the match side is join+LIKE
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert plan.count("EvalPython") <= 1  # only the rules-parse pass


def test_warc_shaped_composition(spark):
    """The CC shape: robots bodies as HTTP response payloads keyed by
    target_uri -> host_expr + decode -> rules -> filter."""
    from snapflow_spark.functions.urls import host_expr

    payload = "User-agent: *\nDisallow: /secret/"
    pages = spark.createDataFrame(
        [("https://w.example/robots.txt", bytearray(payload.encode()))],
        "target_uri string, http_body binary",
    )
    robots_df = pages.select(
        host_expr("target_uri").alias("host"),
        F.decode("http_body", "UTF-8").alias("robots_txt"),
    )
    rules = parse_robots_rules(robots_df)
    urls = spark.createDataFrame(
        [(1, "https://w.example/secret/x"), (2, "https://w.example/pub")],
        "doc_id long, url string",
    )
    assert [r.doc_id for r in filter_robots_disallowed(urls, rules).collect()] == [2]


def test_yaml_builtin_two_input(spark):
    from snapflow_spark.plans.yaml_config import BUILTINS

    robots_df = spark.createDataFrame(
        [("y.example", "User-agent: *\nDisallow: /no/")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "https://y.example/no/x"), (2, "https://y.example/yes")],
        "doc_id long, url string",
    )
    out = BUILTINS["core.robots_filter"](spark, urls, robots=robots_df)
    assert [r.doc_id for r in out.collect()] == [2]
    audited = BUILTINS["core.robots_filter"](
        spark, urls, robots=robots_df, keep_flag="crawl_ok"
    )
    assert {r.doc_id: r.crawl_ok for r in audited.collect()} == {1: False, 2: True}


def test_default_ports_match_bare_host_rules(spark):
    robots_df = spark.createDataFrame(
        [("p.example", "User-agent: *\nDisallow: /no/")],
        "host string, robots_txt string",
    )
    rules = parse_robots_rules(robots_df)
    urls = spark.createDataFrame(
        [
            (1, "https://p.example:443/no/x"),  # default port: same origin
            (2, "http://p.example:80/no/x"),
            (3, "https://p.example:8443/no/x"),  # NON-default: distinct
            (4, "https://p.example:443/ok"),
        ],
        "doc_id long, url string",
    )
    kept = sorted(r.doc_id for r in filter_robots_disallowed(urls, rules).collect())
    assert kept == [3, 4]
