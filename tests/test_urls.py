"""URL canonicalization & filtering (functions/urls.py): the
normalization contract case-by-case, registered-domain heuristic,
canonical-url dedup, and the C4-style blocklist filter (broadcast
anti-join + phrase rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snapflow_spark.functions.urls import (
    filter_url_blocklist,
    host_expr,
    normalize_url_expr,
    registered_domain_expr,
    url_dedup,
)


def _norm(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.n for r in df.select(normalize_url_expr("url").alias("n")).collect()]


# (input, canonical) — one row per contract clause
NORM_CASES = [
    # 1. trim + fragment
    ("  https://a.com/x#frag  ", "https://a.com/x"),
    # 2. scheme+host lowercase, path/query case KEPT
    ("HTTPS://WWW.Ex.COM/Path/File?Q=Case", "https://ex.com/Path/File?Q=Case"),
    # 3. default ports stripped, non-default kept
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    ("http://a.com:443/x", "http://a.com:443/x"),  # 443 is not http's default
    # 4. www.
    ("https://www.a.com/x", "https://a.com/x"),
    ("https://wwwx.a.com/x", "https://wwwx.a.com/x"),  # only the label 'www.'
    # 5. tracking params out, rest sorted
    (
        "https://a.com/x?b=2&utm_source=f&a=1&fbclid=z&gclid=1&ref=rss",
        "https://a.com/x?a=1&b=2",
    ),
    ("https://a.com/x?utm_campaign=c", "https://a.com/x"),
    ("https://a.com/x?refresh=1", "https://a.com/x?refresh=1"),  # 'ref' ≠ prefix
    ("https://a.com/x?ref", "https://a.com/x"),  # valueless tracking key
    # 6. slash identity
    ("https://a.com", "https://a.com"),
    ("https://a.com/", "https://a.com"),
    ("https://a.com/x/", "https://a.com/x"),
    # non-URL garbage: trimmed + defragmented, not an error
    ("not a url #x", "not a url"),
]


def test_normalization_contract(spark):
    got = _norm(spark, [u for u, _ in NORM_CASES])
    for (inp, want), g in zip(NORM_CASES, got):
        assert g == want, f"{inp!r}: {g!r} != {want!r}"


def test_normalization_null_safe(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(normalize_url_expr("url").alias("n")).first().n is None


@pytest.mark.parametrize(
    "host,want",
    [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("bbc.co.uk", "bbc.co.uk"),
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("deep.shop.example.com.au", "example.com.au"),
        ("example.com:8080", "example.com"),  # port ignored
    ],
)
def test_registered_domain(spark, host, want):
    df = spark.createDataFrame([(host,)], "h string")
    assert df.select(registered_domain_expr("h").alias("d")).first().d == want


def test_url_dedup_collapses_cosmetic_variants(spark):
    variants = [
        (1, "HTTP://WWW.Site.COM:80/a/?b=2&utm_source=x&a=1#frag"),
        (2, "http://site.com/a?a=1&b=2"),
        (3, "http://site.com/a/?utm_campaign=y&b=2&a=1"),
        (4, "http://site.com/other"),
    ]
    df = spark.createDataFrame(variants, "doc_id long, url string")
    got = {r.canonical_url: r for r in url_dedup(df).collect()}
    assert got["http://site.com/a?a=1&b=2"].doc_id == 1
    assert got["http://site.com/a?a=1&b=2"].n_copies == 3
    assert got["http://site.com/other"].n_copies == 1


def test_blocklist_domains_and_phrases(spark):
    rows = [
        (1, "https://news.bbc.co.uk/story"),
        (2, "https://spam.example.com/BUY-now"),
        (3, "https://ok.org/page"),
        (4, "https://sub.deep.badsite.co.uk/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    # literal list -> isin on the registered domain
    kept = filter_url_blocklist(df, domains=["example.com", "badsite.co.uk"])
    assert {r.doc_id for r in kept.collect()} == {1, 3}
    # DataFrame blocklist -> broadcast anti-join, same result + no extra cols
    bl = spark.createDataFrame(
        [("Example.COM",), ("badsite.co.uk",)], "domain string"
    )
    kept2 = filter_url_blocklist(df, domains=bl)
    assert {r.doc_id for r in kept2.collect()} == {1, 3}
    assert kept2.columns == ["doc_id", "url"]
    # phrase rule is case-insensitive substring over the whole URL
    kept3 = filter_url_blocklist(df, phrases=["buy-NOW"])
    assert {r.doc_id for r in kept3.collect()} == {1, 3, 4}


def test_blocklist_plan_is_broadcast(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")], "doc_id long, url string")
    bl = spark.createDataFrame([("a.com",)], "domain string")
    plan = filter_url_blocklist(df, domains=bl)._jdf.queryExecution().executedPlan().toString()
    # broadcast left join + row-local drop flag (NOT a shuffle join);
    # the flag form is what lets the observation count kept/dropped
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert "SortMergeJoin" not in plan


def test_blocklist_observation(spark):
    from pyspark.sql import Observation

    rows = [
        (1, "https://news.bbc.co.uk/story"),
        (2, "https://spam.example.com/x"),
        (3, "https://ok.org/casino-bonus-now"),
        (4, "https://fine.org/page"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("example.com",)], "domain string")
    obs = Observation()
    kept = filter_url_blocklist(
        df, domains=bl, phrases=["casino-bonus"], observation=obs
    )
    assert {r.doc_id for r in kept.collect()} == {1, 4}
    got = obs.get
    assert (got["rows_in"], got["rows_kept"], got["rows_dropped"]) == (4, 2, 2)


def test_host_expr(spark):
    df = spark.createDataFrame(
        [("HTTPS://User.Site.ORG:8443/p?q=1",), ("garbage",)], "url string"
    )
    got = [r.h for r in df.select(host_expr("url").alias("h")).collect()]
    assert got == ["user.site.org:8443", ""]


def test_yaml_builtins_url_filter_then_dedup(spark, tmp_path):
    """core.url_filter -> core.url_dedup compose in a YAML pipeline:
    blocklisted domain dropped, cosmetic URL variants collapsed."""
    from snapflow_spark.plans import load_graph

    df = spark.createDataFrame(
        [
            (1, "HTTP://WWW.Site.COM:80/a/?b=2&utm_source=x&a=1#f"),
            (2, "http://site.com/a?a=1&b=2"),
            (3, "https://spam.example.com/x"),
        ],
        "doc_id long, url string",
    )
    cfg = {
        "warehouse": str(tmp_path / "wh_url"),
        "sources": [{"name": "pages"}],
        "nodes": [
            {
                "name": "clean",
                "function": "core.url_filter",
                "upstream": "pages",
                "params": {"domains": ["example.com"]},
                "overwrite": True,
            },
            {
                "name": "unique",
                "function": "core.url_dedup",
                "upstream": "clean",
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    g.pipeline.sources["pages"].append(df)
    assert g.produce(spark) == 2
    rows = g.read(spark, "unique").collect()
    assert len(rows) == 1
    assert rows[0].canonical_url == "http://site.com/a?a=1&b=2"
    assert (rows[0].doc_id, rows[0].n_copies) == (1, 2)


def test_normalization_idempotent(spark):
    """A canonicalizer must be a projection: running it on its own
    output changes nothing (otherwise dedup keys drift across
    pipeline stages that normalize at different times)."""
    canon = [want for _, want in NORM_CASES]
    df = spark.createDataFrame([(u,) for u in canon], "url string")
    again = [
        r.n for r in df.select(normalize_url_expr("url").alias("n")).collect()
    ]
    assert again == canon


def test_normalization_exhaustive_variant_product(spark):
    """Every combination of cosmetic variations (scheme case × www ×
    default port × param order × tracking params × trailing slash ×
    fragment — 192 URLs) collapses to exactly ONE canonical form per
    content identity; non-default ports stay distinct. One Spark job."""
    import itertools

    schemes = ["https", "HTTPS"]
    wwws = ["", "www."]
    ports = ["", ":443", ":8443"]  # default strips, non-default stays
    param_orders = ["?a=1&b=2", "?b=2&a=1"]
    trackings = ["", "&utm_source=x&fbclid=y"]
    trails = ["", "/"]
    frags = ["", "#frag"]
    urls = [
        f"{sch}://{w}Example.COM{port}/p/x{trail}{params}{trk}{frag}"
        for sch, w, port, params, trk, trail, frag in itertools.product(
            schemes, wwws, ports, param_orders, trackings, trails, frags
        )
    ]
    assert len(urls) == 192
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.n for r in df.select(normalize_url_expr("url").alias("n")).collect()]
    # exactly two canonical identities: default-port family and :8443
    assert set(got) == {
        "https://example.com/p/x?a=1&b=2",
        "https://example.com:8443/p/x?a=1&b=2",
    }
    # and the split is exactly 2:1 (two port variants collapse, one stays)
    assert got.count("https://example.com/p/x?a=1&b=2") == 128
    assert got.count("https://example.com:8443/p/x?a=1&b=2") == 64
