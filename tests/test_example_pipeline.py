"""examples/cc_pipeline.yaml — the shipped end-to-end crawl-curation
config: incremental WARC ingest → HTML/main-text extraction → URL
filter/dedup → link-graph authority → line dedup → split, every stage
a core.* builtin. The test synthesizes a two-file crawl with planted
spam, duplicate URLs and a cross-doc duplicate line, runs produce()
twice (incremental no-op), drops a third file and produces again."""

from __future__ import annotations

from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _resp(url, html):
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + html.encode()
    )
    return (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:{abs(hash(url))}>",
            "WARC-Target-URI": url,
            "WARC-Date": "2026-08-14T12:00:00Z",
            "Content-Type": "application/http; msgtype=response",
        },
        payload,
    )


def _pdf_resp(url, page_text):
    """A PDF response whose Content-Type LIES (octet-stream): the
    pipeline's magic-byte router must classify it by bytes."""
    from snapflow_spark.multimodal.pdf import make_pdf_bytes

    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n\r\n"
        + make_pdf_bytes([page_text])
    )
    return (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:{abs(hash(url))}>",
            "WARC-Target-URI": url,
            "WARC-Date": "2026-08-14T12:00:00Z",
            "Content-Type": "application/http; msgtype=response",
        },
        payload,
    )


ARTICLE = (
    "<div><a href='/'>Home</a> | <a href='/about'>About</a></div>"
    "<p>{body} This sentence pads the paragraph well past the sixty "
    "character main-content threshold for the extractor.</p>"
    "<p>Shared boilerplate line that appears in every single page of "
    "this site and should be line-deduplicated away eventually.</p>"
    "<a href='{link}'>next</a>"
    "<footer>Copyright 2026. All rights reserved.</footer>"
)


def _make_warc(path, records):
    from snapflow_spark.sources.warc import write_warc

    write_warc(str(path), records)


@pytest.fixture()
def crawl_dir(tmp_path):
    d = tmp_path / "drop"
    d.mkdir()
    _make_warc(
        d / "batch1.warc.gz",
        [
            _resp(
                "https://news.example/a",
                ARTICLE.format(body="Alpha article prose.",
                               link="https://blog.example/x"),
            ),
            # same page behind a tracking URL -> url_dedup collapses
            _resp(
                "https://news.example/a?utm_source=feed",
                ARTICLE.format(body="Alpha article prose.",
                               link="https://blog.example/x"),
            ),
            _resp(
                "https://spam-mill.example/buy",
                ARTICLE.format(body="Spam spam casino-bonus.",
                               link="https://news.example/a"),
            ),
        ],
    )
    _make_warc(
        d / "batch2.warc.gz",
        [
            _resp(
                "https://blog.example/x",
                ARTICLE.format(body="Beta article prose entirely different.",
                               link="https://news.example/a"),
            ),
            # served with a LYING octet-stream header: only magic-byte
            # routing gets this to the PDF extractor
            _pdf_resp(
                "https://docs.example/report.pdf",
                "Delta report prose arrives inside of a portable document "
                "and it should survive all of the downstream text gates "
                "with room to spare. The report body reads like prose.",
            ),
        ],
    )
    return d


def test_cc_pipeline_end_to_end(spark, tmp_path, crawl_dir):
    import yaml

    from snapflow_spark.plans import load_graph

    text = (REPO / "examples" / "cc_pipeline.yaml").read_text()
    cfg = yaml.safe_load(
        text.replace("{WARC_DIR}", str(crawl_dir)).replace(
            "{WAREHOUSE}", str(tmp_path / "wh")
        )
    )
    g = load_graph(cfg)
    assert g.produce(spark) > 0

    def latest(name):
        # overwrite-nodes hold exactly one (current) snapshot
        return g.read(spark, name).collect()

    # spam domain + phrase filtered before anything else counts;
    # the sniffer labeled every kept row by its BYTES
    clean = g.read(spark, "clean").collect()
    assert all("spam-mill" not in r.target_uri for r in clean)
    assert len(clean) == 4  # 2x news (tracking variant) + 1 blog + 1 pdf
    fmts = {r.target_uri: r.format for r in clean}
    assert fmts["https://docs.example/report.pdf"] == "pdf"  # header lied
    assert fmts["https://blog.example/x"] == "html"

    # canonical-url dedup collapses the tracking variant
    uniq = latest("unique_urls")
    assert len(uniq) == 3
    by_url = {r.canonical_url: r.n_copies for r in uniq}
    assert by_url["https://news.example/a"] == 2

    # authority over the 2-domain link cycle sums to 1
    ranks = {r.id: r.rank for r in latest("authority")}
    assert set(ranks) == {"news.example", "blog.example"}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9

    # main_text made it into docs; chrome did not; the byte-routed
    # PDF branch converged into the same corpus schema
    docs = {r.url: r.text for r in g.read(spark, "docs").collect()}
    assert any("Alpha article prose" in t for t in docs.values())
    assert all("Home" not in t and "rights reserved" not in t
               for t in docs.values())
    assert "Delta report prose" in docs["https://docs.example/report.pdf"]

    # cross-doc line dedup keeps the shared boilerplate line ONCE
    # the Gopher gate (relaxed word floor for the tiny demo corpus)
    # keeps every real article — nothing here trips the repetition or
    # shape rules, so the battery must not eat the corpus silently
    assert len(g.read(spark, "quality_docs").collect()) == len(
        g.read(spark, "docs").collect()
    )

    dd = latest("split")
    boiler_hits = sum(
        1 for r in dd if "Shared boilerplate line" in (r.text or "")
    )
    assert boiler_hits == 1
    assert {r.split for r in dd} <= {"train", "test"}

    # the INCREMENTAL data card: per-batch partial rows accumulated
    # from deltas, report rolled up from partials alone — doc count
    # matches the full docs corpus without any re-profiling scan
    card = latest("datacard")
    assert len(card) == 1
    assert card[0].n_docs == len(g.read(spark, "docs").collect())
    assert card[0].n_tokens > 0 and 0.0 <= card[0].dup_rate <= 1.0

    # incremental: nothing new -> no-op produce
    assert g.produce(spark) == 0

    # a third file arrives; only it is ingested, downstream recomputes
    _make_warc(
        crawl_dir / "batch3.warc.gz",
        [_resp("https://late.example/z",
               ARTICLE.format(body="Gamma article prose arrives late.",
                              link="https://news.example/a"))],
    )
    assert g.produce(spark) > 0
    assert len(latest("unique_urls")) == 4
