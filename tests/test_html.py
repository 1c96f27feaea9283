"""HTML → text extraction (functions/html.py): charset resolution
priority, visible-text/title/link extraction semantics, NULL and
adversarial-input safety, the Spark html_extract op, and the
WARC → HTTP split → HTML extract composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from snapflow_spark.functions.html import (
    decode_html_bytes,
    extract_html,
    html_extract,
    html_to_text_expr,
)

PAGE = (
    "<html><head><title> My  Page </title><style>.x{color:red}</style>"
    "<script>var a='<p>not text</p>';</script></head>"
    "<body><h1>Head&amp;line</h1>"
    "<p>first&nbsp;&nbsp;para</p><p>second   para</p>"
    "<ul><li>one</li><li>two</li></ul>"
    "<a href='/rel'>rel link</a> <a href='https://abs.com/x'>abs</a> "
    "<a href='#frag'>skip</a> <a href='javascript:void(0)'>skip</a>"
    "<noscript>enable js</noscript>"
    "inline<br/>after-br</body></html>"
)


def test_extract_semantics():
    title, text, links = extract_html(PAGE, base_url="https://s.com/d/p")
    assert title == "My Page"
    lines = text.split("\n")
    # script/style/noscript content gone, entities decoded, nbsp and
    # space runs collapsed, blocks separated, br breaks
    assert "Head&line" in lines
    assert "first para" in lines and "second para" in lines
    assert "one" in lines and "two" in lines
    # anchors are inline: their texts share a line; <br/> breaks it
    assert "rel link abs" in text and "after-br" in lines
    assert "not text" not in text and "color:red" not in text
    assert "enable js" not in text
    assert links == ["https://s.com/rel", "https://abs.com/x"]


def test_extract_null_and_adversarial():
    assert extract_html(None) == (None, None, None)
    # html.parser is lenient: mangled markup yields best-effort text
    t, text, links = extract_html("<p <p>>broken <b>bold</p> &unknownent; <")
    assert text is not None and "bold" in text


def test_charset_priority_header_beats_meta():
    body = '<meta charset="utf-8"><p>caf\xe9</p>'.encode("latin-1")
    # header says latin-1 -> correct decode even though meta lies
    assert "café" in decode_html_bytes(body, "text/html; charset=ISO-8859-1")
    # without the header the (lying) meta wins -> replacement char
    assert "café" not in decode_html_bytes(body, "text/html")


def test_charset_meta_sniff_and_fallbacks():
    body = '<meta charset="iso-8859-1"><p>na\xefve</p>'.encode("latin-1")
    assert "naïve" in decode_html_bytes(body, None)
    # unknown declared codec -> utf-8 replace, never a raise
    got = decode_html_bytes("ok".encode(), "text/html; charset=not-a-codec")
    assert got == "ok"
    assert decode_html_bytes(None) is None
    # invalid utf-8 bytes replaced
    assert "�" in decode_html_bytes(b"a\xff b")


def test_spark_html_extract(spark):
    rows = [
        (
            1,
            "https://s.com/d/",
            "text/html; charset=ISO-8859-1",
            '<html><title>caf\xe9</title><p>body one</p><a href="x">l</a></html>'
            .encode("latin-1"),
        ),
        (2, "https://t.com/", None,
         b'<meta charset="utf-8"><p>body two</p>'),
        (3, "https://u.com/", "text/html", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, target_uri string, http_content_type string, http_body binary"
    )
    got = {r.doc_id: r for r in html_extract(df).collect()}
    assert got[1].title == "café"
    assert got[1].text == "body one\nl"
    assert got[1].links == ["https://s.com/d/x"]
    assert got[2].text == "body two" and got[2].title is None
    assert got[3].text is None and got[3].links is None
    # original columns survive
    assert set(df.columns) < set(html_extract(df).columns)


def test_spark_html_to_text_expr(spark):
    df = spark.createDataFrame([("<p>a</p><p>b</p>",)], "h string")
    assert df.select(html_to_text_expr("h").alias("t")).first().t == "a\nb"


def test_warc_to_corpus_composition(spark, tmp_path):
    """The full Common Crawl on-ramp: WARC response records →
    http_response_parts → html_extract → a text corpus ready for the
    dedup/quality operators."""
    from snapflow_spark.sources.warc import (
        http_response_parts,
        read_warc,
        write_warc,
    )

    def resp(i, url, html):
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
            + html.encode()
        )
        return (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:uuid:r{i}>",
                "WARC-Target-URI": url,
                "WARC-Date": "2026-08-14T12:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            payload,
        )

    p = str(tmp_path / "pages.warc.gz")
    write_warc(
        p,
        [
            resp(1, "https://a.com/1", "<title>A</title><p>alpha beta</p>"),
            resp(2, "https://b.com/2", "<p>gamma <a href='/n'>delta</a></p>"),
        ],
    )
    corpus = (
        html_extract(http_response_parts(read_warc(spark, p)))
        .where(F.col("http_status") == 200)
        .select("target_uri", "title", "text", "links")
    )
    got = {r.target_uri: r for r in corpus.collect()}
    assert got["https://a.com/1"].title == "A"
    assert got["https://a.com/1"].text == "alpha beta"
    assert got["https://b.com/2"].text == "gamma delta"
    assert got["https://b.com/2"].links == ["https://b.com/n"]


def test_yaml_builtin_html_text_from_warc(spark, tmp_path):
    """core.scan_warc (responses) -> core.html_text (from_http_payload)
    declared entirely in YAML."""
    from snapflow_spark.plans import load_graph
    from snapflow_spark.sources.warc import write_warc

    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        b"<title>Y</title><p>yaml text</p>"
    )
    p = str(tmp_path / "one.warc.gz")
    write_warc(
        p,
        [(
            {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:y1>",
                "WARC-Target-URI": "https://y.com/",
                "WARC-Date": "2026-08-14T12:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            payload,
        )],
    )
    cfg = {
        "warehouse": str(tmp_path / "wh_html"),
        "nodes": [
            {
                "name": "crawl",
                "function": "core.scan_warc",
                "params": {"path": p, "types": "response"},
                "overwrite": True,
            },
            {
                "name": "pages",
                "function": "core.html_text",
                "upstream": {"input": "crawl"},
                "params": {"from_http_payload": True, "body_col": "payload"},
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    assert g.produce(spark) == 2
    rows = g.read(spark, "pages").collect()
    assert len(rows) == 1
    assert rows[0].title == "Y" and rows[0].text == "yaml text"


BOILER_PAGE = (
    "<html><body>"
    "<div><a href='/'>Home</a> | <a href='/news'>News</a> | "
    "<a href='/sport'>Sport</a></div>"
    "<p>This is the actual article paragraph with plenty of prose "
    "content, long enough to clear the block threshold easily.</p>"
    "<p>Short.</p>"
    "<p>A second real paragraph follows here with more than sixty "
    "characters of continuous editorial text, including an inline "
    "<a href='/ref'>reference link</a> under the density cap.</p>"
    "<div><a href='/t1'>tag</a> <a href='/t2'>cloud</a> "
    "<a href='/t3'>links</a></div>"
    "<footer>Copyright 2026 Example Corp. All rights reserved.</footer>"
    "</body></html>"
)


def test_extract_main_text_density_rules():
    from snapflow_spark.functions.html import extract_main_text

    got = extract_main_text(BOILER_PAGE)
    lines = got.split("\n")
    assert len(lines) == 2  # exactly the two prose paragraphs
    assert lines[0].startswith("This is the actual article")
    assert "reference link" in lines[1]  # inline link kept inside prose
    assert "Home" not in got and "tag" not in got  # link-dense chrome out
    assert "Short." not in got  # sub-threshold block out
    assert "rights reserved" not in got  # phrase-marked footer out


def test_extract_main_text_edges():
    from snapflow_spark.functions.html import extract_main_text

    assert extract_main_text(None) is None
    assert extract_main_text("<div><a href='/x'>only links</a></div>") == ""
    # a LONG block quoting a chrome phrase is exempt from the rule
    quote = "<p>" + (
        "The policy document, which among many other provisions "
        "describes the privacy policy obligations of the controller, "
    ) * 3 + "</p>"
    assert "privacy policy" in extract_main_text(quote)


def test_main_text_expr_spark(spark):
    from snapflow_spark.functions.html import main_text_expr

    df = spark.createDataFrame([(BOILER_PAGE,), (None,)], "h string")
    got = [r.t for r in df.select(main_text_expr("h").alias("t")).collect()]
    assert got[0].count("\n") == 1 and got[1] is None


def test_yaml_html_text_main_text_option(spark, tmp_path):
    """core.html_text main_text: true adds the boilerplate-stripped
    column alongside the full extraction."""
    from snapflow_spark.plans import load_graph

    body = (
        "<div><a href='/'>Home</a> | <a href='/x'>News</a> | "
        "<a href='/y'>More</a></div>"
        "<p>Real article prose, definitely long enough to clear the "
        "sixty character block threshold for main content.</p>"
    ).encode()
    df = spark.createDataFrame(
        [("https://m.com/", "text/html; charset=utf-8", body)],
        "target_uri string, http_content_type string, http_body binary",
    )
    cfg = {
        "warehouse": str(tmp_path / "wh_main"),
        "sources": [{"name": "pages"}],
        "nodes": [
            {
                "name": "extracted",
                "function": "core.html_text",
                "upstream": "pages",
                "params": {"main_text": True},
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    g.pipeline.sources["pages"].append(df)
    assert g.produce(spark) == 1
    [row] = g.read(spark, "extracted").collect()
    assert "Home" in row.text  # full extraction keeps nav text
    assert row.main_text.startswith("Real article prose")
    assert "Home" not in row.main_text  # chrome stripped in main_text
