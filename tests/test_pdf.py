"""PDF text extraction (multimodal/pdf.py): encoder-twin round trips
across filters / object-stream / Type0-font forms, content-operator
handling, crawl-tolerance on torn bytes, and the Spark pdf_extract
surface."""

from __future__ import annotations

import zlib

import pytest

from snapflow_spark.multimodal.pdf import (
    extract_pdf,
    make_pdf_bytes,
    pdf_extract,
)

PAGES = [
    "First line of page one.\nSecond line of page one.",
    "Page two has a single line.",
]


@pytest.mark.parametrize("filt", [None, "flate", "hex", "a85"])
def test_round_trip_filters(filt):
    data = make_pdf_bytes(PAGES, filt=filt)
    title, text, n = extract_pdf(data)
    assert n == 2
    assert text == "\n".join(PAGES)
    assert title is None


def test_round_trip_objstm_with_predictor():
    data = make_pdf_bytes(PAGES, objstm=True, title="Packed")
    assert b"/ObjStm" in data and b"/Predictor 12" in data
    title, text, n = extract_pdf(data)
    assert (title, n) == ("Packed", 2)
    assert text == "\n".join(PAGES)


def test_round_trip_unicode_type0_font():
    pages = ["Ünïcödé — ça va?", "日本語のテキスト。"]
    data = make_pdf_bytes(pages, unicode_font=True, title="Tïtle")
    title, text, n = extract_pdf(data)
    assert n == 2
    assert text == "\n".join(pages)
    assert title == "Tïtle"


def test_winansi_latin1_text():
    pages = ["Café déjà vu, naïve façade."]
    data = make_pdf_bytes(pages, filt="flate")
    _, text, _ = extract_pdf(data)
    assert text == pages[0]


def test_tj_array_kerning_spaces():
    # hand-rolled content stream: TJ with a kerning adjustment beyond
    # -180 inserts a space; smaller ones don't
    content = b"BT /F1 12 Tf [ (Hel) -50 (lo) -300 (world.) ] TJ ET"
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF"
    )
    _, text, n = extract_pdf(body)
    assert n == 1
    assert text == "Hello world."


def test_lying_length_and_literal_escapes():
    content = rb"BT (A \(quoted\) line with \\ and \101 octal.) Tj ET"
    body = (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 99999 >>\nstream\n" + content + b"\nendstream\n"
        b"endobj\ntrailer\n<< /Root 1 0 R >>"
    )
    _, text, _ = extract_pdf(body)
    assert text == r"A (quoted) line with \ and A octal."


def test_inline_image_skipped():
    content = (
        b"BT (before.) Tj ET\n"
        b"BI /W 2 /H 2 /CS /G /BPC 8 ID \x00\xffEI\xff\x00 EI\n"
        b"BT (after.) Tj ET"
    )
    body = (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream\nendobj\n"
    )
    _, text, _ = extract_pdf(body)
    assert text == "before.\nafter."


def test_torn_tree_falls_back_to_page_scan():
    data = make_pdf_bytes(PAGES)
    # sever the catalog: the page-type fallback must still find both
    torn = data.replace(b"/Type /Catalog", b"/Type /Xatalog")
    _, text, n = extract_pdf(torn)
    assert n == 2
    assert text == "\n".join(PAGES)


def test_garbage_and_truncation_never_raise():
    good = make_pdf_bytes(PAGES, filt="flate")
    for data in (
        None,
        b"",
        b"%PDF-1.4 garbage",
        b"\x00" * 256,
        good[: len(good) // 3],
        good[: len(good) // 2],
        good.replace(b"stream", b"strXam"),
        zlib.compress(b"not a pdf"),
    ):
        title, text, n = extract_pdf(data)
        assert title is None or isinstance(title, str)
        assert text is None or isinstance(text, str)


def test_multi_contents_array_and_title_utf16():
    c1, c2 = b"BT (part one.) Tj ET", b"BT (part two.) Tj ET"
    title = "\xfe\xff".encode("latin-1") + "Smart — Title".encode("utf-16-be")
    body = (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [ 4 0 R 5 0 R ] >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(c1)).encode() + b" >>\nstream\n"
        + c1 + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(c2)).encode() + b" >>\nstream\n"
        + c2 + b"\nendstream\nendobj\n"
        b"6 0 obj\n<< /Title (" + title.replace(b"\\", b"\\\\") + b") >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R /Info 6 0 R >>"
    )
    t, text, _ = extract_pdf(body)
    assert text == "part one.\npart two."
    assert t == "Smart — Title"


def test_spark_pdf_extract_parity(spark):
    payloads = [
        make_pdf_bytes(PAGES, filt="flate", title="Doc A"),
        make_pdf_bytes(["Only page."], filt="hex"),
        make_pdf_bytes(["Üni."], unicode_font=True),
        b"not a pdf at all",
        None,
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id int, http_body binary"
    )
    rows = {r.id: r for r in pdf_extract(df).collect()}
    for i, p in enumerate(payloads):
        want = extract_pdf(p)
        got = (rows[i].title, rows[i].text, rows[i].n_pages)
        assert got == want, i
    # map-only plan, like html_extract
    plan = pdf_extract(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_yaml_builtin_pdf_text_from_warc(spark, tmp_path):
    """core.scan_warc (responses) -> core.pdf_text (from_http_payload)
    declared entirely in YAML — the application/pdf route next to
    core.html_text's text/html route."""
    from snapflow_spark.plans import load_graph
    from snapflow_spark.sources.warc import write_warc

    pdf = make_pdf_bytes(["A pdf line."], title="P")
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n" + pdf
    )
    p = str(tmp_path / "one.warc.gz")
    write_warc(
        p,
        [(
            {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:uuid:p1>",
                "WARC-Target-URI": "https://p.com/doc.pdf",
                "WARC-Date": "2026-08-14T12:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            payload,
        )],
    )
    cfg = {
        "warehouse": str(tmp_path / "wh_pdf"),
        "nodes": [
            {
                "name": "crawl",
                "function": "core.scan_warc",
                "params": {"path": p, "types": "response"},
                "overwrite": True,
            },
            {
                "name": "docs",
                "function": "core.pdf_text",
                "upstream": {"input": "crawl"},
                "params": {"from_http_payload": True, "body_col": "payload"},
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    assert g.produce(spark) == 2
    rows = g.read(spark, "docs").collect()
    assert len(rows) == 1
    assert rows[0].title == "P"
    assert rows[0].text == "A pdf line."
    assert rows[0].n_pages == 1
