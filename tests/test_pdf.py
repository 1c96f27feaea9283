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
    title, text, n, _enc = extract_pdf(data)
    assert n == 2
    assert text == "\n".join(PAGES)
    assert title is None


def test_round_trip_objstm_with_predictor():
    data = make_pdf_bytes(PAGES, objstm=True, title="Packed")
    assert b"/ObjStm" in data and b"/Predictor 12" in data
    title, text, n, _enc = extract_pdf(data)
    assert (title, n) == ("Packed", 2)
    assert text == "\n".join(PAGES)


def test_round_trip_unicode_type0_font():
    pages = ["Ünïcödé — ça va?", "日本語のテキスト。"]
    data = make_pdf_bytes(pages, unicode_font=True, title="Tïtle")
    title, text, n, _enc = extract_pdf(data)
    assert n == 2
    assert text == "\n".join(pages)
    assert title == "Tïtle"


def test_winansi_latin1_text():
    pages = ["Café déjà vu, naïve façade."]
    data = make_pdf_bytes(pages, filt="flate")
    _, text, _, _enc = extract_pdf(data)
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
    _, text, n, _enc = extract_pdf(body)
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
    _, text, _, _enc = extract_pdf(body)
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
    _, text, _, _enc = extract_pdf(body)
    assert text == "before.\nafter."


def test_torn_tree_falls_back_to_page_scan():
    data = make_pdf_bytes(PAGES)
    # sever the catalog: the page-type fallback must still find both
    torn = data.replace(b"/Type /Catalog", b"/Type /Xatalog")
    _, text, n, _enc = extract_pdf(torn)
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
        title, text, n, _enc = extract_pdf(data)
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
    t, text, _, _enc = extract_pdf(body)
    assert text == "part one.\npart two."
    assert t == "Smart — Title"


def test_spark_pdf_extract_parity(spark):
    payloads = [
        make_pdf_bytes(PAGES, filt="flate", title="Doc A"),
        make_pdf_bytes(["Only page."], filt="hex"),
        make_pdf_bytes(["Üni."], unicode_font=True),
        make_pdf_bytes(["AES page."], encrypt="aes-128", title="Locked?"),
        make_pdf_bytes(["no entry"], encrypt="rc4-128", user_password=b"pw"),
        b"not a pdf at all",
        None,
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id int, http_body binary"
    )
    rows = {r.id: r for r in pdf_extract(df).collect()}
    for i, p in enumerate(payloads):
        want = extract_pdf(p)
        got = (rows[i].title, rows[i].text, rows[i].n_pages, rows[i].encrypted)
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


# --- encryption (ISO 32000 §7.6 standard security handler) -------------


def test_crypto_primitives_match_published_vectors():
    """FIPS 197 Appendix C block vectors (all three key sizes, both
    directions) and the canonical RC4 vectors — the primitives under
    every decrypt below."""
    from snapflow_spark.multimodal.pdf_crypt import (
        _decrypt_block,
        _encrypt_block,
        _expand_key,
        aes_cbc_decrypt,
        aes_cbc_encrypt,
        rc4,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    want = {
        16: "69c4e0d86a7b0430d8cdb78070b4c55a",
        24: "dda97ca4864cdfe06eaf70a0ec0d7191",
        32: "8ea2b7ca516745bfeafc49904b496089",
    }
    for klen, ct in want.items():
        rks = _expand_key(bytes(range(klen)))
        assert _encrypt_block(pt, rks).hex() == ct
        assert _decrypt_block(bytes.fromhex(ct), rks) == pt
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    key, iv = bytes(range(16)), bytes(16)
    msg = b"odd-length message for CBC padding round trip!"
    assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, msg)) == msg
    # garbage tolerance: short/unaligned ciphertext never raises
    assert aes_cbc_decrypt(key, iv, b"short") == b""


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aes-128", "aes-256"])
def test_empty_user_password_decrypts_transparently(mode):
    """The crawl case: standard-handler files with an EMPTY user
    password (R2/R3/R4-AESV2/R6-AESV3) yield title AND text — strings
    and streams both decrypt — with encrypted=True as the provenance
    flag."""
    data = make_pdf_bytes(
        PAGES, title="Protected Report", encrypt=mode
    )
    title, text, n, enc = extract_pdf(data)
    assert enc is True
    assert title == "Protected Report"
    assert text == "\n".join(PAGES)
    assert n == len(PAGES)


@pytest.mark.parametrize("mode", ["rc4-128", "aes-128", "aes-256"])
def test_real_user_password_flags_not_garbage(mode):
    """A real user password can't be guessed: NULL text + the
    encrypted flag (the triage signal), never keystream garbage."""
    data = make_pdf_bytes(
        ["do not leak"], encrypt=mode, user_password=b"hunter2"
    )
    assert extract_pdf(data) == (None, None, None, True)


def test_owner_password_only_still_opens():
    """Owner-locked files (non-empty OWNER password, empty user
    password) open without credentials — the single most common
    encrypted form in crawls."""
    data = make_pdf_bytes(
        ["copy-restricted but readable"],
        encrypt="aes-128",
        owner_password=b"admin-secret",
    )
    title, text, n, enc = extract_pdf(data)
    assert text == "copy-restricted but readable" and enc is True


def test_encrypted_flag_is_false_for_plain_files():
    _, _, _, enc = extract_pdf(make_pdf_bytes(["plain"]))
    assert enc is False


def test_encrypted_garbage_stays_total():
    """Truncation/corruption of an encrypted file never raises."""
    data = make_pdf_bytes(PAGES, encrypt="aes-128")
    for cut in (len(data) // 3, len(data) // 2, len(data) - 40):
        out = extract_pdf(data[:cut] + b"\xde\xad" * 8)
        assert len(out) == 4  # total, shape stable


def test_unsupported_encrypt_v_is_locked_not_passthrough():
    """An /Encrypt dict with an unsupported V (e.g. the unpublished
    V=3) must report locked — Identity pass-through would emit
    ciphertext garbage as 'extracted text'."""
    from snapflow_spark.multimodal.pdf_crypt import PdfCrypt

    enc = {"V": 3, "R": 3, "Length": 128, "O": b"\x00" * 32,
           "U": b"\x00" * 32, "P": -44}
    crypt = PdfCrypt(enc, b"\x01" * 16)
    assert crypt.authenticate(b"") is False
    assert crypt.ok is False
