"""Payload format sniffing — magic-byte detection as pure codegen.

A crawl's `Content-Type` header is attacker-controlled and routinely
wrong (HTML served as text/plain, PDFs as octet-stream, gzip double-
wrapped); every real pipeline routes payloads by the BYTES. This is
that router: `sniff_format_expr` reads the first `sniff_bytes` of a
binary column and returns a format label — one whole-stage-codegen
expression (substring compares + a lowercased head scan), no UDF, no
python, so at 100 TB the routing pass is a map-only scan that AQE
never even shuffles.

Labels line up with the engine's own decode families (multimodal/
codec + html/pdf extraction + WARC ingestion), so a typical route is

    payloads.withColumn("fmt", sniff_format_expr("payload"))
    → fmt = 'html' rows to core.html_text
    → fmt = 'pdf'  rows to core.pdf_text
    → fmt = 'gzip' rows decompress first
    → media rows to the multimodal probes/codecs

Detection order matters and is part of the contract: exact binary
magics first (they cannot false-positive on text), then XML/HTML/JSON
textual sniffs over the lowercased head, then the text/binary split
(a NUL byte in the head = 'unknown' binary, else 'plain'). RIFF and
ISO-BMFF resolve their inner brand (WEBP/WAVE/AVI, ftyp→mp4). NULL
payloads label NULL (kept, never silently 'unknown' — a missing
payload is a different fact from an unrecognized one).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: exact-prefix magics, checked in order (label, prefix bytes)
_MAGIC_PREFIXES: list[tuple[str, bytes]] = [
    ("pdf", b"%PDF-"),
    ("png", b"\x89PNG\r\n\x1a\n"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF87a"),
    ("gif", b"GIF89a"),
    ("gzip", b"\x1f\x8b"),
    ("zip", b"PK\x03\x04"),
    ("flac", b"fLaC"),
    ("ogg", b"OggS"),
    ("ebml", b"\x1a\x45\xdf\xa3"),
    ("tiff", b"II*\x00"),
    ("tiff", b"MM\x00*"),
    ("warc", b"WARC/1."),
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sniff_format_expr(payload: Column | str, sniff_bytes: int = 256) -> Column:
    """Format label of a binary payload column by magic bytes — see
    module docstring for the label set and detection order."""
    p = _c(payload)
    head = F.substring(p, 1, sniff_bytes)
    # latin-1 decodes ANY byte sequence 1:1 (no replacement, no
    # errors), so string ops on the head see the raw bytes
    s = F.decode(head, "ISO-8859-1")
    low = F.lower(s)

    def pre(lit: bytes) -> Column:
        return s.startswith(lit.decode("ISO-8859-1"))

    expr = None

    def add(cond: Column, label: str):
        nonlocal expr
        branch = F.when(cond, F.lit(label))
        expr = branch if expr is None else expr.when(cond, F.lit(label))

    for label, magic in _MAGIC_PREFIXES:
        add(pre(magic), label)
    # RIFF containers: brand at offset 8
    brand = F.substring(s, 9, 4)
    add(pre(b"RIFF") & (brand == "WEBP"), "webp")
    add(pre(b"RIFF") & (brand == "WAVE"), "wav")
    add(pre(b"RIFF") & (brand == "AVI "), "avi")
    # ISO-BMFF: 'ftyp' at offset 4 (box size varies)
    add(F.substring(s, 5, 4) == "ftyp", "mp4")
    # BMP: 'BM' + the reserved field (1-indexed bytes 7-10) which the
    # spec fixes at zero — bare 'BM' alone would claim text like
    # "BMW review"
    add(pre(b"BM") & (F.substring(s, 7, 4) == "\x00\x00\x00\x00"), "bmp")
    # textual formats over the lowercased, left-trimmed head.  ltrim
    # only strips spaces; real crawls routinely prefix HTML/JSON with
    # \n or \t, so strip the full whitespace class
    t = F.regexp_replace(low, r"^\s+", "")
    add(t.startswith("<?xml"), "xml")
    add(t.startswith("<!doctype html") | t.startswith("<html"), "html")
    add(
        t.startswith("{") | t.startswith("["),
        "json",
    )
    # an HTML fragment without a doctype: any common opening tag
    add(
        t.startswith("<head") | t.startswith("<body") | t.startswith("<div"),
        "html",
    )
    # text/binary split: a NUL in the head means binary
    add(~low.contains("\x00"), "plain")
    return F.when(p.isNull(), F.lit(None).cast("string")).otherwise(
        expr.otherwise(F.lit("unknown"))
    )
