"""HTML → text extraction (the WET-production step) — stdlib
``html.parser`` in an Arrow-batched pandas UDF.

Between a WARC ``response`` record's ``http_body`` (sources/warc.py)
and every text operator in this engine (dedup, quality, tokenize)
sits exactly one step: decode the bytes with the right charset and
strip the markup. This module is that step, built only on the
standard library (``html.parser`` is a real, lenient, event-driven
HTML tokenizer — the same approach WET extraction uses, minus
readability heuristics):

- ``decode_html_bytes`` — charset resolution in the documented
  priority order: HTTP ``Content-Type`` charset param, then a
  ``<meta charset>`` / http-equiv sniff over the head bytes, then
  UTF-8; always with U+FFFD replacement (crawled pages lie about
  their encodings).
- ``_HtmlTextParser`` — drops ``script``/``style``/``noscript``/
  ``template``/head metadata, emits newlines at block boundaries,
  captures ``<title>`` and ``<a href>`` links (resolved against a
  base URL with ``urllib.parse.urljoin``), unescapes entities
  (``convert_charrefs``), collapses whitespace.
- ``html_extract`` — the DataFrame op: one parse per document inside
  ONE pandas UDF returning ``struct<title, text, links>`` — title,
  visible text and the outlink list all come from a single pass, and
  the struct materializes once (the field reads are free codegen
  ``GetStructField`` projections).

Scale: map-only (no shuffle, no driver work); the UDF is CPU-bound
python, which is the honest cost of HTML parsing — there is no
codegen HTML parser, and regexp_replace chains mis-handle scripts,
CDATA and entities (the classic "parse HTML with regex" failure).
Malformed markup never raises: html.parser is error-tolerant by
design, and a page that still explodes yields NULLs, not a dead job.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Content inside these elements is never visible text.
_SKIP_TAGS = frozenset(("script", "style", "noscript", "template", "svg", "head"))
#: Elements that imply a text break before and after.
_BLOCK_TAGS = frozenset((
    "p", "div", "br", "li", "ul", "ol", "tr", "table", "h1", "h2", "h3",
    "h4", "h5", "h6", "article", "section", "header", "footer", "blockquote",
    "pre", "hr", "form", "figure", "figcaption", "main", "nav", "aside", "dd",
    "dt", "dl", "address",
))

_CHARSET_HTTP_RE = re.compile(r"charset\s*=\s*[\"']?([A-Za-z0-9._-]+)", re.I)
_CHARSET_META_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9._-]+)", re.I
)


def decode_html_bytes(body: bytes | None, content_type: str | None = None) -> str | None:
    """Bytes → str with crawl-grade charset resolution: the HTTP
    header's charset wins, else a ``<meta charset=…>`` sniff over the
    first 2048 bytes, else UTF-8 — always ``errors="replace"``
    (declared charsets are wrong often enough that strict decoding
    would fail whole files). Unknown charset names fall back to
    UTF-8 rather than raising."""
    if body is None:
        return None
    charset = None
    if content_type:
        m = _CHARSET_HTTP_RE.search(content_type)
        if m:
            charset = m.group(1)
    if charset is None:
        m = _CHARSET_META_RE.search(body[:2048])
        if m:
            charset = m.group(1).decode("ascii", "replace")
    for cs in (charset, "utf-8"):
        if not cs:
            continue
        try:
            return body.decode(cs, "replace")
        except LookupError:  # declared codec python doesn't know
            continue
    return body.decode("utf-8", "replace")


class _HtmlTextParser(HTMLParser):
    """One-pass visible-text + title + outlink extractor."""

    def __init__(self, base_url: str | None = None):
        super().__init__(convert_charrefs=True)
        self.base_url = base_url
        self._skip_depth = 0
        self._in_title = False
        self._chunks: list[str] = []
        self._title: list[str] = []
        self.links: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "title":
            self._in_title = True
        if tag in _BLOCK_TAGS:
            self._chunks.append("\n")
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v and not v.startswith(("javascript:", "#")):
                    self.links.append(
                        urljoin(self.base_url, v) if self.base_url else v
                    )
                    break

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            # lenient: tolerate an unbalanced close
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_data(self, data):
        if self._in_title:
            self._title.append(data)
        elif not self._skip_depth:
            self._chunks.append(data)

    @staticmethod
    def _collapse(chunks: list[str]) -> str:
        # collapse runs of intra-line whitespace (incl. NBSP from
        # &nbsp;), blank-line runs to one newline, strip edges
        raw = "".join(chunks)
        lines = [re.sub(r"[^\S\n]+", " ", ln).strip() for ln in raw.split("\n")]
        return "\n".join(ln for ln in lines if ln)

    def result(self) -> tuple[str | None, str, list[str]]:
        title = " ".join(" ".join(self._title).split()) or None
        return title, self._collapse(self._chunks), self.links


def extract_html(
    html: str | None, base_url: str | None = None
) -> tuple[str | None, str | None, list[str] | None]:
    """(title, text, links) from one HTML string; (None, None, None)
    for NULL input, and NULLs (not an exception) if the parser blows
    up on adversarial input — one bad page must not kill a 100 TB
    job."""
    if html is None:
        return None, None, None
    p = _HtmlTextParser(base_url)
    try:
        p.feed(html)
        p.close()
        return p.result()
    except Exception:
        return None, None, None


_EXTRACT_DDL = "title string, text string, links array<string>"


def html_extract(
    df: DataFrame,
    body_col: str = "http_body",
    content_type_col: str | None = "http_content_type",
    base_url_col: str | None = "target_uri",
) -> DataFrame:
    """Add ``title``/``text``/``links`` extracted from an HTML binary
    column in one Arrow-batched pass (decode + parse fused — the
    charset comes from ``content_type_col``'s header value when
    present, the base URL for link resolution from ``base_url_col``).
    Pass ``content_type_col=None`` / ``base_url_col=None`` when those
    columns don't exist; the UDF then sniffs/keeps-relative."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_EXTRACT_DDL)
    def extract(body: pd.Series, ctype: pd.Series, base: pd.Series) -> pd.DataFrame:
        rows = []
        for b, c, u in zip(body, ctype, base):
            html = decode_html_bytes(b, c)
            rows.append(extract_html(html, u))
        return pd.DataFrame(rows, columns=["title", "text", "links"])

    ctype = F.col(content_type_col) if content_type_col else F.lit(None).cast("string")
    base = F.col(base_url_col) if base_url_col else F.lit(None).cast("string")
    tagged = df.withColumn("__html", extract(F.col(body_col), ctype, base))
    return tagged.withColumns(
        {
            "title": F.col("__html.title"),
            "text": F.col("__html.text"),
            "links": F.col("__html.links"),
        }
    ).drop("__html")


def html_to_text_expr(html: Column | str) -> Column:
    """STRING-column form (already-decoded HTML) returning just the
    visible text — convenience over ``html_extract`` for corpora
    that store markup as text."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def to_text(s: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_html(h)[1] for h in s], dtype=object
        )

    return to_text(F.col(html) if isinstance(html, str) else html)


# --- main-content extraction (boilerplate removal) --------------------


class _BlockParser(_HtmlTextParser):
    """Block-granular variant: accumulates (text, link_chars) per
    block-bounded region so a jusText/trafilatura-style density rule
    can classify boilerplate. Link depth tracks chars that live
    inside <a> — nav bars and footers are link-dense, prose is not."""

    def __init__(self, base_url: str | None = None):
        super().__init__(base_url)
        self.blocks: list[tuple[str, int]] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._a_depth = 0

    def _flush(self):
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append((text, self._link_chars))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._a_depth += 1
        super().handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a" and self._a_depth:
            self._a_depth -= 1
        super().handle_endtag(tag)

    def handle_data(self, data):
        super().handle_data(data)
        if not self._skip_depth and not self._in_title:
            self._buf.append(data)
            if self._a_depth:
                self._link_chars += len(data)

    def main_blocks(self, min_chars: int, max_link_density: float) -> list[str]:
        self._flush()
        return [
            text
            for text, link_chars in self.blocks
            if len(text) >= min_chars
            and link_chars / len(text) <= max_link_density
            and not _is_boilerplate_phrase_block(text)
        ]


#: Phrases that mark a SHORT block as chrome, not content (the
#: pragmatic stand-in for jusText's stopword-density "bad" class;
#: long blocks are exempt so an article QUOTING a privacy policy
#: survives).
_BOILERPLATE_PHRASES = (
    "all rights reserved", "privacy policy", "terms of service",
    "terms of use", "cookie", "sign in", "log in", "subscribe",
    "newsletter", "copyright ©", "© 20", "follow us",
)
_BOILERPLATE_MAX_CHARS = 200


def _is_boilerplate_phrase_block(text: str) -> bool:
    if len(text) > _BOILERPLATE_MAX_CHARS:
        return False
    low = text.lower()
    return any(p in low for p in _BOILERPLATE_PHRASES)


def extract_main_text(
    html: str | None,
    min_block_chars: int = 60,
    max_link_density: float = 0.30,
) -> str | None:
    """Boilerplate-stripped page text — the jusText/trafilatura
    heuristic core with no language model: split the page at block
    boundaries, keep blocks that are LONG (>= min_block_chars after
    whitespace collapse) and LINK-SPARSE (chars inside <a> at most
    max_link_density of the block), and drop SHORT blocks carrying
    classic chrome phrases (copyright lines, cookie banners, signup
    prompts — the pragmatic stand-in for jusText's stopword-density
    "bad" class; blocks over 200 chars are exempt so prose QUOTING a
    privacy policy survives). Nav bars, footers, tag clouds and
    related-links rails are short, link-dense or phrase-marked;
    article prose is none of those. Returns None for NULL/unparseable input; '' when nothing
    qualifies (the honest 'this page has no prose' signal C4-style
    length filters key on)."""
    if html is None:
        return None
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return None
    return "\n".join(p.main_blocks(min_block_chars, max_link_density))


def main_text_expr(
    html: Column | str,
    min_block_chars: int = 60,
    max_link_density: float = 0.30,
) -> Column:
    """Column form of :func:`extract_main_text` (Arrow-batched)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def to_main(s: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_main_text(h, min_block_chars, max_link_density) for h in s],
            dtype=object,
        )

    return to_main(F.col(html) if isinstance(html, str) else html)


def main_text_from_bytes(
    df: DataFrame,
    body_col: str = "http_body",
    content_type_col: str | None = "http_content_type",
    out_col: str = "main_text",
    min_block_chars: int = 60,
    max_link_density: float = 0.30,
) -> DataFrame:
    """Binary-column form of :func:`extract_main_text`: decode (same
    charset priority as ``html_extract``) + boilerplate-strip fused in
    one Arrow batch; adds ``out_col``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def main_from_bytes(body: pd.Series, ct: pd.Series) -> pd.Series:
        return pd.Series(
            [
                extract_main_text(
                    decode_html_bytes(b, c), min_block_chars, max_link_density
                )
                for b, c in zip(body, ct)
            ],
            dtype=object,
        )

    ctype = (
        F.col(content_type_col)
        if content_type_col
        else F.lit(None).cast("string")
    )
    return df.withColumn(out_col, main_from_bytes(F.col(body_col), ctype))
