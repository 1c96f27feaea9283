"""PDF text extraction (ISO 32000-1) — pure stdlib, crawl-tolerant.

Common Crawl responses include ``application/pdf`` payloads that WET
files simply skip; a training-data pipeline that wants them needs
bytes→text extraction with the same contract as functions/html.py:
never raise on garbage, NULL out the hopeless, stay map-only. This
module implements the needed subset of the COS object model and the
text-showing content operators from the public spec, the way the
other codecs in this package implement ITU T.81 / RFC 9639: from
scratch, with an encoder twin so round-trips are testable without
fixtures.

Decoder scope (pinned; each choice is the crawl-robust one):

- OBJECTS are found by scanning for ``N G obj`` markers rather than
  trusting the xref table — crawled PDFs routinely ship torn or lying
  xrefs, and a linear scan reads the same bytes a seek would.
  Object streams (``/Type /ObjStm``, PDF 1.5 compressed objects) are
  expanded, so modern compactly-written files work.
- STREAM FILTERS: FlateDecode (stdlib zlib, tolerant of trailing
  garbage), ASCIIHexDecode, ASCII85Decode, and PNG predictors 10-15
  via ``/DecodeParms`` (needed for predictor-packed object streams).
  Image-only filters (DCTDecode, JBIG2…) are not text carriers and
  simply skip the stream.
- PAGES come from the Catalog's page tree (inheriting ``/Resources``)
  with a fallback to "every ``/Type /Page`` object in object order"
  when the tree is torn.
- TEXT is assembled from BT/ET blocks: ``Tj``/``'``/``"`` and ``TJ``
  shows, font switches via ``Tf``, newlines at ``T*``/``' ``/``"``,
  vertical ``Td``/``TD`` moves and y-changing ``Tm`` sets; a ``TJ``
  kerning adjustment ≤ -180/1000 em inserts a space (the de-facto
  convention). Inline images (``BI … ID … EI``) are skipped bytewise.
- STRING DECODING per current font: a ``/ToUnicode`` CMap when
  present (bfchar + bfrange incl. array form, code width from the
  codespace range), else 2-byte pass-through for ``/Type0``
  (Identity-H CIDs have no text meaning without a CMap → U+FFFD),
  else the simple-font base encoding (``/WinAnsiEncoding`` → cp1252,
  ``/MacRomanEncoding`` → mac_roman, default latin-1).
  ``/Differences`` glyph renames are out of scope (the base encoding
  still decodes the unrenamed majority); fidelity-critical users
  should re-extract with a full renderer.

Encoder twin ``make_pdf_bytes``: classic xref files with Helvetica/
WinAnsi content, optional Flate / ASCIIHex / ASCII85 filters, an
``objstm=True`` mode that packs objects into a predictor-12 Flate
object stream + xref stream (exercising the ObjStm and PNG-predictor
paths), and ``unicode_font=True`` emitting a Type0/Identity-H font
with a generated ToUnicode CMap and 2-byte hex show strings.

Spark surface: ``pdf_extract`` mirrors functions/html.py's
``html_extract`` — ONE Arrow-batched pandas UDF returning
``struct<title, text, n_pages>``, map-only, so a WARC pipeline can
route ``text/html`` → html_extract and ``application/pdf`` →
pdf_extract and union the results.
"""

from __future__ import annotations

import base64
import binascii
import re
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_pdf",
    "make_pdf_bytes",
    "pdf_extract",
]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Name(str):
    """A PDF name token (distinct from a decoded string)."""


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} R"


class _Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.d, self.raw = d, raw


class _Lexer:
    """COS object parser over a bytes buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.b = data
        self.i = pos

    def _skip_ws(self) -> None:
        b, n = self.b, len(self.b)
        while self.i < n:
            c = b[self.i]
            if c in _WS:
                self.i += 1
            elif c == 0x25:  # % comment to EOL
                j = b.find(b"\n", self.i)
                self.i = n if j < 0 else j + 1
            else:
                return

    def parse(self):
        """Parse one object at the cursor. Raises ValueError on
        malformed input (callers catch per-object)."""
        self._skip_ws()
        b = self.b
        if self.i >= len(b):
            raise ValueError("eof")
        c = b[self.i]
        if c == 0x2F:  # /Name
            return self._name()
        if c == 0x28:  # (literal string)
            return self._lit_string()
        if c == 0x3C:  # << dict or <hex>
            if b[self.i : self.i + 2] == b"<<":
                return self._dict()
            return self._hex_string()
        if c == 0x5B:  # [ array ]
            return self._array()
        if b.startswith(b"true", self.i):
            self.i += 4
            return True
        if b.startswith(b"false", self.i):
            self.i += 5
            return False
        if b.startswith(b"null", self.i):
            self.i += 4
            return None
        if c in b"+-.0123456789":
            return self._number_or_ref()
        raise ValueError(f"unexpected byte 0x{c:02x} at {self.i}")

    def _name(self) -> _Name:
        self.i += 1
        b, n = self.b, len(self.b)
        out = bytearray()
        while self.i < n:
            c = b[self.i]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.i + 2 < n:  # #xx escape
                try:
                    out.append(int(b[self.i + 1 : self.i + 3], 16))
                    self.i += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            self.i += 1
        return _Name(out.decode("latin-1"))

    def _lit_string(self) -> bytes:
        self.i += 1
        b, n = self.b, len(self.b)
        out = bytearray()
        depth = 1
        while self.i < n:
            c = b[self.i]
            if c == 0x5C:  # backslash
                self.i += 1
                if self.i >= n:
                    break
                e = b[self.i]
                mapped = {
                    0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09,
                    0x62: 0x08, 0x66: 0x0C,
                }.get(e)
                if mapped is not None:
                    out.append(mapped)
                    self.i += 1
                elif e in b"01234567":  # up to 3 octal digits
                    j = self.i
                    while j < n and j - self.i < 3 and b[j] in b"01234567":
                        j += 1
                    out.append(int(b[self.i : j], 8) & 0xFF)
                    self.i = j
                elif e == 0x0A:  # line continuation
                    self.i += 1
                elif e == 0x0D:
                    self.i += 1
                    if self.i < n and b[self.i] == 0x0A:
                        self.i += 1
                else:  # \( \) \\ and unknown escapes: the char itself
                    out.append(e)
                    self.i += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.i += 1
                    return bytes(out)
            out.append(c)
            self.i += 1
        return bytes(out)

    def _hex_string(self) -> bytes:
        self.i += 1
        j = self.b.find(b">", self.i)
        if j < 0:
            j = len(self.b)
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", self.b[self.i : j])
        self.i = j + 1
        if len(hx) % 2:
            hx += b"0"
        return binascii.unhexlify(hx)

    def _dict(self) -> dict:
        self.i += 2
        d: dict = {}
        while True:
            self._skip_ws()
            if self.b.startswith(b">>", self.i):
                self.i += 2
                return d
            key = self.parse()
            if not isinstance(key, _Name):
                raise ValueError("dict key is not a name")
            d[str(key)] = self.parse()

    def _array(self) -> list:
        self.i += 1
        out = []
        while True:
            self._skip_ws()
            if self.i < len(self.b) and self.b[self.i] == 0x5D:
                self.i += 1
                return out
            out.append(self.parse())

    def _number_or_ref(self):
        b, n = self.b, len(self.b)
        j = self.i
        while j < n and b[j] in b"+-.0123456789eE":
            j += 1
        tok = b[self.i : j]
        self.i = j
        try:
            val = int(tok)
        except ValueError:
            return float(tok)
        # lookahead for "gen R"
        save = self.i
        self._skip_ws()
        k = self.i
        while k < n and b[k] in b"0123456789":
            k += 1
        if k > self.i:
            gen = int(b[self.i : k])
            m = k
            while m < n and b[m] in _WS:
                m += 1
            if m < n and b[m : m + 1] == b"R" and (
                m + 1 >= n or b[m + 1] in _WS or b[m + 1] in _DELIM
            ):
                self.i = m + 1
                return _Ref(val, gen)
        self.i = save
        return val


def _png_unpredict(data: bytes, columns: int, colors: int = 1, bpc: int = 8) -> bytes:
    """Reverse PNG row predictors (ISO 32000-1 §7.4.4.4 via RFC 2083)."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i + 1 <= len(data):
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        i += 1 + rowlen
        if ft == 1:  # Sub
            for x in range(bpp, len(row)):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            for x in range(len(row)):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(len(row)):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                p = a + prev[x] - c
                pa, pb, pc = abs(p - a), abs(p - prev[x]), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (prev[x] if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        out.extend(row)
        prev = row
    return bytes(out)


def _flate(data: bytes) -> bytes:
    try:
        return zlib.decompress(data)
    except zlib.error:
        # tolerate truncated tails: take what inflates
        d = zlib.decompressobj()
        return d.decompress(data)


_IMAGE_FILTERS = frozenset(
    ("DCTDecode", "JPXDecode", "JBIG2Decode", "CCITTFaxDecode", "RunLengthDecode")
)


def _decode_stream(s: _Stream, resolve) -> bytes | None:
    """Apply the stream's filter chain; None = not a text carrier
    (image-only filter) or undecodable."""
    filters = resolve(s.d.get("Filter"))
    parms = resolve(s.d.get("DecodeParms")) or resolve(s.d.get("DP"))
    if filters is None:
        filters = []
    if not isinstance(filters, list):
        filters = [filters]
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = s.raw
    for f, p in zip(filters, parms):
        fname = str(resolve(f))
        p = resolve(p)
        if fname in ("FlateDecode", "Fl"):
            data = _flate(data)
        elif fname in ("ASCIIHexDecode", "AHx"):
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", data.split(b">")[0])
            if len(hx) % 2:
                hx += b"0"
            data = binascii.unhexlify(hx)
        elif fname in ("ASCII85Decode", "A85"):
            body = data.strip()
            if body.startswith(b"<~"):
                body = body[2:]
            end = body.find(b"~>")
            if end >= 0:
                body = body[:end]
            data = base64.a85decode(re.sub(rb"\s", b"", body))
        elif fname in _IMAGE_FILTERS:
            return None
        else:
            return None
        if isinstance(p, dict):
            pred = resolve(p.get("Predictor", 1)) or 1
            if pred >= 10:
                data = _png_unpredict(
                    data,
                    int(resolve(p.get("Columns", 1)) or 1),
                    int(resolve(p.get("Colors", 1)) or 1),
                    int(resolve(p.get("BitsPerComponent", 8)) or 8),
                )
    return data


_OBJ_RE = re.compile(rb"(\d{1,9})\s+(\d{1,5})\s+obj\b")
_STREAM_RE = re.compile(rb"stream(\r\n|\n|\r)")


class _PdfDoc:
    def __init__(self, data: bytes):
        self.objects: dict[tuple[int, int], object] = {}
        self.trailers: list[dict] = []
        self.encrypted = False  # an /Encrypt dict was found
        self.locked = False  # ...and the empty user password failed
        self._scan(data)
        self._decrypt_all()
        self._expand_objstm()

    # --- standard security handler (ISO 32000 §7.6) -------------------

    def _decrypt_all(self) -> None:
        """Detect /Encrypt; with the EMPTY user password (the common
        crawl case: owner-locked files every reader opens silently)
        decrypt all strings and streams in place BEFORE ObjStm
        expansion (object streams are themselves encrypted; objects
        inside them are NOT re-encrypted, which falls out of running
        this first). A failed authentication sets ``locked`` so
        extraction NULLs out instead of emitting keystream garbage."""
        from snapflow_spark.multimodal.pdf_crypt import PdfCrypt

        enc_ref = None
        enc = id0 = None
        for t in self.trailers:
            e = t.get("Encrypt")
            if e is not None:
                enc_ref = e if isinstance(e, _Ref) else None
                enc = self.resolve(e)
                ids = self.resolve(t.get("ID"))
                if isinstance(ids, list) and ids and isinstance(ids[0], bytes):
                    id0 = ids[0]
                break
        if not isinstance(enc, dict):
            return
        self.encrypted = True
        if str(enc.get("Filter") or "Standard") != "Standard":
            self.locked = True  # custom handlers: flag, don't guess
            return
        resolved = {k: self.resolve(v) for k, v in enc.items()}
        cf = resolved.get("CF")
        if isinstance(cf, dict):
            resolved["CF"] = {
                k: self.resolve(v) for k, v in cf.items()
            }
        crypt = PdfCrypt(resolved, id0 or b"")
        if not crypt.authenticate(b""):
            self.locked = True
            return
        meta_plain = resolved.get("EncryptMetadata") is False
        skip_keys = {(enc_ref.num, enc_ref.gen)} if enc_ref else set()
        for key, v in self.objects.items():
            if key in skip_keys:
                continue
            num, gen = key
            if isinstance(v, _Stream):
                v.d = self._dec_strings(v.d, crypt, num, gen)
                t = str(v.d.get("Type"))
                if t == "XRef" or (t == "Metadata" and meta_plain):
                    continue  # never encrypted per spec
                v.raw = crypt.decrypt_stream(num, gen, v.raw)
            else:
                self.objects[key] = self._dec_strings(v, crypt, num, gen)

    def _dec_strings(self, x, crypt, num: int, gen: int, depth: int = 0):
        if depth > 64:
            return x
        if isinstance(x, bytes):
            return crypt.decrypt_string(num, gen, x)
        if isinstance(x, list):
            return [self._dec_strings(i, crypt, num, gen, depth + 1) for i in x]
        if isinstance(x, dict):
            return {
                k: self._dec_strings(v, crypt, num, gen, depth + 1)
                for k, v in x.items()
            }
        return x

    def _scan(self, data: bytes) -> None:
        for m in _OBJ_RE.finditer(data):
            key = (int(m.group(1)), int(m.group(2)))
            lex = _Lexer(data, m.end())
            try:
                val = lex.parse()
            except ValueError:
                continue
            if isinstance(val, dict):
                lex._skip_ws()
                sm = _STREAM_RE.match(data, lex.i)
                if sm:
                    start = sm.end()
                    ln = self.resolve(val.get("Length"))
                    end = -1
                    if isinstance(ln, int) and 0 <= ln <= len(data) - start:
                        tail = data[start + ln : start + ln + 20]
                        if tail.lstrip(b"\r\n ").startswith(b"endstream"):
                            end = start + ln
                    if end < 0:  # lying /Length: scan
                        end = data.find(b"endstream", start)
                        if end < 0:
                            end = len(data)
                        else:
                            end = (
                                end - 2
                                if data[end - 2 : end] == b"\r\n"
                                else (end - 1 if data[end - 1 : end] in (b"\n", b"\r") else end)
                            )
                    val = _Stream(val, data[start:end])
            self.objects[key] = val
        for m in re.finditer(rb"trailer", data):
            lex = _Lexer(data, m.end())
            try:
                t = lex.parse()
            except ValueError:
                continue
            if isinstance(t, dict):
                self.trailers.append(t)
        # xref streams double as trailers
        for v in list(self.objects.values()):
            if isinstance(v, _Stream) and str(v.d.get("Type")) == "XRef":
                self.trailers.append(v.d)

    def _expand_objstm(self) -> None:
        for v in list(self.objects.values()):
            if not (isinstance(v, _Stream) and str(v.d.get("Type")) == "ObjStm"):
                continue
            data = _decode_stream(v, self.resolve)
            if data is None:
                continue
            n = self.resolve(v.d.get("N"))
            first = self.resolve(v.d.get("First"))
            if not (isinstance(n, int) and isinstance(first, int)):
                continue
            try:
                head = data[:first].split()
                pairs = [
                    (int(head[2 * i]), int(head[2 * i + 1])) for i in range(n)
                ]
            except (ValueError, IndexError):
                continue
            for num, off in pairs:
                if (num, 0) in self.objects:
                    continue  # direct objects win
                try:
                    self.objects[(num, 0)] = _Lexer(data, first + off).parse()
                except ValueError:
                    continue

    def resolve(self, x, depth: int = 0):
        while isinstance(x, _Ref) and depth < 32:
            x = self.objects.get((x.num, x.gen), self.objects.get((x.num, 0)))
            depth += 1
        return x

    # --- page tree -----------------------------------------------------

    def pages(self) -> list[dict]:
        root = None
        for t in self.trailers:
            root = self.resolve(t.get("Root")) or root
        if root is None:
            for v in self.objects.values():
                v = v.d if isinstance(v, _Stream) else v
                if isinstance(v, dict) and str(v.get("Type")) == "Catalog":
                    root = v
                    break
        out: list[dict] = []
        if isinstance(root, dict):
            self._walk(self.resolve(root.get("Pages")), {}, out, 0)
        if not out:  # torn tree: object-order fallback
            for _, v in sorted(self.objects.items()):
                if isinstance(v, dict) and str(v.get("Type")) == "Page":
                    v.setdefault("__res", self.resolve(v.get("Resources")))
                    out.append(v)
        return out

    def _walk(self, node, inherited_res, out, depth) -> None:
        node = self.resolve(node)
        if not isinstance(node, dict) or depth > 64 or len(out) > 100_000:
            return
        res = self.resolve(node.get("Resources")) or inherited_res
        if str(node.get("Type")) == "Page":
            node["__res"] = res
            out.append(node)
            return
        kids = self.resolve(node.get("Kids"))
        if isinstance(kids, list):
            for k in kids:
                self._walk(k, res, out, depth + 1)


# --- ToUnicode CMaps and font decoding ---------------------------------

_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CSPACE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)


def _u16(hx: bytes) -> str:
    raw = binascii.unhexlify(hx if len(hx) % 2 == 0 else hx + b"0")
    return raw.decode("utf-16-be", "replace")


def _parse_tounicode(data: bytes) -> tuple[dict[int, str], int]:
    """(code→str map, code byte width) from a ToUnicode CMap stream."""
    cmap: dict[int, str] = {}
    width = 0
    for m in _CSPACE_RE.finditer(data):
        for hx in _HEX_RE.findall(m.group(1)):
            width = max(width, (len(hx) + 1) // 2)
    for m in _BFCHAR_RE.finditer(data):
        items = _HEX_RE.findall(m.group(1))
        for j in range(0, len(items) - 1, 2):
            cmap[int(items[j], 16)] = _u16(items[j + 1])
            width = max(width, (len(items[j]) + 1) // 2)
    for m in _BFRANGE_RE.finditer(data):
        body = m.group(1)
        # two forms: <lo> <hi> <dst>   |   <lo> <hi> [ <d0> <d1> ... ]
        for rm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[(?:[^\]]*)\]|<[0-9A-Fa-f]+>)",
            body,
        ):
            lo, hi = int(rm.group(1), 16), int(rm.group(2), 16)
            width = max(width, (len(rm.group(1)) + 1) // 2)
            dst = rm.group(3)
            if dst.startswith(b"["):
                dsts = _HEX_RE.findall(dst)
                for k, code in enumerate(range(lo, min(hi, lo + len(dsts) - 1) + 1)):
                    cmap[code] = _u16(dsts[k])
            else:
                base = int(dst[1:-1], 16)
                for k, code in enumerate(range(lo, min(hi, lo + 65535) + 1)):
                    # increment the LAST UTF-16 code unit (spec rule)
                    cmap[code] = _u16(
                        (b"%0*x" % (len(dst) - 2, base + k))
                    )
    return cmap, width or 1


_BASE_ENCODINGS = {
    "WinAnsiEncoding": "cp1252",
    "MacRomanEncoding": "mac_roman",
}


class _FontDecoder:
    def __init__(self, fd: dict | None, resolve):
        fd = fd or {}
        self.cmap: dict[int, str] = {}
        self.width = 1
        subtype = str(resolve(fd.get("Subtype")) or "")
        if subtype == "Type0":
            self.width = 2
        tu = resolve(fd.get("ToUnicode"))
        if isinstance(tu, _Stream):
            data = _decode_stream(tu, resolve)
            if data:
                self.cmap, w = _parse_tounicode(data)
                if self.cmap:
                    self.width = w
        enc = resolve(fd.get("Encoding"))
        if isinstance(enc, dict):  # encoding dict: use its base
            enc = resolve(enc.get("BaseEncoding"))
        self.codec = _BASE_ENCODINGS.get(str(enc) if enc else "", "latin-1")

    def decode(self, raw: bytes) -> str:
        if self.cmap or self.width > 1:
            w = self.width
            out = []
            for j in range(0, len(raw) - (w - 1), w):
                code = int.from_bytes(raw[j : j + w], "big")
                out.append(self.cmap.get(code, "�" if w > 1 else chr(code)))
            return "".join(out)
        return raw.decode(self.codec, "replace")


_DEFAULT_FONT = _FontDecoder(None, lambda x: x)


# --- content-stream text assembly --------------------------------------

_OPERATOR_RE = re.compile(rb"[^\s()<>\[\]{}/%]+")


def _page_text(content: bytes, fonts: dict[str, _FontDecoder]) -> str:
    lex = _Lexer(content)
    stack: list = []
    parts: list[str] = []
    cur = _DEFAULT_FONT
    b, n = content, len(content)

    def show(raw) -> None:
        if isinstance(raw, bytes):
            parts.append(cur.decode(raw))

    while True:
        lex._skip_ws()
        if lex.i >= n:
            break
        c = b[lex.i]
        if c in b"/<([+-.0123456789" or b.startswith(b"true", lex.i) or b.startswith(
            b"false", lex.i
        ) or b.startswith(b"null", lex.i):
            try:
                stack.append(lex.parse())
            except ValueError:
                lex.i += 1
            continue
        m = _OPERATOR_RE.match(b, lex.i)
        if not m:
            lex.i += 1
            continue
        op = m.group(0)
        lex.i = m.end()
        if op == b"BI":  # inline image: skip to EI
            j = lex.i
            while True:
                j = b.find(b"EI", j)
                if j < 0:
                    j = n
                    break
                if j == 0 or b[j - 1] in _WS:
                    break
                j += 2
            lex.i = min(n, j + 2)
        elif op == b"Tf" and len(stack) >= 2 and isinstance(stack[-2], _Name):
            cur = fonts.get(str(stack[-2]), _DEFAULT_FONT)
        elif op == b"Tj" and stack:
            show(stack[-1])
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for el in stack[-1]:
                if isinstance(el, bytes):
                    show(el)
                elif isinstance(el, (int, float)) and el <= -180:
                    parts.append(" ")
        elif op in (b"'", b'"'):
            parts.append("\n")
            show(stack[-1] if stack else None)
        elif op == b"T*":
            parts.append("\n")
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            ty = stack[-1]
            if isinstance(ty, (int, float)) and ty != 0:
                parts.append("\n")
        elif op == b"Tm" and len(stack) >= 6:
            parts.append("\n")
        elif op == b"ET":
            parts.append("\n")
        stack.clear()
    # collapse: strip line edges, drop blank lines
    lines = [ln.strip() for ln in "".join(parts).split("\n")]
    return "\n".join(ln for ln in lines if ln)


def _doc_title(doc: _PdfDoc) -> str | None:
    for t in doc.trailers:
        info = doc.resolve(t.get("Info"))
        if isinstance(info, dict):
            title = doc.resolve(info.get("Title"))
            if isinstance(title, bytes) and title:
                if title.startswith(b"\xfe\xff"):
                    return title[2:].decode("utf-16-be", "replace")
                return title.decode("latin-1")
    return None


def extract_pdf(
    data: bytes | None,
) -> tuple[str | None, str | None, int | None, bool | None]:
    """(title, text, n_pages, encrypted) from one PDF byte string;
    all-NULL for NULL/hopeless input — one bad file must not kill a
    100 TB job. ``encrypted`` is True whenever an /Encrypt dictionary
    was found: empty-user-password files (the common crawl case)
    still yield their text transparently via the standard-security-
    handler decrypt (pdf_crypt.py — RC4-40/128, AES-128, AES-256);
    files needing a real password come back text-NULL + flag True
    (the triage signal) instead of keystream garbage."""
    if data is None:
        return None, None, None, None
    try:
        doc = _PdfDoc(data)
        if doc.locked:
            return None, None, None, True
        pages = doc.pages()
        texts = []
        for pg in pages:
            contents = doc.resolve(pg.get("Contents"))
            chunks = []
            items = contents if isinstance(contents, list) else [contents]
            for it in items:
                it = doc.resolve(it)
                if isinstance(it, _Stream):
                    decoded = _decode_stream(it, doc.resolve)
                    if decoded:
                        chunks.append(decoded)
            fonts = {}
            res = doc.resolve(pg.get("__res")) or {}
            fdict = doc.resolve(res.get("Font")) if isinstance(res, dict) else None
            if isinstance(fdict, dict):
                for fname, fref in fdict.items():
                    fobj = doc.resolve(fref)
                    if isinstance(fobj, dict):
                        fonts[fname] = _FontDecoder(fobj, doc.resolve)
            texts.append(_page_text(b"\n".join(chunks), fonts))
        text = "\n".join(t for t in texts if t)
        if not pages and not text:
            return None, None, None, doc.encrypted or None
        return _doc_title(doc), text, len(pages), doc.encrypted
    except Exception:
        return None, None, None, None


# --- encoder twin -------------------------------------------------------


def _esc_lit(s: str) -> bytes:
    out = s.encode("cp1252", "replace")
    return (
        out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def _filter_encode(data: bytes, filt: str | None) -> tuple[bytes, bytes]:
    """(encoded bytes, /Filter fragment) for the twin's streams."""
    if filt == "flate":
        return zlib.compress(data), b"/Filter /FlateDecode "
    if filt == "hex":
        return binascii.hexlify(data) + b">", b"/Filter /ASCIIHexDecode "
    if filt == "a85":
        return base64.a85encode(data) + b"~>", b"/Filter /ASCII85Decode "
    return data, b""


def _ser_pdf(v) -> bytes:
    """Serialize an /Encrypt-dict value to PDF syntax (bytes → hex
    string, str → name — matching how PdfCrypt reads them back)."""
    if isinstance(v, bytes):
        return b"<" + binascii.hexlify(v) + b">"
    if isinstance(v, bool):
        return b"true" if v else b"false"
    if isinstance(v, int):
        return str(v).encode()
    if isinstance(v, str):
        return b"/" + v.encode()
    if isinstance(v, dict):
        return (
            b"<< "
            + b" ".join(
                b"/" + k.encode() + b" " + _ser_pdf(x) for k, x in v.items()
            )
            + b" >>"
        )
    raise TypeError(type(v))


def make_pdf_bytes(
    pages: list[str],
    filt: str | None = "flate",
    objstm: bool = False,
    unicode_font: bool = False,
    title: str | None = None,
    encrypt: str | None = None,
    user_password: bytes = b"",
    owner_password: bytes = b"",
) -> bytes:
    """Encoder twin: a spec-valid PDF whose page texts round-trip
    through ``extract_pdf``. ``filt`` ∈ {None, 'flate', 'hex', 'a85'}
    picks the content-stream filter; ``objstm=True`` packs the
    non-stream objects into a predictor-12 Flate object stream with an
    xref stream; ``unicode_font=True`` uses a Type0/Identity-H font
    with a generated ToUnicode CMap and 2-byte hex show strings
    (required for non-cp1252 text); ``encrypt`` ∈ {'rc4-40',
    'rc4-128', 'aes-128', 'aes-256'} writes a standard-security-
    handler file (streams AND strings encrypted, deterministic
    salts/IVs) — empty passwords by default, the crawl norm."""
    if encrypt and objstm:
        raise ValueError("encrypt + objstm twin form not supported")
    crypt = None
    id0 = b""
    if encrypt:
        import hashlib

        from snapflow_spark.multimodal.pdf_crypt import (
            build_standard_encryption,
        )

        id0 = hashlib.md5("\n".join(pages).encode()).digest()
        enc_entries, crypt = build_standard_encryption(
            encrypt, id0, user_password, owner_password
        )

    def _iv(num: int) -> bytes:
        import hashlib

        return hashlib.md5(b"iv%d" % num + id0).digest()

    def stream_obj(num: int, dict_frag: bytes, payload: bytes) -> bytes:
        if crypt is not None:
            payload = crypt.encrypt_stream(num, 0, payload, iv=_iv(num))
        return (
            b"<< " + dict_frag + b"/Length " + str(len(payload)).encode()
            + b" >>\nstream\n" + payload + b"\nendstream"
        )

    objs: dict[int, bytes] = {}
    n_pg = len(pages)
    font_ref = 3 + 2 * n_pg
    kid_refs = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pg))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [ {kid_refs} ] /Count {n_pg} >>".encode()
    )

    # font object(s)
    charmap: dict[str, int] = {}
    if unicode_font:
        all_chars = sorted({ch for p in pages for ch in p if ch != "\n"})
        charmap = {ch: i + 1 for i, ch in enumerate(all_chars)}
        bfchars = "\n".join(
            f"<{code:04x}> <{''.join(f'{ord(u):04x}' for u in ch)}>"
            for ch, code in charmap.items()
        )
        cmap = (
            "/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
            "1 begincodespacerange <0000> <ffff> endcodespacerange\n"
            f"{len(charmap)} beginbfchar\n{bfchars}\nendbfchar\n"
            "endcmap end end"
        ).encode()
        enc, ffrag = _filter_encode(cmap, filt)
        objs[font_ref + 1] = stream_obj(font_ref + 1, ffrag, enc)
        objs[font_ref + 2] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> >>"
        )
        objs[font_ref] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            b"/Encoding /Identity-H /DescendantFonts [ "
            + f"{font_ref + 2} 0 R ] /ToUnicode {font_ref + 1} 0 R >>".encode()
        )
        info_ref = font_ref + 3
    else:
        objs[font_ref] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>"
        )
        info_ref = font_ref + 1

    for i, page in enumerate(pages):
        pg_ref, ct_ref = 3 + 2 * i, 4 + 2 * i
        lines = page.split("\n")
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for j, ln in enumerate(lines):
            if j:
                ops.append(b"0 -14 Td")
            if unicode_font:
                hx = "".join(f"{charmap[ch]:04x}" for ch in ln)
                ops.append(b"<" + hx.encode() + b"> Tj")
            else:
                ops.append(b"(" + _esc_lit(ln) + b") Tj")
        ops.append(b"ET")
        content = b"\n".join(ops)
        enc, ffrag = _filter_encode(content, filt)
        objs[pg_ref] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] "
            f"/Resources << /Font << /F1 {font_ref} 0 R >> >> "
            f"/Contents {ct_ref} 0 R >>".encode()
        )
        objs[ct_ref] = stream_obj(ct_ref, ffrag, enc)

    if title is not None:
        if crypt is not None:
            # strings are encrypted too; hex form avoids escaping the
            # ciphertext
            ct = crypt.encrypt_string(
                info_ref, 0, title.encode("cp1252", "replace"), iv=_iv(info_ref)
            )
            objs[info_ref] = b"<< /Title <" + binascii.hexlify(ct) + b"> >>"
        else:
            objs[info_ref] = b"<< /Title (" + _esc_lit(title) + b") >>"

    enc_ref = None
    if crypt is not None:
        enc_ref = max(objs) + 1
        objs[enc_ref] = _ser_pdf({"Filter": "Standard", **enc_entries})

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    if not objstm:
        offsets: dict[int, int] = {}
        for num in sorted(objs):
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
        xref_at = len(out)
        maxn = max(objs) + 1
        out += f"xref\n0 {maxn}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, maxn):
            out += (
                f"{offsets[num]:010d} 00000 n \n".encode()
                if num in objs
                else b"0000000000 65535 f \n"
            )
        out += b"trailer\n<< /Size " + str(maxn).encode() + b" /Root 1 0 R"
        if title is not None:
            out += b" /Info " + str(info_ref).encode() + b" 0 R"
        if enc_ref is not None:
            hx = binascii.hexlify(id0)
            out += (
                b" /Encrypt " + str(enc_ref).encode() + b" 0 R /ID [ <"
                + hx + b"> <" + hx + b"> ]"
            )
        out += b" >>\nstartxref\n" + str(xref_at).encode() + b"\n%%EOF"
        return bytes(out)

    # ObjStm form: pack non-stream objects; streams stay top-level
    plain = {n: v for n, v in objs.items() if b"\nstream\n" not in v}
    streams = {n: v for n, v in objs.items() if b"\nstream\n" in v}
    pairs, body = [], b""
    for num in sorted(plain):
        pairs.append(f"{num} {len(body)}")
        body += plain[num] + b"\n"
    header = (" ".join(pairs) + "\n").encode()
    stm = header + body
    # predictor-12 (PNG Up) packing exercises the unpredict path
    cols = 64
    rows = [stm[i : i + cols].ljust(cols, b" ") for i in range(0, len(stm), cols)]
    pred = bytearray()
    prev = bytes(cols)
    for r in rows:
        pred.append(2)
        pred.extend((r[x] - prev[x]) & 0xFF for x in range(cols))
        prev = r
    objstm_num = max(objs) + 1
    offsets = {}
    enc = zlib.compress(bytes(pred))
    offsets[objstm_num] = len(out)
    out += (
        f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(plain)} "
        f"/First {len(header)} /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns {cols} >> "
        f"/Length {len(enc)} >>\nstream\n".encode()
        + enc
        + b"\nendstream\nendobj\n"
    )
    for num in sorted(streams):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + streams[num] + b"\nendobj\n"
    # xref stream (W [1 2 2]): type-2 entries point into the ObjStm
    xref_num = objstm_num + 1
    maxn = xref_num + 1
    entries = bytearray()
    order = {num: k for k, num in enumerate(sorted(plain))}
    for num in range(maxn):
        if num in plain:
            entries += b"\x02" + objstm_num.to_bytes(2, "big") + order[num].to_bytes(2, "big")
        elif num in offsets:
            entries += b"\x01" + offsets[num].to_bytes(2, "big") + b"\x00\x00"
        else:
            entries += b"\x00\x00\x00\xff\xff"
    xenc = zlib.compress(bytes(entries))
    xref_at = len(out)
    trailer_bits = f"/Size {maxn} /Root 1 0 R"
    if title is not None:
        trailer_bits += f" /Info {info_ref} 0 R"
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /W [ 1 2 2 ] /Index [ 0 {maxn} ] "
        f"{trailer_bits} /Filter /FlateDecode /Length {len(xenc)} >>\nstream\n".encode()
        + xenc
        + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(xref_at).encode() + b"\n%%EOF"
    return bytes(out)


# --- Spark surface -------------------------------------------------------

_PDF_DDL = "title string, text string, n_pages int, encrypted boolean"


def pdf_extract(df: DataFrame, body_col: str = "http_body") -> DataFrame:
    """Add ``title``/``text``/``n_pages``/``encrypted`` extracted from
    a PDF binary column in ONE Arrow-batched pass — the
    ``application/pdf`` twin of functions/html.py's ``html_extract``
    (same output column names, so a content-type-routed pipeline
    unions the two branches). Map-only: no shuffle, no driver work;
    hopeless inputs yield NULLs. ``encrypted`` flags /Encrypt files —
    empty-user-password ones still carry text (decrypted in the same
    pass); text-NULL + encrypted=True means a real password is needed
    (route to quarantine, not the corpus)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_PDF_DDL)
    def extract(body: pd.Series) -> pd.DataFrame:
        rows = [extract_pdf(b) for b in body]
        return pd.DataFrame(
            rows, columns=["title", "text", "n_pages", "encrypted"]
        )

    tagged = df.withColumn("__pdf", extract(F.col(body_col)))
    return tagged.withColumns(
        {
            "title": F.col("__pdf.title"),
            "text": F.col("__pdf.text"),
            "n_pages": F.col("__pdf.n_pages"),
            "encrypted": F.col("__pdf.encrypted"),
        }
    ).drop("__pdf")
