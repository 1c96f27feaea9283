"""Text normalization + mojibake repair — the cleanup pass between
extraction (HTML/PDF/WET) and everything keyed on text bytes.

Exact dedup, MinHash shingles, fingerprints and tokenizers all key on
raw characters, so two renderings of the same page — one NFC, one
NFD; one clean, one "cafÃ©"-mojibake'd — count as different
documents and silently survive dedup. Crawl pipelines therefore
normalize first (CCNet, C4 and Dolma all do); this module is that
step, split into the engine's usual two tiers:

CODEGEN TIER (``clean_text_expr``) — JVM ``regexp_replace`` chain, no
python, the 100 TB path:
- strip C0/C1 control characters (keeping ``\\t``/``\\n``/``\\r``) and
  the BOM/zero-width family (U+200B..200D, U+2060, U+FEFF) that
  breaks tokenizers invisibly;
- map the unicode space zoo (NBSP, narrow NBSP, en/em/thin spaces,
  ideographic space, U+2000..200A) to plain ASCII space;
- map line/paragraph separators (U+2028/2029, NEL U+0085, vertical
  tab, form feed) to ``\\n``.
Structure (newlines) is preserved; nothing is collapsed — the C4 and
Gopher line rules own line-level semantics.

PYTHON TIER (``normalize_text`` / ``normalize_udf``) — Arrow-batched,
for what JVM expressions can't do:
- unicode normalization forms (default NFKC: compatibility folds like
  U+FB01 ``ﬁ``→``fi`` and fullwidth forms, plus canonical
  composition — the form tokenizer vocabularies are trained on);
- mojibake repair (``fix_mojibake``): UTF-8 bytes mis-decoded as
  cp1252/latin-1 — the single most common crawl corruption ("cafÃ©",
  "â€™") — repaired by re-encoding through cp1252 (latin-1 fallback
  for cp1252's five holes) and strictly re-decoding as UTF-8. The
  PINNED acceptance rule: a repair round is kept only when the strict
  UTF-8 decode SUCCEEDS and the result is strictly shorter (a real
  multi-byte sequence collapsed) — random non-mojibake text virtually
  never forms valid multi-byte UTF-8, ASCII round-trips unchanged
  (equal length → no-op), and text with characters outside cp1252
  fails the encode and is correctly left alone. Up to 3 rounds
  handles double/triple encoding. The DEFAULT is whole-string repair (a
  half-corrupted string stays as-is — the oracle-pinned form);
  ``fix_mojibake_segments`` (round 10) is the opt-in ftfy-style tier
  that repairs mixed-encoding documents span by span via UTF-8
  resynchronization over the cp1252ish byte view
  (``fix_encoding='segments'``).

Both tiers are map-only projections; ``normalize_text_column``
composes them in the canonical order (clean → fix → normalize).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "clean_text_expr",
    "fix_mojibake",
    "fix_mojibake_segments",
    "normalize_text",
    "normalize_text_column",
    "normalize_udf",
]

#: zero-width / BOM family + soft hyphen: deleted outright.
_ZERO_WIDTH_RE = "[\u200b-\u200d\u2060\ufeff\u00ad]"
#: C0 (minus \t\n\r) + DEL + C1 controls: deleted outright.
_CONTROL_RE = "[\x00-\x08\x0e-\x1f\x7f\x80-\x9f]"
#: horizontal unicode spaces -> ASCII space: NBSP, Ogham mark, the
#: U+2000..200A en/em/thin family, narrow NBSP, math space,
#: ideographic space.
_SPACE_RE = "[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]"
#: line/paragraph separators beyond \n -> \n: LS, PS, NEL, VT, FF.
_NEWLINE_RE = "[\u2028\u2029\u0085\x0b\x0c]"


def clean_text_expr(col: str | Column) -> Column:
    """Codegen cleanup chain (see module doc): controls and zero-width
    out, space zoo to ' ', exotic line separators to '\\n'. Pure JVM
    regexp_replace — safe at any scale, composes before any text op."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _NEWLINE_RE, "\n")
    c = F.regexp_replace(c, _SPACE_RE, " ")
    c = F.regexp_replace(c, _ZERO_WIDTH_RE, "")
    return F.regexp_replace(c, _CONTROL_RE, "")


# cp1252 with latin-1 filling its five undefined holes (0x81 0x8D
# 0x8F 0x90 0x9D) — the de-facto decoding browsers apply, hence the
# de-facto encoding mojibake was produced through.
def _to_cp1252ish(s: str) -> bytes | None:
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        out = bytearray()
        for ch in s:
            try:
                out += ch.encode("cp1252")
            except UnicodeEncodeError:
                cp = ord(ch)
                if cp <= 0xFF:
                    out.append(cp)
                else:
                    return None
        return bytes(out)


def _char_byte(ch: str) -> int | None:
    """The cp1252ish byte a character renders from, or None when it
    cannot have come from a single byte (codepoint > 0xFF outside
    cp1252)."""
    try:
        return ch.encode("cp1252")[0]
    except UnicodeEncodeError:
        cp = ord(ch)
        return cp if cp <= 0xFF else None


def fix_mojibake_segments(s: str | None, max_rounds: int = 3) -> str | None:
    """SEGMENT-level mojibake repair (the ftfy-style tier the
    whole-string rule deliberately refuses): a document where only
    SOME spans are UTF-8-decoded-as-cp1252 — one pasted paragraph, a
    scraped comment, a half-converted database column — repairs just
    those spans and leaves every clean character byte-identical.

    Algorithm (original, pinned): scan characters left to right; map
    each to the cp1252ish byte it would have rendered from
    (``_char_byte``; characters that cannot come from one byte — CJK,
    emoji — are hard boundaries and pass through). Wherever a
    UTF-8 LEAD byte (0xC2-0xF4) starts a sequence whose
    lead-determined length decodes as STRICT valid UTF-8, that
    sequence is replaced by its decoded character; every other
    character passes through unchanged. Rounds repeat (``max_rounds``)
    for nested double-encodings, stopping at the first no-change
    round.

    Trade vs the whole-string rule (which remains the default and the
    oracle-pinned form): segment repair is strictly more aggressive —
    a clean string that legitimately contains a lead-byte character
    immediately followed by continuation-range characters (e.g. the
    literal two-character text "Â«") is indistinguishable from
    mojibake and gets repaired; natural language makes such runs
    vanishingly rare, and crawl pipelines that want maximum salvage
    opt in via ``fix_encoding='segments'``. Total — never raises;
    ASCII and non-cp1252 scripts are structurally untouchable."""
    if s is None:
        return None
    for _ in range(max_rounds):
        out: list[str] = []
        changed = False
        i, n = 0, len(s)
        while i < n:
            b = _char_byte(s[i])
            if b is None or b < 0xC2 or b > 0xF4:
                out.append(s[i])
                i += 1
                continue
            seq_len = 2 if b <= 0xDF else 3 if b <= 0xEF else 4
            if i + seq_len <= n:
                bs = [_char_byte(c) for c in s[i : i + seq_len]]
                if all(x is not None for x in bs):
                    try:
                        out.append(bytes(bs).decode("utf-8"))
                        i += seq_len
                        changed = True
                        continue
                    except UnicodeDecodeError:
                        pass
            out.append(s[i])
            i += 1
        if not changed:
            return s
        s = "".join(out)
    return s


def fix_mojibake(s: str | None, max_rounds: int = 3) -> str | None:
    """Repair UTF-8-decoded-as-cp1252 mojibake (pinned acceptance rule
    in the module doc). Returns the input unchanged when no repair
    applies; total — never raises."""
    if s is None:
        return None
    for _ in range(max_rounds):
        raw = _to_cp1252ish(s)
        if raw is None:
            return s
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            return s
        if len(fixed) >= len(s):
            return s
        s = fixed
    return s


def normalize_text(
    s: str | None,
    form: str = "NFKC",
    fix_encoding: bool | str = True,
) -> str | None:
    """One string through the python tier: mojibake repair (optional)
    then a unicode normalization form ('NFC', 'NFKC', 'NFD', 'NFKD',
    or '' / None to skip). ``fix_encoding``: True = whole-string rule
    (default, oracle-pinned), ``'segments'`` = segment-level repair
    for mixed-encoding documents (fix_mojibake_segments), False =
    skip."""
    if s is None:
        return None
    # Iterate repair+normalize to a FIXED POINT (bounded): NFKC can
    # CREATE repair opportunities — e.g. 'ªÂ»' is not repairable
    # (0xAA starts no valid UTF-8 sequence) until NFKC folds ª→a,
    # after which 'Â»' is textbook UTF-8-as-cp1252 — so a single
    # repair→normalize pass is not idempotent (hypothesis-found,
    # round 11). Two extra rounds bound the loop; real text converges
    # in one.
    for _ in range(3):
        prev = s
        if fix_encoding == "segments":
            s = fix_mojibake_segments(s)
        elif fix_encoding:
            s = fix_mojibake(s)
        if form:
            s = unicodedata.normalize(form, s)
        if s == prev:
            break
    return s


def normalize_udf(
    col: str | Column,
    form: str = "NFKC",
    fix_encoding: bool | str = True,
) -> Column:
    """Arrow-batched column form of ``normalize_text``. Built at call
    time (pandas_udf registration needs an active session)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [normalize_text(t, form=form, fix_encoding=fix_encoding) for t in texts],
            dtype=object,
        )

    return norm(F.col(col) if isinstance(col, str) else col)


def normalize_text_column(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFKC",
    fix_encoding: bool | str = True,
    clean: bool = True,
    output_col: str | None = None,
) -> DataFrame:
    """Replace (or add, via ``output_col``) a text column with its
    normalized form: codegen clean → mojibake fix → unicode form. With
    ``form=''`` and ``fix_encoding=False`` the op stays entirely
    JVM-side (zero python) — the cheap hygiene-only configuration."""
    out = output_col or text_col
    c: Column = F.col(text_col)
    if clean:
        c = clean_text_expr(c)
    if fix_encoding or form:
        c = normalize_udf(c, form=form, fix_encoding=fix_encoding)
    return df.withColumn(out, c)
