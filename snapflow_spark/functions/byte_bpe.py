"""Byte-level BPE — the GPT-2 tokenizer recipe (Radford et al. 2019,
"Language Models are Unsupervised Multitask Learners"), the production
default for modern LLM training runs and the missing member of the
repo's tokenizer family (char-BPE / unigram / WordPiece live in
bpe.py / unigram.py / wordpiece.py).

Why byte level: the base alphabet is ALL 256 byte values, so **no
input can ever be out-of-vocabulary** — no unicode normalization
coupling, no unknown-character id -1, and encoding round-trips
ARBITRARY bytes losslessly (invalid UTF-8 included). Char-level BPE's
OOV story ("characters never seen in training") disappears by
construction.

The public GPT-2 recipe, re-expressed on the repo's existing trainer
architecture:

- **byte<->unicode table** (``bytes_to_unicode``): BPE merge learning
  and the artifact JSON want printable symbols, so every byte maps to
  a VISIBLE unicode codepoint — printable latin-1 bytes map to
  themselves, the rest (controls, space, DEL, 0xAD) map to 256+n in
  first-gap order. A bijection, so decode is exact.
- **pre-tokenization**: the same GPT-2 regex the char trainer uses
  (``text.BPE_RE`` corpus-side, ``bpe.bpe_pretokens_py`` driver-side)
  — merges never cross word boundaries. Each pre-token is UTF-8
  encoded and byte-mapped; merges are learned over BYTE sequences.
- **corpus side is SHARED with the char trainer**: ``word_type_counts``
  (one explode + one map-side-combined shuffle, word-TYPE-sized
  output) is the only corpus-scale stage; the byte mapping happens
  driver-side on the bounded word-type dict (UTF-8 is injective, so
  distinct words stay distinct and counts never collide).
- **arbitrary-bytes path**: ``encode_bytes`` decodes input with
  ``surrogateescape`` (each invalid byte becomes a lone surrogate,
  reversibly), pre-tokenizes, and re-encodes each pre-token with
  ``surrogateescape`` — identity on valid UTF-8, lossless on garbage.
  ``decode_bytes`` is the exact inverse: concatenate tokens, unmap,
  done.

Vocabulary ids are deterministic: the 256 byte symbols first in BYTE
order, then merge outputs in merge order — same convention as the
char artifact ("single symbols, then merges"), with the byte order
replacing the sort because the base alphabet is fixed.

Scale shape: identical to the char trainer's (SCALE.md §tokenizer) —
the corpus pays one shuffle for word-type counts; the merge loop is
O(merges x affected types) on the driver; encode is one Arrow-batched
UDF with a Zipf-exploiting per-batch word cache and the merge table on
an executor-wide broadcast.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.functions.bpe import (
    bpe_pretokens_py,
    bpe_word,
    learn_bpe,
    word_type_counts,
)

__all__ = [
    "ByteBPETokenizer",
    "bytes_to_unicode",
    "learn_byte_bpe",
    "train_byte_bpe",
    "unicode_to_bytes",
]


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte->visible-unicode table: bytes that are printable
    in latin-1 (``!``..``~``, ``¡``..``¬``, ``®``..``ÿ``) map to
    themselves; the remaining 68 (controls, space, DEL, soft hyphen)
    map to U+0100.. in ascending-byte order. Bijective by
    construction: the escape range 256..323 is disjoint from the
    printable set."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    table: dict[int, str] = {b: chr(b) for b in printable}
    n = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + n)
            n += 1
    return table


@lru_cache(maxsize=1)
def unicode_to_bytes() -> dict[str, int]:
    return {c: b for b, c in bytes_to_unicode().items()}


def _map_word_bytes(raw: bytes) -> str:
    table = bytes_to_unicode()
    return "".join(table[b] for b in raw)


def _map_word(word: str) -> str:
    """Pre-token string -> byte-symbol string (UTF-8 then table).
    ``surrogateescape`` lets lone surrogates (the reversible stand-in
    for invalid input bytes) re-emit their original byte."""
    return _map_word_bytes(word.encode("utf-8", "surrogateescape"))


def learn_byte_bpe(
    word_counts: dict[str, int],
    num_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Merge learning over a word-type count dict in BYTE-symbol
    space: map each word through UTF-8 + the byte table (injective —
    counts never collide), then run the shared incremental-heap merge
    loop (bpe.learn_bpe). Tie-break and determinism contract are
    inherited unchanged."""
    mapped = {_map_word(w): c for w, c in word_counts.items()}
    return learn_bpe(mapped, num_merges, min_pair_count)


@dataclass(frozen=True)
class ByteBPETokenizer:
    """Learned artifact: ordered merges over byte symbols + the
    deterministic vocab (256 byte symbols in byte order, then merge
    outputs in merge order). Every possible input byte is in the base
    alphabet, so **encode never produces an unknown symbol** — the
    byte-level guarantee."""

    merges: tuple[tuple[str, str], ...]
    vocab: dict[str, int]
    specials: tuple[str, ...] = ()

    @staticmethod
    def from_merges(
        merges: list[tuple[str, str]], specials: tuple[str, ...] = ()
    ) -> "ByteBPETokenizer":
        """``specials``: reserved control tokens (the GPT-2
        ``<|endoftext|>`` convention) appended AFTER the merge vocab
        with dedicated ids. They are unreachable from bytes (encode
        never emits one for ordinary text — their literal spelling
        byte-encodes like any other text), and
        ``encode_ids_with_specials`` splits on them explicitly, which
        is the standard document-separator path."""
        table = bytes_to_unicode()
        vocab: dict[str, int] = {table[b]: b for b in range(256)}
        for a, b in merges:
            tok = a + b
            if tok not in vocab:
                vocab[tok] = len(vocab)
        for sp in specials:
            if sp in vocab:
                raise ValueError(f"special token collides with vocab: {sp!r}")
            vocab[sp] = len(vocab)
        return ByteBPETokenizer(
            tuple((a, b) for a, b in merges), vocab, tuple(specials)
        )

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {p: i for i, p in enumerate(self.merges)}

    # ---- driver-side encode/decode (reference + tests) ----
    def encode_bytes(self, raw: bytes) -> list[str]:
        """Tokens (byte-symbol strings) for ARBITRARY bytes — valid
        UTF-8 or not. Lossless: ``decode_bytes(encode_bytes(x)) == x``
        for every byte string."""
        text = raw.decode("utf-8", "surrogateescape")
        ranks = self.ranks
        out: list[str] = []
        for w in bpe_pretokens_py(text):
            out.extend(bpe_word(_map_word(w), ranks))
        return out

    def encode_text(self, text: str) -> list[str]:
        return self.encode_bytes((text or "").encode("utf-8", "surrogateescape"))

    def encode_ids(self, text: str) -> list[int]:
        v = self.vocab
        return [v[t] for t in self.encode_text(text)]

    def decode_bytes(self, tokens: list[str]) -> bytes:
        inv = unicode_to_bytes()
        return bytes(inv[c] for t in tokens for c in t)

    def decode_text(self, tokens: list[str]) -> str:
        """Best-effort text view of decoded bytes (exact for tokens
        that came from valid UTF-8; surrogateescape round-trips the
        rest back to their original bytes first)."""
        return self.decode_bytes(tokens).decode("utf-8", "surrogateescape")

    def decode_ids(self, ids: list[int]) -> bytes:
        by_id = {i: t for t, i in self.vocab.items()}
        special = set(self.specials)
        out = bytearray()
        for i in ids:
            t = by_id[i]
            if t in special:
                # specials decode to their literal UTF-8 spelling —
                # the lossless round trip includes the separators
                out += t.encode("utf-8")
            else:
                out += self.decode_bytes([t])
        return bytes(out)

    def encode_ids_with_specials(self, text: str) -> list[int]:
        """Encode ids, recognizing special-token SPELLINGS in the text
        as their reserved ids (the document-separator path: join docs
        with ``<|endoftext|>`` and the boundary stays one token).
        Without specials this is exactly ``encode_ids``."""
        if not self.specials:
            return self.encode_ids(text)
        import re

        # Longest first: regex alternation is first-match, so a special
        # that is a prefix of another (e.g. '<|eot|>' vs '<|eot|>x')
        # must not shadow the longer spelling.
        pattern = "|".join(
            re.escape(s) for s in sorted(self.specials, key=len, reverse=True)
        )
        v = self.vocab
        out: list[int] = []
        pos = 0
        for m in re.finditer(pattern, text or ""):
            out.extend(v[t] for t in self.encode_text(text[pos : m.start()]))
            out.append(v[m.group(0)])
            pos = m.end()
        out.extend(v[t] for t in self.encode_text((text or "")[pos:]))
        return out

    # ---- Spark-side encode ----
    def encode_udf(self, spark: SparkSession):
        """array<string> tokens per TEXT value, Arrow-batched; merge
        table on an executor-wide broadcast, per-batch pre-token cache
        (Zipf: cost ~ distinct words per batch, not tokens)."""
        from pyspark.sql.functions import pandas_udf

        bc = spark.sparkContext.broadcast(list(self.merges))

        def _encode(texts: pd.Series) -> pd.Series:
            ranks = {tuple(p): i for i, p in enumerate(bc.value)}
            cache: dict[str, list[str]] = {}

            def one(t):
                toks: list[str] = []
                for w in bpe_pretokens_py(t or ""):
                    got = cache.get(w)
                    if got is None:
                        got = bpe_word(_map_word(w), ranks)
                        cache[w] = got
                    toks.extend(got)
                return toks

            return texts.map(one)

        return pandas_udf(_encode, "array<string>")

    def encode_col(self, spark: SparkSession, col: str | Column) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return self.encode_udf(spark)(c)

    def encode_binary_udf(self, spark: SparkSession):
        """array<string> tokens per BINARY value — the arbitrary-bytes
        path as a column (payloads that never were text: the sniffed
        'unknown' tier, mixed-encoding salvage). Same broadcast/cache
        shape as the text UDF."""
        from pyspark.sql.functions import pandas_udf

        bc = spark.sparkContext.broadcast(list(self.merges))

        def _encode(blobs: pd.Series) -> pd.Series:
            ranks = {tuple(p): i for i, p in enumerate(bc.value)}
            cache: dict[str, list[str]] = {}

            def one(raw):
                if raw is None:
                    return []
                text = bytes(raw).decode("utf-8", "surrogateescape")
                toks: list[str] = []
                for w in bpe_pretokens_py(text):
                    got = cache.get(w)
                    if got is None:
                        got = bpe_word(_map_word(w), ranks)
                        cache[w] = got
                    toks.extend(got)
                return toks

            return blobs.map(one)

        return pandas_udf(_encode, "array<string>")

    def encode_binary_col(
        self, spark: SparkSession, col: str | Column
    ) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return self.encode_binary_udf(spark)(c)

    def id_table(self, spark: SparkSession) -> DataFrame:
        """(token, token_id) DataFrame — the broadcast-join side for
        id mapping and tokenizer_stats coverage (OOV is structurally
        zero here; the join is the shared contract)."""
        return spark.createDataFrame(
            sorted(self.vocab.items(), key=lambda kv: kv[1]),
            "token string, token_id int",
        )

    # ---- persistence (tokenizer.json-style artifact) ----
    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "version": 1,
                    "kind": "byte_bpe",
                    "merges": [list(p) for p in self.merges],
                    "vocab": self.vocab,
                    "specials": list(self.specials),
                },
                f,
                ensure_ascii=False,
            )

    @staticmethod
    def load(path: str) -> "ByteBPETokenizer":
        with open(path, encoding="utf-8") as f:
            d = json.load(f)
        if d.get("kind") != "byte_bpe":
            raise ValueError(f"not a byte_bpe artifact: {path}")
        return ByteBPETokenizer(
            tuple((a, b) for a, b in d["merges"]),
            dict(d["vocab"]),
            tuple(d.get("specials", ())),
        )


def train_byte_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    min_pair_count: int = 2,
    max_word_types: int = 1_000_000,
    specials: tuple[str, ...] = (),
) -> ByteBPETokenizer:
    """End-to-end trainer — the char trainer's exact architecture with
    the byte mapping inserted driver-side: corpus word-type counts
    (ONE shuffle, shared stage with train_bpe) -> bounded
    deterministic dict (count desc, word asc) -> byte-space merge
    learning. The base alphabet is always all 256 bytes regardless of
    what the corpus contained — the no-OOV guarantee is independent
    of training data."""
    wc = word_type_counts(docs, text_col)
    if min_count > 1:
        wc = wc.filter(F.col("count") >= min_count)
    rows = (
        wc.orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_word_types)
        .collect()
    )
    word_counts = {r["word"]: r["count"] for r in rows}
    merges = learn_byte_bpe(word_counts, num_merges, min_pair_count)
    return ByteBPETokenizer.from_merges(merges, specials=specials)
