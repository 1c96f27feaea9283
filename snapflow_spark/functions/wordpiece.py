"""WordPiece tokenizer training + encoding (Schuster & Nakajima 2012;
the BERT tokenizer; Wu et al. 2016 §4.1) — completing the trained-
tokenizer family next to BPE (functions/bpe.py) and unigram-LM
(functions/unigram.py).

WordPiece differs from BPE in exactly one training decision and one
encoding decision, both pinned here:

- TRAINING picks the merge maximizing the LIKELIHOOD gain
  ``score(a,b) = count(ab) / (count(a) * count(b))`` instead of the
  raw pair count — a pair of rare-but-always-together symbols beats a
  pair of ubiquitous ones (the distinguishing case the tests pin).
  Non-initial symbols carry the ``##`` continuation prefix, so merges
  never cross word starts. Tie-break: (score desc, pair asc) — fully
  deterministic.
- ENCODING is greedy longest-match-first (MaxMatch) against the
  VOCAB, not merge replay: per word, take the longest prefix (with
  ``##`` when not at word start) present in the vocab; a word with
  any unmatched position — or longer than ``max_chars`` — encodes to
  the single ``[UNK]`` token (BERT's rule: no partial salvage).

Pre-tokenization reuses the engine's GPT-2-style scanner
(``bpe_pretokens_py`` / ``text.BPE_RE``) with whitespace runs dropped
and the bound leading space stripped — one pre-tokenizer across all
three trainers keeps their vocabularies comparable
(functions/tokenizer_eval.py compares them on equal footing).

Scale shape is the family's: ``word_type_counts`` (one explode + one
map-side-combined shuffle to the word-TYPE table) is the only
corpus-scale stage; learning runs on the bounded driver dict via the
same lazy-deletion max-heap as learn_bpe, keyed by score; encoding
broadcasts the vocab once per executor and caches per-batch words
(Zipf makes the cache hit rate the point).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from heapq import heapify, heappop, heappush

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.functions.bpe import bpe_pretokens_py, word_type_counts

__all__ = [
    "WordPieceTokenizer",
    "learn_wordpiece",
    "train_wordpiece",
    "wordpiece_word",
]

UNK = "[UNK]"


def wp_pretokens_py(text: str) -> list[str]:
    """WordPiece's word stream: the shared GPT-2-style scanner with
    whitespace runs dropped and the bound leading space stripped."""
    out = []
    for t in bpe_pretokens_py(text or ""):
        t = t.lstrip(" ")
        if t and not t.isspace():
            out.append(t)
    return out


def _word_symbols(w: str) -> list[str]:
    return [w[0], *("##" + ch for ch in w[1:])]


def learn_wordpiece(
    word_counts: dict[str, int],
    num_merges: int,
    min_pair_count: int = 2,
) -> list[str]:
    """Likelihood-scored merge learning over a word-type count dict →
    the learned vocab EXTENSION (merged tokens in merge order; the
    alphabet and [UNK] are added by the tokenizer constructor).

    Same incremental lazy-deletion heap as learn_bpe, but the key is
    ``count(ab) / (count(a)·count(b))``, so SYMBOL counts are
    maintained alongside pair counts and every pair whose endpoint
    counts changed is re-pushed (its score moved even if its own
    count didn't)."""
    words: list[list[str]] = []
    counts: list[int] = []
    for w, c in word_counts.items():
        if c > 0 and len(w) > 0:
            words.append(_word_symbols(w))
            counts.append(int(c))

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    sym_counts: dict[str, int] = {}
    # symbol -> live pairs containing it: scores depend on GLOBAL
    # symbol counts, so a merge re-scores every pair sharing a symbol
    # with it — this index makes that re-push O(affected), not O(all)
    sym_pairs: dict[str, set[tuple[str, str]]] = {}

    def _index(p: tuple[str, str]) -> None:
        sym_pairs.setdefault(p[0], set()).add(p)
        sym_pairs.setdefault(p[1], set()).add(p)

    def _unindex(p: tuple[str, str]) -> None:
        for s in p:
            ps = sym_pairs.get(s)
            if ps is not None:
                ps.discard(p)

    for idx, syms in enumerate(words):
        c = counts[idx]
        for s in syms:
            sym_counts[s] = sym_counts.get(s, 0) + c
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(idx)
            _index(p)

    def score(p: tuple[str, str], c: int) -> float:
        return c / (sym_counts[p[0]] * sym_counts[p[1]])

    # heap of (-score, pair); lazy deletion — an entry is valid only
    # if its score still matches the live counts.
    heap: list[tuple[float, tuple[str, str]]] = [
        (-score(p, c), p) for p, c in pair_counts.items()
    ]
    heapify(heap)

    merged_tokens: list[str] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        while heap:
            negs, p = heappop(heap)
            c = pair_counts.get(p, 0)
            if c > 0 and c >= min_pair_count and -negs == score(p, c):
                best = p
                break
        if best is None:
            break
        a, b = best
        merged = a + b[2:]
        merged_tokens.append(merged)
        touched: set[tuple[str, str]] = set()
        for idx in sorted(pair_words.get(best, ())):
            syms = words[idx]
            c = counts[idx]
            for s in syms:
                sym_counts[s] -= c
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                touched.add(p)
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                    pair_words.pop(p, None)
                    _unindex(p)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = out
            for s in out:
                sym_counts[s] = sym_counts.get(s, 0) + c
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                touched.add(p)
                pair_words.setdefault(p, set()).add(idx)
                _index(p)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
        _unindex(best)
        touched.discard(best)
        # pairs sharing a symbol with the merge shift score even in
        # untouched words (their endpoint's GLOBAL count moved) — the
        # index hands us exactly those
        for s in (a, b, merged):
            touched.update(sym_pairs.get(s, ()))
        for p in touched:
            c = pair_counts.get(p, 0)
            if c > 0:
                heappush(heap, (-score(p, c), p))
    return merged_tokens


def wordpiece_word(
    word: str, vocab: set[str] | dict, max_chars: int = 100
) -> list[str]:
    """Greedy longest-match-first encode of one word; [UNK] when any
    position has no vocab match or the word exceeds max_chars."""
    if not word or len(word) > max_chars:
        return [UNK]
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = n
        hit = None
        while j > i:
            piece = word[i:j] if i == 0 else "##" + word[i:j]
            if piece in vocab:
                hit = piece
                break
            j -= 1
        if hit is None:
            return [UNK]
        out.append(hit)
        i = j
    return out


@dataclass(frozen=True)
class WordPieceTokenizer:
    """Learned artifact: token -> id. Ids are assigned [UNK] = 0,
    then initial + ## alphabet symbols in sorted order, then merged
    tokens in merge order (BERT-style layout, minus the reserved
    specials a model would prepend)."""

    vocab: dict[str, int]
    max_chars: int = 100

    @staticmethod
    def from_parts(
        alphabet: set[str], merged: list[str], max_chars: int = 100
    ) -> "WordPieceTokenizer":
        vocab: dict[str, int] = {UNK: 0}
        for s in sorted(alphabet) + sorted("##" + s for s in alphabet):
            if s not in vocab:
                vocab[s] = len(vocab)
        for t in merged:
            if t not in vocab:
                vocab[t] = len(vocab)
        return WordPieceTokenizer(vocab, max_chars)

    # ---- driver-side encode (reference + tests) ----
    def encode_word(self, word: str) -> list[str]:
        return wordpiece_word(word, self.vocab, self.max_chars)

    def encode_text(self, text: str) -> list[str]:
        out: list[str] = []
        for w in wp_pretokens_py(text):
            out.extend(wordpiece_word(w, self.vocab, self.max_chars))
        return out

    # ---- Spark-side encode ----
    def encode_udf(self, spark: SparkSession):
        from pyspark.sql.functions import pandas_udf

        bc = spark.sparkContext.broadcast((set(self.vocab), self.max_chars))

        def _encode(texts: pd.Series) -> pd.Series:
            vocab, mc = bc.value
            cache: dict[str, list[str]] = {}

            def one(t):
                toks: list[str] = []
                for w in wp_pretokens_py(t or ""):
                    got = cache.get(w)
                    if got is None:
                        got = wordpiece_word(w, vocab, mc)
                        cache[w] = got
                    toks.extend(got)
                return toks

            return texts.map(one)

        return pandas_udf(_encode, "array<string>")

    def encode_col(self, spark: SparkSession, col: str | Column) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return self.encode_udf(spark)(c)

    def id_table(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [(t, i) for t, i in self.vocab.items()],
            "token string, token_id bigint",
        )

    # ---- persistence ----
    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "version": 1,
                    "kind": "wordpiece",
                    "vocab": self.vocab,
                    "max_chars": self.max_chars,
                },
                f,
                ensure_ascii=False,
            )

    @staticmethod
    def load(path: str) -> "WordPieceTokenizer":
        with open(path, encoding="utf-8") as f:
            d = json.load(f)
        return WordPieceTokenizer(dict(d["vocab"]), int(d.get("max_chars", 100)))


def train_wordpiece(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    min_pair_count: int = 2,
    max_word_types: int = 1_000_000,
    max_chars: int = 100,
) -> WordPieceTokenizer:
    """End-to-end trainer, same shape as train_bpe: corpus word-type
    counts (one shuffle) -> bounded driver dict (count desc, word asc
    — the deterministic production cap) -> likelihood-scored merge
    learning. The word stream drops whitespace and leading spaces on
    the driver dict (bounded work) so the three trainers share ONE
    corpus-scale counting stage."""
    wc = word_type_counts(docs, text_col)
    if min_count > 1:
        wc = wc.filter(F.col("count") >= min_count)
    rows = (
        wc.orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_word_types)
        .collect()
    )
    word_counts: dict[str, int] = {}
    for r in rows:
        w = r["word"].lstrip(" ")
        if w and not w.isspace():
            word_counts[w] = word_counts.get(w, 0) + r["count"]
    merged = learn_wordpiece(word_counts, num_merges, min_pair_count)
    alphabet = {ch for w in word_counts for ch in w}
    return WordPieceTokenizer.from_parts(alphabet, merged, max_chars)
