"""Byte-pair-encoding tokenizer TRAINING + encoding over a Spark corpus
(SURVEY.md §2.B.11 — tokenizer training is the step a training-data
pipeline runs right after curation; `q_tokenize_bpe`'s regex counter
budgets tokens, this module actually LEARNS the merges).

Algorithm: Sennrich et al. 2016 ("Neural Machine Translation of Rare
Words with Subword Units") merge learning, with GPT-2's pre-tokenizer
convention (space-prefixed pre-tokens instead of an end-of-word
marker — merges can never cross a word boundary because encoding is
per pre-token, and the leading-space convention makes " the" and
"the" distinct learnable units exactly like GPT-2's BPE).

Architecture — the standard two-tier trainer shape (SentencePiece and
HF tokenizers train the same way), re-expressed Spark-first:

- CORPUS side (the only part that scales with data): pre-tokenize
  with the same `BPE_RE` the declared q_tokenize_bpe query uses and
  aggregate WORD-TYPE COUNTS — one explode + one map-side-combined
  shuffle. The result is word-TYPE-sized (Heaps' law: ~10^6-10^7
  types at 100 TB), not corpus-sized.
- BOUND the driver dictionary: `min_count` floor plus a
  `max_word_types` cap taken by (count desc, word asc) — the
  deterministic equivalent of HF's `min_frequency`/`limit_alphabet`
  bounding. Rare tail types barely influence merge counts; dropping
  them is the documented trade every production trainer makes.
- DRIVER side: the classic merge loop over the bounded word-count
  dict with INCREMENTAL pair-count maintenance (only words containing
  the merged pair are touched per round) — O(merges × affected
  types), independent of corpus size.
- ENCODE side: merge ranks broadcast (SparkContext.broadcast — one
  copy per executor, not per task), applied by an Arrow-batched
  pandas UDF running the standard greedy lowest-rank merge ("bpe()"
  in the GPT-2 reference code) with a per-batch word cache — Zipf
  makes the cache hit rate extreme, so encoding cost ~ distinct
  words per batch, not tokens.

Determinism contract: merge selection tie-breaks (count desc, pair
lexicographic asc); vocabulary ids are (single symbols sorted, then
merge outputs in merge order). Two trainings over the same corpus
produce identical artifacts on any cluster layout, because the only
corpus-side op is an exact count aggregate.
"""

from __future__ import annotations

import json
import unicodedata
from dataclasses import dataclass
from heapq import heapify, heappop, heappush

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.functions.text import bpe_tokens_expr

__all__ = [
    "BPETokenizer",
    "bpe_pretokens_py",
    "bpe_word",
    "learn_bpe",
    "train_bpe",
    "word_type_counts",
]

_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")

# Java `\s` WITHOUT UNICODE_CHARACTER_CLASS is ASCII-only
# [ \t\n\x0B\f\r] (and RE2's matches); Python's str.isspace() also
# admits NBSP/U+2028/... which the engines classify into the
# `[^\s\p{L}\p{N}]` run instead — so the twin pins the Java set.
_WS = frozenset(" \t\n\x0b\x0c\r")


def _runclass(ch: str) -> str:
    """L(etter run) / N(umber run) / O(ther run) / W(hitespace) with
    the engines' semantics: Java `\\p{L}`/`\\p{N}` are the Unicode L*
    and N* general categories; whitespace is the ASCII `\\s` set."""
    if ch in _WS:
        return "W"
    k = unicodedata.category(ch)[0]
    return k if k in ("L", "N") else "O"


def bpe_pretokens_py(text: str) -> list[str]:
    """Pure-Python twin of ``text.BPE_RE`` (the Java/RE2 GPT-2-style
    pre-tokenizer): contraction | ` ?letters+` | ` ?digits+` |
    ` ?other+` | `\\s+`, scanned left-to-right with the regex
    engine's leftmost-alternation precedence. Two precedence facts
    the scanner reproduces exactly: a contraction only wins when the
    match STARTS at the apostrophe (a greedy other-run swallows
    apostrophes mid-run: ``!!!'s`` -> ``!!!'``, ``s``); and a single
    SPACE binds to a following run (`` ?``) while any longer/other
    whitespace falls to `\\s+`, which then greedily eats the space
    before a word (``a  b`` -> ``a``, ``"  "``, ``b``). Parity with
    the Spark-side regex is pinned in tests over multilingual input
    (same caveat as ``word_tokens_py``: codepoints newly assigned
    between engines' Unicode table versions can differ — a
    divergence independent of this scanner)."""
    out: list[str] = []
    i, n = 0, len(text or "")
    while i < n:
        # alternative 1: contraction (no leading space in BPE_RE)
        for c in _CONTRACTIONS:
            if text.startswith(c, i):
                out.append(c)
                i += len(c)
                break
        else:
            ch = text[i]
            start = i
            if ch == " " and i + 1 < n and _runclass(text[i + 1]) != "W":
                # ` ?X+`: the single space binds to the run after it
                i += 1
                ch = text[i]
            k = _runclass(ch)
            if k == "W":
                j = i
                while j < n and _runclass(text[j]) == "W":
                    j += 1
            else:
                j = i
                while j < n and _runclass(text[j]) == k:
                    j += 1
            out.append(text[start:j])
            i = j
    return out


def word_type_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, count) over the corpus — the ONLY corpus-scale stage of
    BPE training: one explode + one map-side-combined shuffle, output
    is word-type-sized."""
    return (
        docs.select(F.explode(bpe_tokens_expr(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("count"))
    )


def learn_bpe(
    word_counts: dict[str, int],
    num_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-type count dict, with
    incremental pair-count maintenance via a lazy-deletion max-heap:
    each round pops the true-max pair (stale heap entries are
    discarded by comparing against the live count), merges it in only
    the words that contain it, and pushes the locally changed pair
    counts. Tie-break: (count desc, pair asc) — deterministic.

    Stops early when no pair reaches ``min_pair_count`` (merging
    singleton pairs just memorizes whole rare words)."""
    words: list[list[str]] = []
    counts: list[int] = []
    for w, c in word_counts.items():
        if c > 0 and len(w) > 0:
            words.append(list(w))
            counts.append(int(c))

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, syms in enumerate(words):
        c = counts[idx]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(idx)

    # heap of (-count, pair); lazy deletion — an entry is valid only
    # if its count still matches pair_counts.
    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in pair_counts.items()
    ]
    heapify(heap)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        while heap:
            negc, p = heappop(heap)
            if pair_counts.get(p, 0) == -negc and -negc >= min_pair_count:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        touched: dict[tuple[str, str], int] = {}
        for idx in sorted(pair_words.get(best, ())):
            syms = words[idx]
            c = counts[idx]
            # remove this word's contribution to all its pairs
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= c
                touched[(a, b)] = pair_counts[(a, b)]
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                    pair_words.pop((a, b), None)
            # apply the merge left-to-right
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = out
            # add back the new pairs
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                touched[(a, b)] = pair_counts[(a, b)]
                pair_words.setdefault((a, b), set()).add(idx)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
        touched.pop(best, None)
        for p, c in touched.items():
            if c > 0:
                heappush(heap, (-c, p))
    return merges


def bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge of one pre-token — the standard
    ``bpe()`` encoder loop (GPT-2 reference shape): repeatedly merge
    the present pair with the SMALLEST merge rank until none of the
    learned merges applies. Rank ties cannot occur (ranks are a
    bijection), so encoding is deterministic."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank = None
        best_pair = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@dataclass(frozen=True)
class BPETokenizer:
    """Learned artifact: ordered merges + deterministic vocab.
    ``vocab`` maps token -> id with ids assigned (single symbols in
    sorted order, then merge outputs in merge order — GPT-2's vocab
    layout); encode-time symbols outside the vocab map to id -1
    (caller decides UNK policy; they can only be characters never
    seen in training)."""

    merges: tuple[tuple[str, str], ...]
    vocab: dict[str, int]

    @staticmethod
    def from_merges(
        merges: list[tuple[str, str]], alphabet: set[str]
    ) -> "BPETokenizer":
        vocab: dict[str, int] = {}
        for s in sorted(alphabet):
            vocab[s] = len(vocab)
        for a, b in merges:
            tok = a + b
            if tok not in vocab:
                vocab[tok] = len(vocab)
        return BPETokenizer(tuple((a, b) for a, b in merges), vocab)

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {p: i for i, p in enumerate(self.merges)}

    # ---- driver-side encode (reference + tests) ----
    def encode_word(self, word: str) -> list[str]:
        return bpe_word(word, self.ranks)

    def encode_text(self, text: str) -> list[str]:
        ranks = self.ranks
        out: list[str] = []
        for w in bpe_pretokens_py(text):
            out.extend(bpe_word(w, ranks))
        return out

    # ---- Spark-side encode ----
    def encode_udf(self, spark: SparkSession):
        """array<string> tokens per text value, Arrow-batched. The
        merge table rides an explicit SparkContext.broadcast (one
        copy per executor); per-batch word cache exploits Zipf."""
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
                        got = bpe_word(w, ranks)
                        cache[w] = got
                    toks.extend(got)
                return toks

            return texts.map(one)

        return pandas_udf(_encode, "array<string>")

    def encode_col(self, spark: SparkSession, col: str | Column) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return self.encode_udf(spark)(c)

    def id_table(self, spark: SparkSession) -> DataFrame:
        """(token, token_id) as a DataFrame — the broadcast-join side
        for mapping encoded tokens to ids corpus-side."""
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
                    "merges": [list(p) for p in self.merges],
                    "vocab": self.vocab,
                },
                f,
                ensure_ascii=False,
            )

    @staticmethod
    def load(path: str) -> "BPETokenizer":
        with open(path, encoding="utf-8") as f:
            d = json.load(f)
        return BPETokenizer(
            tuple((a, b) for a, b in d["merges"]), dict(d["vocab"])
        )


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    min_pair_count: int = 2,
    max_word_types: int = 1_000_000,
) -> BPETokenizer:
    """End-to-end trainer: corpus word-type counts (one shuffle) ->
    bounded driver dict -> merge learning. The collect is capped at
    ``max_word_types`` rows taken by (count desc, word asc) — the
    deterministic production bound; at 100 TB the word-type table is
    the thing you cap, never the corpus."""
    wc = word_type_counts(docs, text_col)
    if min_count > 1:
        wc = wc.filter(F.col("count") >= min_count)
    rows = (
        wc.orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_word_types)
        .collect()
    )
    word_counts = {r["word"]: r["count"] for r in rows}
    merges = learn_bpe(word_counts, num_merges, min_pair_count)
    alphabet = {ch for w in word_counts for ch in w}
    return BPETokenizer.from_merges(merges, alphabet)
