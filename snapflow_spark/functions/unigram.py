"""Unigram-LM (SentencePiece-style) tokenizer TRAINING + encoding over
a Spark corpus (SURVEY.md §2.B.11) — the other half of real tokenizer
tooling next to ``functions.bpe``: where BPE grows a vocabulary bottom-
up by merging, the unigram trainer starts from a large seed of
candidate pieces and PRUNES it down under a unigram language model
(Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates"; the algorithm
SentencePiece ships as ``--model_type=unigram``).

Architecture — the same two-tier shape as ``functions.bpe`` (that
module's docstring carries the full rationale):

- CORPUS side (the only part that scales with data): the SAME
  ``word_type_counts`` aggregate BPE uses — one explode + one
  map-side-combined shuffle, output is word-TYPE-sized (Heaps' law),
  pre-tokenized by the GPT-2-style ``BPE_RE`` with its leading-space
  convention. (SentencePiece proper uses a ``▁``-prefixed whitespace
  pre-tokenizer; this engine deliberately reuses ONE pre-tokenizer
  across both trainers so learned-BPE and learned-unigram token
  counts are comparable over the same corpus — a documented
  divergence, not an accident.)
- DRIVER side, bounded: seed = every substring (length <=
  ``max_piece_len``) of the bounded word-type dict, capped at
  ``seed_size`` by (frequency desc, piece asc), plus all single
  characters (coverage floor). Then the standard EM + prune loop:
  each round runs ``em_iters`` EM steps (expected piece counts via
  the forward-backward lattice over each word type, weighted by type
  count; maximum-likelihood M-step — plain ML rather than
  SentencePiece's Bayesianified digamma smoothing, a documented
  simplification) and prunes the lowest-utility pieces down to
  ``shrink`` of the current size until ``vocab_size`` is reached.
  Prune utility follows the SentencePiece recipe: Viterbi-segment
  every word type under the current model; a piece never used by any
  Viterbi path is dropped first; otherwise
  ``loss(x) = vfreq(x) * (logP(x) - logP(best segmentation of x
  using the OTHER pieces))`` — how much corpus log-likelihood the
  Viterbi paths lose if ``x`` is deleted and its occurrences are
  re-segmented. Single characters are never pruned.
- ENCODE side: Viterbi segmentation (the 1-best of the same lattice)
  with the piece table broadcast once per executor and a per-batch
  word cache riding Zipf — identical conventions to
  ``BPETokenizer.encode_udf``. Characters never seen in training
  segment as themselves with a floor score (lossless encode; they
  map to id -1, caller decides UNK policy — same contract as BPE).

Determinism contract: seed selection, EM iteration order, prune
ordering (loss desc, piece asc) and vocab id assignment (single
symbols sorted, then multi-char pieces by score desc, piece asc) are
all totally ordered — two trainings over the same corpus produce
identical artifacts on any cluster layout, because the only
corpus-side op is an exact count aggregate.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.functions.bpe import bpe_pretokens_py, word_type_counts

__all__ = [
    "UnigramTokenizer",
    "learn_unigram",
    "sample_segment",
    "substring_seed",
    "train_unigram",
    "viterbi_segment",
]

_NEG_INF = float("-inf")


def substring_seed(
    word_counts: dict[str, int],
    max_piece_len: int = 8,
    seed_size: int = 100_000,
) -> dict[str, float]:
    """Candidate pieces with raw occurrence frequencies: every
    substring of every word type up to ``max_piece_len`` chars,
    weighted by the type's count (every occurrence position counts —
    the plain frequent-substring seeding SentencePiece approximates
    with its suffix array). All single characters survive the
    ``seed_size`` cap unconditionally (coverage floor); multi-char
    pieces are capped by (frequency desc, piece asc)."""
    freq: dict[str, float] = {}
    for w, c in word_counts.items():
        if not w or c <= 0:
            continue
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(L, i + max_piece_len) + 1):
                p = w[i:j]
                freq[p] = freq.get(p, 0.0) + c
    singles = {p: f for p, f in freq.items() if len(p) == 1}
    multis = sorted(
        ((p, f) for p, f in freq.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    keep = dict(singles)
    for p, f in multis[: max(0, seed_size - len(singles))]:
        keep[p] = f
    return keep


def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[list[float], list[float]]:
    """Lattice alpha/beta over character positions 0..L: ``alpha[i]``
    = log total probability of all segmentations of ``word[:i]``,
    ``beta[i]`` of ``word[i:]``. Edges are vocabulary pieces."""
    L = len(word)
    alpha = [_NEG_INF] * (L + 1)
    alpha[0] = 0.0
    for i in range(1, L + 1):
        acc = _NEG_INF
        for j in range(max(0, i - max_len), i):
            if alpha[j] == _NEG_INF:
                continue
            lp = logp.get(word[j:i])
            if lp is None:
                continue
            x = alpha[j] + lp
            acc = x if acc == _NEG_INF else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x)))
            )
        alpha[i] = acc
    beta = [_NEG_INF] * (L + 1)
    beta[L] = 0.0
    for i in range(L - 1, -1, -1):
        acc = _NEG_INF
        for j in range(i + 1, min(L, i + max_len) + 1):
            if beta[j] == _NEG_INF:
                continue
            lp = logp.get(word[i:j])
            if lp is None:
                continue
            x = beta[j] + lp
            acc = x if acc == _NEG_INF else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x)))
            )
        beta[i] = acc
    return alpha, beta


def viterbi_segment(
    word: str,
    logp: dict[str, float],
    max_len: int,
    floor: float,
    exclude_full: bool = False,
) -> list[str]:
    """1-best segmentation of ``word`` under the unigram model.
    A character absent from the vocabulary is its own edge at the
    ``floor`` score — segmentation (and therefore encoding) is total
    and lossless for ANY input string. ``exclude_full=True`` bans the
    single edge spanning the whole word — i.e. the best segmentation
    into >= 2 pieces, which IS "segment ``p`` without ``p``" for the
    prune step (a piece can only appear in its own lattice as the
    full-span edge), with no per-candidate dict copy."""
    L = len(word)
    best = [_NEG_INF] * (L + 1)
    back = [0] * (L + 1)
    best[0] = 0.0
    for i in range(1, L + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] == _NEG_INF:
                continue
            if exclude_full and j == 0 and i == L and L > 1:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = floor  # unseen single char
            x = best[j] + lp
            # strict > : ties resolve to the LONGEST last piece
            # (smallest j wins because j ascends and we keep the first
            # maximum) — deterministic either way
            if x > best[i]:
                best[i], back[i] = x, j
    out: list[str] = []
    i = L
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def sample_segment(
    word: str,
    logp: dict[str, float],
    max_len: int,
    floor: float,
    alpha: float = 0.2,
    salt: str = "",
) -> list[str]:
    """Forward-filtering backward-sampling over the segmentation
    lattice — the subword-REGULARIZATION sampler that is the unigram
    model's whole point (Kudo 2018 §3.2: training on sampled
    segmentations instead of the 1-best makes downstream models
    robust to tokenization noise). Draws a segmentation with
    probability proportional to ``P(seg)^alpha`` (``alpha`` is the
    paper's smoothing exponent: 1 = true lattice posterior, -> 0 =
    uniform over segmentations, large = approaches Viterbi).

    DETERMINISTIC: the randomness is seeded from
    ``sha256(salt, word)`` — the same (word, salt) always samples the
    same segmentation, on the driver or any executor, under any
    partitioning (the engine's standard no-``rand()`` contract; vary
    ``salt`` per epoch to resample). Unknown single characters ride
    the ``floor`` score exactly as in ``viterbi_segment``, so
    sampling is total and lossless for any input."""
    import hashlib
    import random

    L = len(word)
    if L == 0:
        return []
    a = float(alpha)
    # forward pass with tempered scores
    alpha_log = [_NEG_INF] * (L + 1)
    alpha_log[0] = 0.0
    for i in range(1, L + 1):
        acc = _NEG_INF
        for j in range(max(0, i - max_len), i):
            if alpha_log[j] == _NEG_INF:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = floor
            x = alpha_log[j] + a * lp
            acc = x if acc == _NEG_INF else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x)))
            )
        alpha_log[i] = acc
    rng = random.Random(
        hashlib.sha256((salt + "\x00" + word).encode()).digest()
    )
    # backward sampling: from position i, pick the last piece with
    # probability alpha[j] * score(piece)^a / alpha[i]
    out: list[str] = []
    i = L
    while i > 0:
        cands: list[tuple[int, str, float]] = []
        for j in range(max(0, i - max_len), i):
            if alpha_log[j] == _NEG_INF:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = floor
            cands.append((j, piece, alpha_log[j] + a * lp))
        m = max(w for _, _, w in cands)
        weights = [math.exp(w - m) for _, _, w in cands]
        tot = sum(weights)
        r = rng.random() * tot
        acc = 0.0
        pick = cands[-1]
        for cand, wt in zip(cands, weights):
            acc += wt
            if r <= acc:
                pick = cand
                break
        out.append(pick[1])
        i = pick[0]
    out.reverse()
    return out


def _em_step(
    words: list[tuple[str, int]],
    logp: dict[str, float],
    max_len: int,
) -> tuple[dict[str, float], float]:
    """One E-step: expected piece counts over all segmentations of
    every word type (forward-backward posteriors × type count) and
    the corpus log-likelihood. Pure driver-side; cost is
    O(types × len × max_len)."""
    expected: dict[str, float] = {}
    loglik = 0.0
    for w, c in words:
        alpha, beta = _forward_backward(w, logp, max_len)
        z = alpha[len(w)]
        if z == _NEG_INF:
            continue  # unsegmentable (cannot happen while singles survive)
        loglik += c * z
        L = len(w)
        for j in range(L):
            if alpha[j] == _NEG_INF:
                continue
            for i in range(j + 1, min(L, j + max_len) + 1):
                lp = logp.get(w[j:i])
                if lp is None or beta[i] == _NEG_INF:
                    continue
                post = math.exp(alpha[j] + lp + beta[i] - z)
                if post > 0.0:
                    p = w[j:i]
                    expected[p] = expected.get(p, 0.0) + c * post
    return expected, loglik


def learn_unigram(
    word_counts: dict[str, int],
    vocab_size: int,
    max_piece_len: int = 8,
    seed_size: int = 100_000,
    em_iters: int = 2,
    shrink: float = 0.75,
    max_rounds: int = 20,
) -> "UnigramTokenizer":
    """EM + prune loop over a word-type count dict (driver-bounded,
    corpus-size-independent — the same contract as ``learn_bpe``).
    Each round: ``em_iters`` EM steps re-estimate piece probabilities
    over ALL segmentations, then the prune step keeps the
    highest-utility ``shrink`` fraction (never below ``vocab_size``,
    never dropping single characters) until the vocabulary fits."""
    words = [
        (w, int(c)) for w, c in word_counts.items() if w and c > 0
    ]
    seed = substring_seed(word_counts, max_piece_len, seed_size)
    if not seed:
        return UnigramTokenizer((), {}, max_piece_len)
    total = sum(seed.values())
    logp = {p: math.log(f / total) for p, f in seed.items()}

    for _ in range(max_rounds):
        for _ in range(em_iters):
            expected, _ll = _em_step(words, logp, max_piece_len)
            tot = sum(expected.values())
            if tot <= 0.0:
                break
            # pieces with no expected mass vanish here (ML M-step)
            logp = {
                p: math.log(e / tot) for p, e in expected.items() if e > 0.0
            }
            # singles must survive as segmentation floor even at zero
            # posterior mass: pin them at a tiny floor score
            floor = min(logp.values()) - 10.0 if logp else -30.0
            for p in seed:
                if len(p) == 1 and p not in logp:
                    logp[p] = floor
        n_multi = sum(1 for p in logp if len(p) > 1)
        n_single = len(logp) - n_multi
        if len(logp) <= max(vocab_size, n_single):
            break
        # ---- prune (SentencePiece recipe, see module docstring) ----
        vfreq: dict[str, float] = {}
        floor = min(logp.values()) - 10.0
        for w, c in words:
            for p in viterbi_segment(w, logp, max_piece_len, floor):
                vfreq[p] = vfreq.get(p, 0.0) + c
        losses: list[tuple[float, str]] = []
        for p in logp:
            if len(p) == 1:
                continue
            f = vfreq.get(p, 0.0)
            if f <= 0.0:
                losses.append((_NEG_INF, p))  # unused: drop first
                continue
            # best alternative segmentation of p WITHOUT p itself
            alt = viterbi_segment(
                p, logp, max_piece_len, floor, exclude_full=True
            )
            alt_score = sum(logp.get(q, floor) for q in alt)
            losses.append((f * (logp[p] - alt_score), p))
        losses.sort(key=lambda t: (-t[0], t[1]))
        keep_multi = max(vocab_size - n_single, int(n_multi * shrink))
        kept = {p for _, p in losses[:keep_multi]}
        logp = {
            p: lp for p, lp in logp.items() if len(p) == 1 or p in kept
        }
        # renormalize after pruning
        z = _logsumexp(list(logp.values()))
        logp = {p: lp - z for p, lp in logp.items()}

    # final EM polish at the target size
    expected, _ll = _em_step(words, logp, max_piece_len)
    tot = sum(expected.values())
    if tot > 0.0:
        polished = {
            p: math.log(e / tot)
            for p, e in expected.items()
            if e > 0.0 and p in logp
        }
        floor = min(polished.values()) - 10.0 if polished else -30.0
        for p in logp:
            if len(p) == 1 and p not in polished:
                polished[p] = floor
        z = _logsumexp(list(polished.values()))
        logp = {p: lp - z for p, lp in polished.items()}
    pieces = tuple(
        sorted(logp.items(), key=lambda kv: (len(kv[0]) > 1, kv[0]))
    )
    return UnigramTokenizer(pieces, dict(pieces), max_piece_len)


def _logsumexp(xs: list[float]) -> float:
    m = max(xs)
    if m == _NEG_INF:
        return _NEG_INF
    return m + math.log(sum(math.exp(x - m) for x in xs))


@dataclass(frozen=True)
class UnigramTokenizer:
    """Learned artifact: (piece, log-prob) pairs + the lattice width.
    ``vocab`` maps piece -> id with ids assigned (single symbols in
    sorted order, then multi-char pieces by score desc, piece asc —
    mirrors ``BPETokenizer``'s layout rule); encode-time symbols
    outside the vocab map to id -1 (they can only be characters never
    seen in training)."""

    pieces: tuple[tuple[str, float], ...]
    logp: dict[str, float]
    max_piece_len: int

    @property
    def vocab(self) -> dict[str, int]:
        singles = sorted(p for p, _ in self.pieces if len(p) == 1)
        multis = sorted(
            ((p, lp) for p, lp in self.pieces if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        out = {p: i for i, p in enumerate(singles)}
        for p, _ in multis:
            out[p] = len(out)
        return out

    @property
    def _floor(self) -> float:
        return (
            min(self.logp.values()) - 10.0 if self.logp else -30.0
        )

    # ---- driver-side encode (reference + tests) ----
    def encode_word(self, word: str) -> list[str]:
        return viterbi_segment(
            word, self.logp, self.max_piece_len, self._floor
        )

    def encode_text(self, text: str) -> list[str]:
        out: list[str] = []
        for w in bpe_pretokens_py(text):
            out.extend(self.encode_word(w))
        return out

    # ---- subword-regularization sampling (Kudo 2018 §3.2) ----
    def sample_word(
        self, word: str, alpha: float = 0.2, salt: str = ""
    ) -> list[str]:
        return sample_segment(
            word, self.logp, self.max_piece_len, self._floor, alpha, salt
        )

    def sample_text(
        self, text: str, alpha: float = 0.2, salt: str = ""
    ) -> list[str]:
        out: list[str] = []
        for w in bpe_pretokens_py(text):
            out.extend(self.sample_word(w, alpha, salt))
        return out

    def sample_udf(self, spark: SparkSession, alpha: float = 0.2, salt: str = ""):
        """Sampled-segmentation encode, Arrow-batched — vary ``salt``
        per training epoch to draw fresh segmentations corpus-wide
        while staying deterministic under any partitioning (the seed
        is sha256(salt, word), so the per-batch word cache stays
        VALID: same word + salt -> same sample)."""
        from pyspark.sql.functions import pandas_udf

        bc = spark.sparkContext.broadcast(
            (dict(self.logp), self.max_piece_len, self._floor)
        )
        a, s = float(alpha), str(salt)

        def _encode(texts: pd.Series) -> pd.Series:
            logp, max_len, floor = bc.value
            cache: dict[str, list[str]] = {}

            def one(t):
                toks: list[str] = []
                for w in bpe_pretokens_py(t or ""):
                    got = cache.get(w)
                    if got is None:
                        got = sample_segment(w, logp, max_len, floor, a, s)
                        cache[w] = got
                    toks.extend(got)
                return toks

            return texts.map(one)

        return pandas_udf(_encode, "array<string>")

    # ---- Spark-side encode ----
    def encode_udf(self, spark: SparkSession):
        """array<string> pieces per text value, Arrow-batched; piece
        table broadcast once per executor, per-batch word cache
        (Zipf) — same conventions as ``BPETokenizer.encode_udf``."""
        from pyspark.sql.functions import pandas_udf

        bc = spark.sparkContext.broadcast(
            (dict(self.logp), self.max_piece_len, self._floor)
        )

        def _encode(texts: pd.Series) -> pd.Series:
            logp, max_len, floor = bc.value
            cache: dict[str, list[str]] = {}

            def one(t):
                toks: list[str] = []
                for w in bpe_pretokens_py(t or ""):
                    got = cache.get(w)
                    if got is None:
                        got = viterbi_segment(w, logp, max_len, floor)
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
            sorted(self.vocab.items(), key=lambda kv: kv[1]),
            "token string, token_id int",
        )

    # ---- persistence ----
    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "version": 1,
                    "model_type": "unigram",
                    "max_piece_len": self.max_piece_len,
                    "pieces": [[p, lp] for p, lp in self.pieces],
                },
                f,
                ensure_ascii=False,
            )

    @staticmethod
    def load(path: str) -> "UnigramTokenizer":
        with open(path, encoding="utf-8") as f:
            d = json.load(f)
        pieces = tuple((p, float(lp)) for p, lp in d["pieces"])
        return UnigramTokenizer(
            pieces, dict(pieces), int(d["max_piece_len"])
        )


def train_unigram(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    min_count: int = 1,
    max_word_types: int = 1_000_000,
    max_piece_len: int = 8,
    seed_size: int = 100_000,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> UnigramTokenizer:
    """End-to-end trainer: the SAME bounded corpus-side aggregate as
    ``train_bpe`` (word-type counts, one shuffle, capped collect by
    (count desc, word asc)) feeding the driver-side EM + prune loop.
    At 100 TB the word-type table is the thing you cap, never the
    corpus."""
    wc = word_type_counts(docs, text_col)
    if min_count > 1:
        wc = wc.filter(F.col("count") >= min_count)
    rows = (
        wc.orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_word_types)
        .collect()
    )
    word_counts = {r["word"]: r["count"] for r in rows}
    return learn_unigram(
        word_counts,
        vocab_size,
        max_piece_len=max_piece_len,
        seed_size=seed_size,
        em_iters=em_iters,
        shrink=shrink,
    )
