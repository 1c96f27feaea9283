"""Interpolated Kneser-Ney bigram language model — the published
CCNet-grade LM for perplexity filtering (Wenzek et al. 2020 rank
documents by LM perplexity under a model trained on a trusted
corpus; their LM is KenLM's modified Kneser-Ney).  This is the
from-scratch interpolated-KN recipe (Kneser & Ney 1995; Chen &
Goodman 1998 eq. 4.15-4.26, the standard public formulation):

    P(w|u) = max(c(u,w) - D, 0)/c(u) + D·N1+(u,·)/c(u) · Pcont(w)
    Pcont(w) = (max(N1+(·,w) - D, 0) + D·T/(V+1)) / N1+(·,·)

with ONE absolute discount D = n1/(n1 + 2·n2) estimated from the
bigram counts-of-counts (Ney, Essen & Kneser 1994), T = distinct
predicted types, V+1 events at the uniform floor (the +1 is the
unseen-word bucket, so OOV words get non-zero mass through the
continuation chain, never a hard zero).  Both levels telescope to
exactly 1, checked in tests.

Relationship to the hashed-gram LM (operators/selection.py): that
model is a BAG of hashed grams — order-insensitive, oracle-
replayable, zero vocabulary state; this one CONDITIONS on the
previous word, so a document built from frequent words in an
unseen order scores badly here and fine there.  CCNet's published
bucketing uses the conditional form; keep the hashed model where
hash-matched replay matters and this where fidelity to the
published recipe matters.

Scale shape (the BPE/unigram trainer convention): training is ONE
corpus-scale Spark stage — tokenize with the engine's shared
``word_tokens_expr`` (so train and score see the same tokens),
``<s>``-prefix, bigrams as a zip_with over shifted slices (the
round-5 expression-perf lesson), explode + map-side-combined
groupBy — and the learning happens on the collected bigram-count
dict, BOUNDED by ``min_word_count``/``max_vocab`` pruning exactly
like KenLM's --prune/--vocab_estimate: rare words collapse to
``<unk>`` BEFORE bigram formation, so the driver dict is capped by
construction, not by hope.  Scoring is a broadcast of that dict
into one Arrow-batched pass over Spark-tokenized arrays (map-only,
no shuffle).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["KNBigramLM", "train_kn_bigram"]

_BOS = "<s>"
_UNK = "<unk>"
_SEP = "\x1f"  # unit separator: cannot appear in \p{L}+ tokens


def _bigram_pairs_expr(toks: Column) -> Column:
    """``u\\x1fw`` strings for consecutive token pairs of the
    <s>-prefixed token array — zip_with over two shifted slices
    (array-copy-free, the round-5 n-gram lesson)."""
    with_bos = F.concat(F.array(F.lit(_BOS)), toks)
    n = F.size(with_bos)
    return F.zip_with(
        F.slice(with_bos, 1, n - 1),
        F.slice(with_bos, 2, n - 1),
        lambda u, w: F.concat_ws(_SEP, u, w),
    )


@dataclass(frozen=True)
class KNBigramLM:
    """Frozen trained model: everything scoring needs, JSON-round-
    trippable.  ``c_uw`` keys are ``u\\x1fw``; ``<s>`` appears only
    as a context, ``<unk>`` (when pruning was active) on both
    sides."""

    d: float  # the absolute discount
    c_u: dict  # context -> token count
    c_uw: dict  # "u<US>w" -> bigram count
    n1p_u: dict  # context -> N1+(u, ·) distinct continuations
    cont: dict  # word -> N1+(·, w) distinct left-contexts
    n_cont: int  # N1+(·,·) = total bigram types
    v: int  # distinct predicted word types (excl <s>)

    def logp(self, u: str, w: str) -> float:
        """ln P(w|u), interpolated KN with uniform-floored
        continuation — total, never -inf."""
        t = len(self.cont)
        p_cont = (
            max(self.cont.get(w, 0) - self.d, 0.0)
            + self.d * t / (self.v + 1)
        ) / self.n_cont
        cu = self.c_u.get(u, 0)
        if cu <= 0:
            return math.log(p_cont)
        cuw = self.c_uw.get(u + _SEP + w, 0)
        p = (
            max(cuw - self.d, 0.0) / cu
            + self.d * self.n1p_u[u] / cu * p_cont
        )
        return math.log(p)

    def cross_entropy(self, tokens: list) -> tuple[int, float]:
        """(n_grams, ce) for one document's token list: mean
        -ln P(w_i|w_{i-1}) over the <s>-prefixed chain, with OOV
        tokens mapped to <unk> when the model was vocab-pruned."""
        if not tokens:
            return 0, 0.0
        if _UNK in self.cont:
            known = self.c_u
            tokens = [t if t in known or t in self.cont else _UNK for t in tokens]
        total = 0.0
        prev = _BOS
        for w in tokens:
            total -= self.logp(prev, w)
            prev = w
        return len(tokens), total / len(tokens)

    # ------------------------------------------------- persistence
    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "kind": "kn_bigram",
                    "d": self.d,
                    "c_u": self.c_u,
                    "c_uw": self.c_uw,
                    "cont": self.cont,
                    "v": self.v,
                },
                f,
                ensure_ascii=False,
            )

    @staticmethod
    def load(path: str) -> "KNBigramLM":
        with open(path, encoding="utf-8") as f:
            d = json.load(f)
        if d.get("kind") != "kn_bigram":
            raise ValueError(f"not a kn_bigram artifact: {path}")
        return KNBigramLM.from_counts(d["c_uw"], d=d["d"])

    @staticmethod
    def from_counts(c_uw: dict, d: float | None = None) -> "KNBigramLM":
        """Derive every table from the bigram-count dict — the one
        piece of trained state; discount estimated from counts of
        counts unless given."""
        if not c_uw:
            raise ValueError("kn_bigram: no bigrams to train on")
        c_u: dict = {}
        n1p_u: dict = {}
        cont: dict = {}
        n1 = n2 = 0
        for key, c in c_uw.items():
            u, _, w = key.partition(_SEP)
            c_u[u] = c_u.get(u, 0) + c
            n1p_u[u] = n1p_u.get(u, 0) + 1
            cont[w] = cont.get(w, 0) + 1
            if c == 1:
                n1 += 1
            elif c == 2:
                n2 += 1
        if d is None:
            d = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) > 0 else 0.5
        return KNBigramLM(
            d=float(d),
            c_u=c_u,
            c_uw=dict(c_uw),
            n1p_u=n1p_u,
            cont=cont,
            n_cont=len(c_uw),
            v=len(cont),
        )

    # ------------------------------------------------ Spark scoring
    def score(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """(id_col, n_grams, cross_entropy, ppl) — same shape and
        rounding as operators.selection.lm_cross_entropy, so the two
        scorers are drop-in swaps for perplexity_buckets.  Tokens
        come from the engine's ``word_tokens_expr`` (the SAME
        tokenizer training used), the model rides an executor-wide
        broadcast, and the pass is one Arrow-batched map — no
        shuffle, no corpus-side join."""
        from pyspark.sql.functions import pandas_udf

        from snapflow_spark.operators.retrieval import word_tokens_expr

        spark = df.sparkSession
        bc = spark.sparkContext.broadcast(self)

        @pandas_udf("struct<n_grams: bigint, ce: double>")
        def ce_udf(toks: pd.Series) -> pd.DataFrame:
            lm = bc.value
            rows = [
                lm.cross_entropy([] if t is None else list(t)) for t in toks
            ]
            return pd.DataFrame(rows, columns=["n_grams", "ce"])

        staged = df.select(
            F.col(id_col), word_tokens_expr(text_col).alias("__toks")
        ).withColumn("__s", ce_udf("__toks"))
        return staged.select(
            id_col,
            F.col("__s.n_grams").alias("n_grams"),
            F.round(F.col("__s.ce"), 6).alias("cross_entropy"),
        ).withColumn("ppl", F.round(F.exp("cross_entropy"), 6))


def train_kn_bigram(
    ref: DataFrame,
    text_col: str = "text",
    min_word_count: int = 1,
    max_vocab: int | None = None,
    min_bigram_count: int = 1,
) -> KNBigramLM:
    """Fit the interpolated-KN bigram model on a reference corpus.

    ONE corpus-scale stage when unpruned (bigram explode + counted
    groupBy, map-side combined); with ``min_word_count``/
    ``max_vocab`` a prior word-count stage builds the kept-vocab set
    (KenLM's practical pruning — CCNet trains on a bounded trusted
    corpus, but the knobs make the driver dict size a CONTRACT) and
    out-of-vocab tokens collapse to ``<unk>`` BEFORE bigram
    formation, so pruning changes the model, not just its storage.
    ``min_bigram_count`` additionally drops rare bigram TYPES from
    the stored table after counting (their mass reaches scoring
    through the discount/backoff terms only — the standard count
    cutoff, off by default)."""
    from snapflow_spark.operators.retrieval import word_tokens_expr

    staged = ref.select(word_tokens_expr(text_col).alias("__toks"))
    if min_word_count > 1 or max_vocab is not None:
        wc = (
            staged.select(F.explode("__toks").alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= int(min_word_count))
        )
        if max_vocab is not None:
            wc = wc.orderBy(F.col("c").desc(), F.col("w")).limit(
                int(max_vocab)
            )
        kept = {r.w for r in wc.collect()}  # bounded by max_vocab/cutoff
        bc_kept = ref.sparkSession.sparkContext.broadcast(kept)
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def map_unk(toks: pd.Series) -> pd.Series:
            k = bc_kept.value
            return toks.apply(
                lambda ts: [t if t in k else _UNK for t in ts]
            )

        staged = staged.select(map_unk("__toks").alias("__toks"))
    counts = (
        staged.where(F.size("__toks") > 0)
        .select(F.explode(_bigram_pairs_expr(F.col("__toks"))).alias("uw"))
        .groupBy("uw")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if min_bigram_count > 1:
        counts = counts.where(F.col("c") >= int(min_bigram_count))
    c_uw = {r.uw: int(r.c) for r in counts.collect()}
    return KNBigramLM.from_counts(c_uw)
