"""BPE tokenizer training (functions/bpe.py): merge learner pinned to
a from-scratch naive reference, pre-tokenizer pinned to the Spark-side
Java regex, encode invariants, end-to-end train->encode on a corpus,
artifact save/load."""

from __future__ import annotations

import collections

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snapflow_spark.functions.bpe import (
    BPETokenizer,
    bpe_pretokens_py,
    bpe_word,
    learn_bpe,
    train_bpe,
    word_type_counts,
)
from snapflow_spark.functions.text import bpe_tokens_expr


# ---------------------------------------------------------------- #
# naive reference trainer: recount every pair from scratch each round
# ---------------------------------------------------------------- #
def _naive_learn(word_counts, num_merges, min_pair_count=2):
    words = {w: list(w) for w in word_counts if w and word_counts[w] > 0}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for w, syms in words.items():
            c = word_counts[w]
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        # (count desc, pair asc) — the documented tie-break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


WC_FIXED = {
    "low": 5,
    "lower": 2,
    "newest": 6,
    "widest": 3,
    "new": 2,
    "west": 1,
    "ai": 9,
    "a": 4,
}


def test_learner_matches_naive_fixed():
    for n in (1, 3, 8, 50):
        assert learn_bpe(dict(WC_FIXED), n) == _naive_learn(dict(WC_FIXED), n)


@settings(max_examples=40, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcde '", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=12),
)
def test_learner_matches_naive_property(wc, n_merges):
    assert learn_bpe(dict(wc), n_merges) == _naive_learn(dict(wc), n_merges)


def test_learner_min_pair_count_stops():
    # every pair occurs once -> no merge at the default floor of 2
    assert learn_bpe({"abc": 1, "def": 1}, 10) == []
    assert len(learn_bpe({"abc": 1, "def": 1}, 10, min_pair_count=1)) > 0


# ---------------------------------------------------------------- #
# pre-tokenizer parity with the Spark-side Java regex
# ---------------------------------------------------------------- #
PRETOK_SAMPLES = [
    "Hello, world! It's Spark's 3rd run.",
    "don't we'll they've I'm you're he'd isn't",
    "!!!'s  weird '' edge 'stop'",
    "tabs\tand\nnewlines  double  spaces trailing ",
    " leading space",
    "mixed123abc 456 7e8 π≈3.14159 «quoted»",
    "中文字符 và tiếng Việt & кириллица",
    "a  b   c\t d",
    "", "'", "'s", " 's", "x!'s",
]


def test_pretokens_py_matches_spark_regex(spark):
    df = spark.createDataFrame([(s,) for s in PRETOK_SAMPLES], "text string")
    got = {
        r["text"]: r["toks"]
        for r in df.select(
            "text", bpe_tokens_expr("text").alias("toks")
        ).collect()
    }
    for s in PRETOK_SAMPLES:
        assert bpe_pretokens_py(s) == got[s], repr(s)


def test_pretokens_cover_text():
    for s in PRETOK_SAMPLES:
        assert "".join(bpe_pretokens_py(s)) == s


# ---------------------------------------------------------------- #
# encoding
# ---------------------------------------------------------------- #
def test_encode_word_lossless_and_greedy():
    merges = learn_bpe(dict(WC_FIXED), 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(WC_FIXED) + ["unseen", "newestest"]:
        toks = bpe_word(w, ranks)
        assert "".join(toks) == w
        # greedy fixpoint: no adjacent pair is still mergeable
        assert all(p not in ranks for p in zip(toks, toks[1:]))


def test_tokenizer_vocab_layout():
    tok = BPETokenizer.from_merges([("a", "b"), ("ab", "c")], {"a", "b", "c"})
    # singles sorted first, then merge outputs in merge order
    assert tok.vocab == {"a": 0, "b": 1, "c": 2, "ab": 3, "abc": 4}


def test_save_load_roundtrip(tmp_path):
    tok = BPETokenizer.from_merges(
        learn_bpe(dict(WC_FIXED), 6), {c for w in WC_FIXED for c in w}
    )
    p = str(tmp_path / "tokenizer.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    assert tok2 == tok
    assert tok2.encode_text("the newest lower") == tok.encode_text(
        "the newest lower"
    )


# ---------------------------------------------------------------- #
# end-to-end on a Spark corpus
# ---------------------------------------------------------------- #
CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox is quick and brown",
    "lazy dogs and quick foxes don't mix",
    "it's the quickest of the quick brown foxes",
    "pack my box with five dozen liquor jugs",
] * 3


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )


def test_word_type_counts(spark, corpus):
    wc = {r["word"]: r["count"] for r in word_type_counts(corpus).collect()}
    # " quick" (space-prefixed, GPT-2 convention) dominates
    assert wc["the"] == 6  # doc-initial "the" (no leading space)
    assert wc[" quick"] == 15
    assert wc[" brown"] == 12


def test_train_encode_end_to_end(spark, corpus):
    tok = train_bpe(corpus, num_merges=40)
    assert 1 <= len(tok.merges) <= 40
    enc = corpus.select(
        "doc_id",
        tok.encode_col(spark, "text").alias("toks"),
        bpe_tokens_expr("text").alias("pre"),
    ).collect()
    ranks = tok.ranks
    for r in enc:
        # lossless: tokens concatenate back to the text
        assert "".join(r["toks"]) == CORPUS[r["doc_id"]]
        # merges compress: fewer or equal tokens than characters,
        # at least as many as pre-tokens
        assert len(r["pre"]) <= len(r["toks"]) <= len(CORPUS[r["doc_id"]])
        # Spark encode == driver reference encode
        assert r["toks"] == tok.encode_text(CORPUS[r["doc_id"]])
        assert all(p not in ranks for p in zip(r["toks"], r["toks"][1:]))
    # frequent whole words became single tokens
    assert " quick" in tok.vocab


def test_train_determinism_and_cap(spark, corpus):
    t1 = train_bpe(corpus, num_merges=25)
    t2 = train_bpe(corpus, num_merges=25)
    assert t1.merges == t2.merges and t1.vocab == t2.vocab
    # max_word_types bounds the driver dict: with a tiny cap training
    # still works, on the most frequent types only
    t3 = train_bpe(corpus, num_merges=25, max_word_types=5)
    assert len(t3.merges) <= 25


def test_id_table_join(spark, corpus):
    tok = train_bpe(corpus, num_merges=30)
    ids = (
        corpus.select(F.explode(tok.encode_col(spark, "text")).alias("token"))
        .join(F.broadcast(tok.id_table(spark)), "token", "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("token_id").alias("n_mapped"),
        )
        .first()
    )
    # every emitted token is in the vocab (training saw all chars)
    assert ids["n"] == ids["n_mapped"] > 0


def test_bpe_feeds_curation_packing(spark, corpus):
    """Composition: a TRAINED tokenizer supplies the token counts
    that sequence packing budgets by — the real pipeline hand-off
    (train tokenizer -> encode corpus -> pack training contexts),
    replacing q_pipeline_docs' regex counter with learned-BPE
    counts."""
    from snapflow_spark.operators.curation import pack_sequences

    tok = train_bpe(corpus, num_merges=60)
    counted = corpus.select(
        "doc_id",
        F.size(tok.encode_col(spark, "text")).alias("n_bpe"),
    )
    packed = pack_sequences(
        counted, budget=32, token_col="n_bpe", id_col="doc_id"
    )
    rows = packed.collect()
    assert len(rows) == corpus.count()
    # chunk assignment is the running-sum layout over the BPE counts
    by_id = {r["doc_id"]: r for r in rows}
    cum = 0
    for i in sorted(by_id):
        r = by_id[i]
        assert r["chunk_id"] == cum // 32
        cum += r["n_bpe"]
    # BPE tokens are pieces of pre-tokens: bounded below by the
    # pre-token count, and the merges compress well under chars
    pre = corpus.select(F.sum(F.size(bpe_tokens_expr("text")))).first()[0]
    chars = corpus.select(F.sum(F.length("text"))).first()[0]
    bpe_total = counted.select(F.sum("n_bpe")).first()[0]
    assert pre <= bpe_total < chars


def test_cli_train_bpe(spark, tmp_path, capsys):
    """CLI surface: `python -m snapflow_spark train-bpe out.json`
    trains on the documents fixture and writes a loadable artifact."""
    from snapflow_spark.cli import main

    out = str(tmp_path / "tok.json")
    assert main([
        "train-bpe", out, "--sf", "/root/testdata/sf0.001", "--merges", "50",
    ]) == 0
    printed = capsys.readouterr().out
    assert "trained:" in printed and "vocab" in printed
    tok = BPETokenizer.load(out)
    assert 1 <= len(tok.merges) <= 50
    assert tok.encode_text("the quick fox")  # usable artifact
