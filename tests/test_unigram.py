"""Unigram-LM tokenizer training (functions/unigram.py): the lattice
forward-backward and Viterbi pinned to brute-force enumeration over
all segmentations, EM behavior, prune semantics, lossless encode,
end-to-end train->encode on a Spark corpus, artifact save/load, CLI —
the same conventions as test_bpe.py."""

from __future__ import annotations

import itertools
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snapflow_spark.functions.unigram import (
    UnigramTokenizer,
    _em_step,
    _forward_backward,
    learn_unigram,
    substring_seed,
    train_unigram,
    viterbi_segment,
)

FLOOR = -100.0


# ---------------------------------------------------------------- #
# brute-force reference: enumerate EVERY segmentation
# ---------------------------------------------------------------- #
def _all_segmentations(word, logp, max_len):
    """(pieces, score) for every way to split word into vocab pieces
    (single chars fall back to FLOOR, matching viterbi_segment)."""
    L = len(word)
    out = []
    for cuts in itertools.product([0, 1], repeat=L - 1):
        pieces, start = [], 0
        for i, c in enumerate(cuts, 1):
            if c:
                pieces.append(word[start:i])
                start = i
        pieces.append(word[start:])
        score = 0.0
        ok = True
        for p in pieces:
            if len(p) > max_len:
                ok = False
                break
            lp = logp.get(p)
            if lp is None:
                if len(p) > 1:
                    ok = False
                    break
                lp = FLOOR
            score += lp
        if ok:
            out.append((pieces, score))
    return out


VOCAB = {
    "a": math.log(0.15), "b": math.log(0.1), "c": math.log(0.05),
    "ab": math.log(0.25), "bc": math.log(0.2), "abc": math.log(0.15),
    "cab": math.log(0.1),
}


@pytest.mark.parametrize("word", ["abc", "abcabc", "cabba", "a", "xyzab"])
def test_viterbi_matches_bruteforce(word):
    segs = _all_segmentations(word, VOCAB, max_len=3)
    # restrict to in-vocab-only segmentations plus char fallbacks —
    # identical universe to the DP
    best_pieces = max(segs, key=lambda t: t[1])[0] if segs else None
    got = viterbi_segment(word, VOCAB, 3, FLOOR)
    assert "".join(got) == word
    got_score = sum(VOCAB.get(p, FLOOR) for p in got)
    assert got_score == pytest.approx(max(s for _, s in segs))
    # the argmax may tie; scores must match exactly
    assert best_pieces is not None


def test_viterbi_exclude_full():
    got = viterbi_segment("abc", VOCAB, 3, FLOOR, exclude_full=True)
    assert "".join(got) == "abc" and len(got) >= 2
    # best 2+-piece split of "abc" is a|bc (0.15*0.2) over ab|c
    assert got == ["a", "bc"]


def test_forward_matches_bruteforce_total():
    for word in ("abc", "abcab", "cabc"):
        segs = _all_segmentations(word, VOCAB, max_len=3)
        total = math.log(sum(math.exp(s) for _, s in segs))
        alpha, beta = _forward_backward(word, VOCAB, 3)
        assert alpha[len(word)] == pytest.approx(total)
        assert beta[0] == pytest.approx(total)


def test_em_expected_counts_match_bruteforce():
    """E-step posteriors == enumeration: for each piece, sum over all
    segmentations of P(seg) * (#occurrences of piece in seg),
    normalized by the total — weighted by word counts."""
    words = [("abc", 3), ("cab", 2)]
    expected, loglik = _em_step(words, VOCAB, 3)
    ref: dict[str, float] = {}
    ref_ll = 0.0
    for w, c in words:
        segs = _all_segmentations(w, VOCAB, 3)
        z = sum(math.exp(s) for _, s in segs)
        ref_ll += c * math.log(z)
        for pieces, s in segs:
            post = math.exp(s) / z
            for p in pieces:
                if p in VOCAB:
                    ref[p] = ref.get(p, 0.0) + c * post
    assert loglik == pytest.approx(ref_ll)
    assert set(expected) == set(ref)
    for p in ref:
        assert expected[p] == pytest.approx(ref[p]), p


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abc", min_size=1, max_size=7))
def test_viterbi_bruteforce_property(word):
    segs = _all_segmentations(word, VOCAB, max_len=3)
    got = viterbi_segment(word, VOCAB, 3, FLOOR)
    assert "".join(got) == word
    assert sum(VOCAB.get(p, FLOOR) for p in got) == pytest.approx(
        max(s for _, s in segs)
    )


# ---------------------------------------------------------------- #
# seeding + learning
# ---------------------------------------------------------------- #
def test_substring_seed_counts_and_cap():
    seed = substring_seed({"aba": 2, "ab": 1}, max_piece_len=2)
    # "ab" occurs twice in "aba"? no — positions 0-1 only; "ba" once;
    # "a" twice in "aba" + 0 in "ab"... enumerate: aba -> a(x2), b,
    # ab, ba; ab -> a, b, ab
    assert seed["a"] == 2 * 2 + 1
    assert seed["b"] == 2 + 1
    assert seed["ab"] == 2 + 1
    assert seed["ba"] == 2
    # cap keeps ALL singles plus the top multis by (freq desc, piece)
    capped = substring_seed({"aba": 2, "ab": 1}, 2, seed_size=3)
    assert set(capped) == {"a", "b", "ab"}


def test_learn_prunes_to_vocab_size_and_keeps_singles():
    wc = {"international": 50, "internet": 40, "intern": 30, "nation": 20,
          "national": 25, "interns": 10, "nations": 8}
    singles = {c for w in wc for c in w}
    tok = learn_unigram(wc, vocab_size=len(singles) + 6, seed_size=500)
    assert set(s for s, _ in tok.pieces if len(s) == 1) == singles
    assert len(tok.pieces) <= len(singles) + 6
    multis = [p for p, _ in tok.pieces if len(p) > 1]
    assert multis  # learned something beyond characters
    # high-utility stems survive the prune
    assert any("inter" in p or "nation" in p for p in multis)
    # probabilities normalize
    assert sum(math.exp(lp) for _, lp in tok.pieces) == pytest.approx(1.0)


def test_learn_determinism():
    wc = {"spark first design": 3, "sparkly": 2, "parquet": 4, "spa": 1}
    t1 = learn_unigram(wc, vocab_size=30, seed_size=200)
    t2 = learn_unigram(wc, vocab_size=30, seed_size=200)
    assert t1.pieces == t2.pieces


def test_encode_lossless_and_unk():
    tok = learn_unigram({"hello": 5, "help": 3}, vocab_size=12)
    for text in ("hello help", "helix", "QQhello"):  # Q never seen
        enc = tok.encode_text(text)
        assert "".join(enc) == text
    assert "Q" not in tok.vocab
    ids = [tok.vocab.get(p, -1) for p in tok.encode_text("Qhelp")]
    assert ids[0] == -1 and all(i >= 0 for i in ids[1:])


def test_vocab_layout_and_save_load(tmp_path):
    tok = learn_unigram({"abab": 4, "ab": 2}, vocab_size=6)
    v = tok.vocab
    singles = sorted(p for p, _ in tok.pieces if len(p) == 1)
    assert [p for p, i in sorted(v.items(), key=lambda kv: kv[1])][
        : len(singles)
    ] == singles
    p = str(tmp_path / "unigram.json")
    tok.save(p)
    tok2 = UnigramTokenizer.load(p)
    assert tok2 == tok
    assert tok2.encode_text("ababab") == tok.encode_text("ababab")


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


def test_train_encode_end_to_end(spark, corpus):
    tok = train_unigram(corpus, vocab_size=80, seed_size=400)
    enc = corpus.select(
        "doc_id", tok.encode_col(spark, "text").alias("toks")
    ).collect()
    for r in enc:
        # lossless + Spark encode == driver reference encode
        assert "".join(r["toks"]) == CORPUS[r["doc_id"]]
        assert r["toks"] == tok.encode_text(CORPUS[r["doc_id"]])
    # a frequent space-prefixed word survives as one piece
    assert any(p.startswith(" ") and len(p) > 3 for p, _ in tok.pieces)


def test_train_determinism_and_cap(spark, corpus):
    t1 = train_unigram(corpus, vocab_size=60, seed_size=300)
    t2 = train_unigram(corpus, vocab_size=60, seed_size=300)
    assert t1.pieces == t2.pieces
    t3 = train_unigram(corpus, vocab_size=60, seed_size=300, max_word_types=5)
    assert len(t3.pieces) > 0  # bounded dict still trains


def test_unigram_vs_bpe_token_budget(spark, corpus):
    """Composition + sanity: both trained tokenizers are lossless and
    land between pre-token and char granularity on the same corpus —
    the comparability the shared pre-tokenizer buys."""
    from snapflow_spark.functions.bpe import train_bpe
    from snapflow_spark.functions.text import bpe_tokens_expr

    uni = train_unigram(corpus, vocab_size=120, seed_size=400)
    bpe = train_bpe(corpus, num_merges=60)
    counts = corpus.select(
        F.size(bpe_tokens_expr("text")).alias("pre"),
        F.size(uni.encode_col(spark, "text")).alias("n_uni"),
        F.size(bpe.encode_col(spark, "text")).alias("n_bpe"),
        F.length("text").alias("chars"),
    ).agg(F.sum("pre"), F.sum("n_uni"), F.sum("n_bpe"), F.sum("chars")
    ).first()
    pre, n_uni, n_bpe, chars = counts
    assert pre <= n_uni < chars
    assert pre <= n_bpe < chars


def test_id_table_join(spark, corpus):
    tok = train_unigram(corpus, vocab_size=80, seed_size=300)
    ids = (
        corpus.select(F.explode(tok.encode_col(spark, "text")).alias("token"))
        .join(F.broadcast(tok.id_table(spark)), "token", "left")
        .agg(F.count(F.lit(1)).alias("n"), F.count("token_id").alias("n_mapped"))
        .first()
    )
    assert ids["n"] == ids["n_mapped"] > 0


def test_cli_train_unigram(spark, tmp_path, capsys):
    from snapflow_spark.cli import main

    out = str(tmp_path / "uni.json")
    assert main([
        "train-unigram", out, "--sf", "/root/testdata/sf0.001",
        "--vocab-size", "400", "--seed-size", "2000", "--max-word-types",
        "2000",
    ]) == 0
    printed = capsys.readouterr().out
    assert "trained:" in printed and "vocab" in printed
    tok = UnigramTokenizer.load(out)
    assert tok.encode_text("the quick fox")  # usable artifact
    assert "".join(tok.encode_text("the quick fox")) == "the quick fox"


# ---------------------------------------------------------------- #
# subword-regularization sampling (Kudo 2018 §3.2)
# ---------------------------------------------------------------- #
def test_sample_matches_lattice_posterior():
    """FFBS correctness: at alpha=1 the empirical segmentation
    frequencies over many salts converge to the true lattice
    posterior P(seg) = exp(score) / Z from brute-force enumeration."""
    from collections import Counter

    from snapflow_spark.functions.unigram import sample_segment

    word = "abc"
    segs = _all_segmentations(word, VOCAB, max_len=3)
    z = sum(math.exp(s) for _, s in segs)
    want = {tuple(p): math.exp(s) / z for p, s in segs}
    n = 4000
    got = Counter(
        tuple(sample_segment(word, VOCAB, 3, FLOOR, alpha=1.0, salt=str(i)))
        for i in range(n)
    )
    assert set(got) <= set(want)
    for seg, p in want.items():
        if p > 0.02:  # observable mass
            assert abs(got[seg] / n - p) < 0.035, (seg, p, got[seg] / n)


def test_sample_deterministic_and_lossless():
    from snapflow_spark.functions.unigram import sample_segment

    for w in ("abcabc", "cabba", "xyzq"):
        s1 = sample_segment(w, VOCAB, 3, FLOOR, salt="e1")
        assert sample_segment(w, VOCAB, 3, FLOOR, salt="e1") == s1
        assert "".join(s1) == w  # lossless incl. unseen chars
    # different salt resamples (some word must differ across 10 salts)
    diffs = {
        tuple(sample_segment("abcabc", VOCAB, 3, FLOOR, alpha=0.2, salt=str(i)))
        for i in range(10)
    }
    assert len(diffs) > 1


def test_sample_alpha_limits():
    from snapflow_spark.functions.unigram import (
        sample_segment,
        viterbi_segment,
    )

    vit = viterbi_segment("abcabc", VOCAB, 3, FLOOR)
    # alpha -> large approaches Viterbi
    big = [
        sample_segment("abcabc", VOCAB, 3, FLOOR, alpha=50.0, salt=str(i))
        for i in range(20)
    ]
    assert all(s == vit for s in big)
    # alpha=0 is uniform over segmentations: the worst segmentation
    # appears with roughly 1/N frequency (here N=len(segs))
    segs = _all_segmentations("abc", VOCAB, max_len=3)
    n = 2000
    from collections import Counter

    got = Counter(
        tuple(sample_segment("abc", VOCAB, 3, FLOOR, alpha=0.0, salt=str(i)))
        for i in range(n)
    )
    for seg in got:
        assert abs(got[seg] / n - 1 / len(segs)) < 0.05


def test_sample_spark_udf_matches_driver(spark, corpus):
    tok = train_unigram(corpus, vocab_size=80, seed_size=300)
    enc = corpus.select(
        "doc_id", tok.sample_udf(spark, alpha=0.3, salt="ep1")(F.col("text")).alias("toks")
    ).collect()
    for r in enc:
        assert r["toks"] == tok.sample_text(CORPUS[r["doc_id"]], 0.3, "ep1")
        assert "".join(r["toks"]) == CORPUS[r["doc_id"]]
    # repartitioning does not change the draw
    again = corpus.repartition(7).select(
        "doc_id", tok.sample_udf(spark, alpha=0.3, salt="ep1")(F.col("text")).alias("toks")
    ).collect()
    assert {r["doc_id"]: tuple(r["toks"]) for r in again} == {
        r["doc_id"]: tuple(r["toks"]) for r in enc
    }


# ---------------------------------------------------------------- #
# tokenizer evaluation (functions/tokenizer_eval.py)
# ---------------------------------------------------------------- #
def test_tokenizer_stats_matches_driver_reference(spark, corpus):
    from snapflow_spark.functions.bpe import train_bpe
    from snapflow_spark.functions.tokenizer_eval import tokenizer_stats

    for tok in (
        train_bpe(corpus, num_merges=40),
        train_unigram(corpus, vocab_size=80, seed_size=300),
    ):
        row = tokenizer_stats(spark, corpus, tok).first()
        # driver-side reference over the same texts
        enc = [tok.encode_text(t) for t in CORPUS]
        n_toks = sum(len(e) for e in enc)
        assert row.n_docs == len(CORPUS)
        assert row.n_tokens == n_toks
        assert row.n_oov_tokens == 0  # training saw every char
        assert row.n_chars == sum(len(t) for t in CORPUS)
        assert row.n_bytes == sum(len(t.encode()) for t in CORPUS)
        assert row.chars_per_token == round(row.n_chars / n_toks, 4)
        assert row.tokens_per_doc == round(n_toks / len(CORPUS), 4)
        assert row.oov_frac == 0.0


def test_tokenizer_stats_oov_groups_and_empty_docs(spark):
    from snapflow_spark.functions.tokenizer_eval import tokenizer_stats

    # train WITH the space-prefixed pre-token (GPT-2 convention) so
    # "hello help" is fully in-vocab for the en group
    tok = learn_unigram({"hello": 5, " help": 3}, vocab_size=14)
    docs = spark.createDataFrame(
        [
            (1, "en", "hello help"),
            (2, "en", ""),                # token-less doc still counted
            (3, "zz", "héllo"),      # é unseen -> OOV + 2-byte utf8
        ],
        "doc_id bigint, lang string, text string",
    )
    got = {r.lang: r for r in tokenizer_stats(spark, docs, tok, by="lang").collect()}
    assert got["en"].n_docs == 2 and got["en"].n_oov_tokens == 0
    assert got["en"].n_chars == 10
    zz = got["zz"]
    ref = tok.encode_text("héllo")
    assert zz.n_tokens == len(ref)
    assert zz.n_oov_tokens == 1  # the é fallback char
    assert zz.n_bytes == len("héllo".encode()) == 6
    assert zz.oov_frac == round(1 / len(ref), 6)


def test_cli_tokenizer_stats(spark, tmp_path, capsys):
    from snapflow_spark.cli import main

    out = str(tmp_path / "uni2.json")
    assert main([
        "train-unigram", out, "--sf", "/root/testdata/sf0.001",
        "--vocab-size", "300", "--seed-size", "1500", "--max-word-types",
        "1500",
    ]) == 0
    capsys.readouterr()
    assert main(["tokenizer-stats", out, "--sf", "/root/testdata/sf0.001",
                 "--by", "lang"]) == 0
    printed = capsys.readouterr().out
    assert "chars_per_token" in printed and "oov_frac" in printed
