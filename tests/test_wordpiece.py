"""WordPiece (functions/wordpiece.py): trainer parity against a naive
recompute-everything reference, the likelihood-vs-frequency
distinguishing case, greedy MaxMatch encoding, save/load, Spark
parity, and repartition determinism."""

from __future__ import annotations

import random
import string

from snapflow_spark.functions.wordpiece import (
    UNK,
    WordPieceTokenizer,
    learn_wordpiece,
    train_wordpiece,
    wordpiece_word,
    wp_pretokens_py,
)


def naive_wordpiece(word_counts: dict[str, int], num_merges: int,
                    min_pair_count: int = 2) -> list[str]:
    """Recompute-everything reference: per round, rebuild all symbol
    and pair counts from scratch and take max by (score, pair asc
    inverted through min on (-score, pair))."""
    words = {w: [w[0], *("##" + c for c in w[1:])] for w in word_counts}
    merged_out = []
    for _ in range(num_merges):
        sym, pairs = {}, {}
        for w, syms in words.items():
            c = word_counts[w]
            for s in syms:
                sym[s] = sym.get(s, 0) + c
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        live = {p: c for p, c in pairs.items() if c >= min_pair_count}
        if not live:
            break
        best = min(live, key=lambda p: (-(live[p] / (sym[p[0]] * sym[p[1]])), p))
        a, b = best
        tok = a + b[2:]
        merged_out.append(tok)
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(tok)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merged_out


def test_trainer_matches_naive_reference_randomized():
    rng = random.Random(17)
    for trial in range(8):
        vocab_chars = string.ascii_lowercase[: rng.randint(3, 6)]
        word_counts = {}
        for _ in range(rng.randint(4, 30)):
            w = "".join(rng.choice(vocab_chars) for _ in range(rng.randint(1, 8)))
            word_counts[w] = rng.randint(1, 40)
        n = rng.randint(1, 25)
        got = learn_wordpiece(dict(word_counts), n, min_pair_count=2)
        want = naive_wordpiece(dict(word_counts), n, min_pair_count=2)
        assert got == want, (trial, word_counts)


def test_likelihood_beats_frequency():
    # pair ("q","##z") appears 5 times and its symbols appear ONLY
    # together; pair ("t","##h") appears 40 times but t and h are
    # everywhere. BPE would merge th first; WordPiece must merge qz.
    wc = {"qz": 5, "th": 40, "ta": 60, "ha": 60, "at": 50}
    merged = learn_wordpiece(wc, 1)
    assert merged == ["qz"]


def test_greedy_maxmatch_and_unk():
    vocab = {UNK, "un", "##aff", "##able", "##ffa", "a", "##b"}
    assert wordpiece_word("unaffable", vocab) == ["un", "##aff", "##able"]
    assert wordpiece_word("ab", vocab) == ["a", "##b"]
    # 'x' has no match anywhere -> whole word is UNK, no partial salvage
    assert wordpiece_word("ax", vocab) == [UNK]
    assert wordpiece_word("a" * 101, vocab, max_chars=100) == [UNK]
    assert wordpiece_word("", vocab) == [UNK]


def test_pretokens_drop_whitespace_and_leading_space():
    assert wp_pretokens_py("Hello   world, it's fine\n\n") == [
        "Hello", "world", ",", "it", "'s", "fine",
    ]
    assert wp_pretokens_py("") == []


def test_round_trip_when_fully_covered():
    wc = {"hugging": 10, "hugs": 5, "gugging": 3}
    tok = WordPieceTokenizer.from_parts(
        {c for w in wc for c in w}, learn_wordpiece(wc, 6)
    )
    for w in wc:
        pieces = tok.encode_word(w)
        assert UNK not in pieces
        assert pieces[0] + "".join(p[2:] for p in pieces[1:]) == w


def test_save_load_and_id_layout(tmp_path):
    wc = {"aba": 4, "abc": 3}
    tok = WordPieceTokenizer.from_parts(
        {c for w in wc for c in w}, learn_wordpiece(wc, 2), max_chars=50
    )
    assert tok.vocab[UNK] == 0
    p = str(tmp_path / "wp.json")
    tok.save(p)
    back = WordPieceTokenizer.load(p)
    assert back == tok


def test_spark_trainer_and_encode_parity(spark):
    texts = [
        "the hugging hugs were hugging again",
        "a gugging thing was hugging the hugs",
        "unaffable things are unaffable",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    tok = train_wordpiece(df, num_merges=12, min_pair_count=2)
    # repartition determinism: the bounded collect is order-pinned
    tok2 = train_wordpiece(df.repartition(7), num_merges=12, min_pair_count=2)
    assert tok == tok2

    enc = df.select(tok.encode_col(spark, "text").alias("toks")).collect()
    for row, t in zip(enc, texts):
        assert row.toks == tok.encode_text(t)


def test_cli_train_and_core_tokenize_and_stats(spark, tmp_path):
    """train-wordpiece CLI -> core.tokenize sniffing the wordpiece
    artifact -> tokenizer-stats loader accepts it too."""
    from snapflow_spark.cli import main as cli_main
    from snapflow_spark.functions.tokenizer_eval import tokenizer_stats
    from snapflow_spark.plans import load_graph

    out = str(tmp_path / "wp.json")
    rc = cli_main(
        ["train-wordpiece", out, "--sf", "/root/testdata/sf0.001",
         "--merges", "60", "--min-count", "2"]
    )
    assert rc == 0
    tok = WordPieceTokenizer.load(out)
    assert len(tok.vocab) > 60

    cfg = {
        "warehouse": str(tmp_path / "wh_wp"),
        "sources": ["docs_src"],
        "nodes": [
            {
                "name": "tokens",
                "function": "core.tokenize",
                "upstream": {"input": "docs_src"},
                "params": {"artifact": out, "counts_only": True},
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    g.source("docs_src").append(
        spark.createDataFrame([(1, "the documents table")], "doc_id long, text string")
    )
    assert g.produce(spark) == 1
    row = g.read(spark, "tokens").collect()[0]
    assert row.tokens == len(tok.encode_text("the documents table"))

    stats = tokenizer_stats(
        spark,
        spark.createDataFrame([("the documents table",)], "text string"),
        tok,
    ).collect()
    assert stats and stats[0].n_docs == 1
