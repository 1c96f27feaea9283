"""Byte-level BPE (functions/byte_bpe.py — the GPT-2 recipe): the
byte<->unicode table is the pinned public table (bijective, space ->
'Ġ'), merge learning matches a from-scratch naive reference in byte
space, encode round-trips ARBITRARY bytes losslessly (invalid UTF-8
included — the no-OOV guarantee), Spark encode == driver encode on
both text and binary columns, artifact save/load, and the CLI +
core.tokenize surfaces."""

from __future__ import annotations

import collections

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snapflow_spark.functions.byte_bpe import (
    ByteBPETokenizer,
    bytes_to_unicode,
    learn_byte_bpe,
    train_byte_bpe,
    unicode_to_bytes,
)


# ---------------------------------------------------------------- #
# the byte<->unicode table
# ---------------------------------------------------------------- #
def test_table_is_a_256_bijection_with_pinned_values():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256
    # printable latin-1 bytes map to themselves
    for b in range(ord("!"), ord("~") + 1):
        assert table[b] == chr(b)
    # the famous GPT-2 mappings: space -> Ġ, newline -> Ċ, tab -> ĉ
    assert table[ord(" ")] == "Ġ"
    assert table[ord("\n")] == "Ċ"
    assert table[ord("\t")] == "ĉ"
    assert table[0] == "Ā"
    inv = unicode_to_bytes()
    assert all(inv[c] == b for b, c in table.items())


# ---------------------------------------------------------------- #
# naive reference trainer: its OWN table construction + recount every
# pair from scratch each round (independent of the incremental heap)
# ---------------------------------------------------------------- #
def _naive_table():
    printable = (
        list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    )
    t = {b: chr(b) for b in printable}
    n = 0
    for b in range(256):
        if b not in t:
            t[b] = chr(256 + n)
            n += 1
    return t


def _naive_learn_bytes(word_counts, num_merges, min_pair_count=2):
    t = _naive_table()
    words = {}  # mapped word -> (current symbols, count)
    for w, c in word_counts.items():
        if w and c > 0:
            mapped = "".join(
                t[b] for b in w.encode("utf-8", "surrogateescape")
            )
            words[mapped] = [list(mapped), c]
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for syms, c in words.values():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        for w, (syms, c) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = [out, c]
    return merges


WC_FIXED = {
    "low": 5,
    " lower": 2,
    "newest": 6,
    " widest": 3,
    " new": 2,
    "west": 1,
    " ai": 9,
    "a": 4,
    "naïve": 3,  # multi-byte UTF-8: ï is two byte symbols
    "日本": 2,  # three bytes per char
}


def test_learner_matches_naive_fixed():
    for n in (1, 3, 8, 50):
        assert learn_byte_bpe(dict(WC_FIXED), n) == _naive_learn_bytes(
            dict(WC_FIXED), n
        )


@settings(max_examples=30, deadline=None)
@given(
    st.dictionaries(
        st.text(
            alphabet="abé中 '\t\x00", min_size=1, max_size=8
        ),  # ASCII + 2-byte + 3-byte + controls
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=15,
    ),
    st.integers(min_value=1, max_value=12),
)
def test_learner_matches_naive_property(wc, n_merges):
    assert learn_byte_bpe(dict(wc), n_merges) == _naive_learn_bytes(
        dict(wc), n_merges
    )


# ---------------------------------------------------------------- #
# lossless arbitrary-byte round trip — the byte-level guarantee
# ---------------------------------------------------------------- #
GARBAGE = [
    b"",
    b"\xff\xfe\x00\x01",  # BOM-ish + controls, invalid UTF-8
    b"\x80\x81\x82",  # lone continuation bytes
    b"valid ascii",
    "mixed: café 日本".encode(),
    b"truncated utf8: \xe6\x97",  # cut mid-sequence
    bytes(range(256)),  # every byte value once
]


@pytest.fixture(scope="module")
def trained():
    return ByteBPETokenizer.from_merges(learn_byte_bpe(dict(WC_FIXED), 30))


def test_roundtrip_fixed_garbage(trained):
    for raw in GARBAGE:
        toks = trained.encode_bytes(raw)
        assert trained.decode_bytes(toks) == raw, raw
        # no OOV, ever: every token is in the vocab
        assert all(t in trained.vocab for t in toks), raw


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64))
def test_roundtrip_arbitrary_bytes_property(trained, raw):
    toks = trained.encode_bytes(raw)
    assert trained.decode_bytes(toks) == raw
    assert all(t in trained.vocab for t in toks)


def test_text_roundtrip_and_ids(trained):
    s = "the newest naïve 日本 text, it's low"
    toks = trained.encode_text(s)
    assert trained.decode_text(toks) == s
    ids = trained.encode_ids(s)
    assert trained.decode_ids(ids) == s.encode()
    # never the unknown id: the base alphabet covers everything
    assert all(i >= 0 for i in ids)


def test_vocab_layout_bytes_first_then_merges():
    tok = ByteBPETokenizer.from_merges([("l", "o"), ("lo", "w")])
    table = bytes_to_unicode()
    # ids 0..255 are the byte symbols in byte order
    for b in range(256):
        assert tok.vocab[table[b]] == b
    assert tok.vocab["lo"] == 256 and tok.vocab["low"] == 257
    assert len(tok.vocab) == 258


def test_save_load_roundtrip(tmp_path, trained):
    p = str(tmp_path / "tok.json")
    trained.save(p)
    tok2 = ByteBPETokenizer.load(p)
    assert tok2 == trained
    assert tok2.encode_text("newest low") == trained.encode_text("newest low")
    # a char-BPE artifact is refused (no silent mis-decode)
    import json

    (tmp_path / "char.json").write_text(
        json.dumps({"version": 1, "merges": [], "vocab": {}})
    )
    with pytest.raises(ValueError, match="byte_bpe"):
        ByteBPETokenizer.load(str(tmp_path / "char.json"))


# ---------------------------------------------------------------- #
# end-to-end on a Spark corpus
# ---------------------------------------------------------------- #
CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox is quick and brown",
    "lazy dogs and quick foxes don't mix",
    "it's the quickest of the quick brown foxes",
    "café naïve résumé 日本語 corpus",
] * 3


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )


def test_train_encode_end_to_end(spark, corpus):
    tok = train_byte_bpe(corpus, num_merges=60)
    assert 1 <= len(tok.merges) <= 60
    enc = corpus.select(
        "doc_id", tok.encode_col(spark, "text").alias("toks")
    ).collect()
    for r in enc:
        # Spark encode == driver reference encode, and lossless
        want = tok.encode_text(CORPUS[r["doc_id"]])
        assert r["toks"] == want
        assert tok.decode_text(r["toks"]) == CORPUS[r["doc_id"]]
    # the space-prefixed frequent word merged into one token: GPT-2's
    # ' quick' is 'Ġquick' in byte-symbol space
    assert "Ġquick" in tok.vocab


def test_binary_col_encode_matches_driver(spark, trained):
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(GARBAGE)],
        "i int, payload binary",
    )
    rows = df.select(
        "i", trained.encode_binary_col(spark, "payload").alias("toks")
    ).collect()
    for r in rows:
        assert r["toks"] == trained.encode_bytes(GARBAGE[r["i"]])
    # NULL payload -> empty token array (not a crash)
    null_df = spark.createDataFrame([(None,)], "payload binary")
    assert null_df.select(
        trained.encode_binary_col(spark, "payload").alias("t")
    ).first()["t"] == []


def test_train_determinism(spark, corpus):
    t1 = train_byte_bpe(corpus, num_merges=25)
    t2 = train_byte_bpe(corpus, num_merges=25)
    assert t1.merges == t2.merges and t1.vocab == t2.vocab


def test_tokenizer_stats_zero_oov(spark, corpus):
    """The shared eval harness runs on the byte tokenizer and reports
    structurally-zero OOV even on text the training never saw."""
    from snapflow_spark.functions.tokenizer_eval import tokenizer_stats

    tok = train_byte_bpe(corpus, num_merges=30)
    unseen = spark.createDataFrame(
        [(0, "кириллица never trained ☃")],
        "doc_id bigint, text string",
    )
    row = tokenizer_stats(spark, unseen, tok).first()
    assert row["n_tokens"] > 0 and row["n_oov_tokens"] == 0


def test_yaml_core_tokenize_dispatches_byte_bpe(spark, corpus, tmp_path):
    from snapflow_spark.plans.yaml_config import BUILTINS

    tok = train_byte_bpe(corpus, num_merges=30)
    p = str(tmp_path / "bb.json")
    tok.save(p)
    out = BUILTINS["core.tokenize"](spark, corpus, artifact=p)
    r = out.where("doc_id = 0").first()
    assert r["tokens"] == tok.encode_text(CORPUS[0])
    counts = BUILTINS["core.tokenize"](
        spark, corpus, artifact=p, counts_only=True
    ).where("doc_id = 0").first()
    assert counts["tokens"] == len(tok.encode_text(CORPUS[0]))


def test_cli_train_byte_bpe(spark, tmp_path, capsys):
    from snapflow_spark.cli import main

    out = str(tmp_path / "tok.json")
    assert main([
        "train-byte-bpe", out,
        "--sf", "/root/testdata/sf0.001", "--merges", "50",
    ]) == 0
    printed = capsys.readouterr().out
    assert "byte-level" in printed
    tok = ByteBPETokenizer.load(out)
    assert 1 <= len(tok.merges) <= 50
    assert tok.decode_bytes(tok.encode_bytes(b"\xff any bytes")) == (
        b"\xff any bytes"
    )


def test_special_tokens_reserved_and_round_trip(tmp_path):
    """GPT-2-style specials: dedicated ids after the merge vocab,
    unreachable from ordinary bytes, recognized as one token by the
    splitting encoder, lossless through decode, persisted."""
    tok = ByteBPETokenizer.from_merges(
        learn_byte_bpe(dict(WC_FIXED), 20), specials=("<|endoftext|>",)
    )
    eot = tok.vocab["<|endoftext|>"]
    assert eot == len(tok.vocab) - 1
    # ordinary encode treats the spelling as plain text (multi-token),
    # never emitting the reserved id
    plain = tok.encode_ids("a<|endoftext|>b")
    assert eot not in plain
    # the splitting encoder emits exactly one id at the boundary
    ids = tok.encode_ids_with_specials("newest<|endoftext|>low")
    assert ids.count(eot) == 1
    assert tok.decode_ids(ids) == b"newest<|endoftext|>low"
    # leading/trailing/adjacent separators
    ids2 = tok.encode_ids_with_specials("<|endoftext|><|endoftext|>")
    assert ids2 == [eot, eot]
    # persistence carries the specials
    p = str(tmp_path / "sp.json")
    tok.save(p)
    tok2 = ByteBPETokenizer.load(p)
    assert tok2.specials == ("<|endoftext|>",)
    assert tok2.encode_ids_with_specials("x<|endoftext|>y") == (
        tok.encode_ids_with_specials("x<|endoftext|>y")
    )
    # collision guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collides"):
        ByteBPETokenizer.from_merges([], specials=("a",))


def test_prefix_special_does_not_shadow_longer_special():
    """A special that is a prefix of another must not shadow it in the
    splitting encoder's alternation — the longer spelling wins
    (longest-first match), regardless of declaration order."""
    tok = ByteBPETokenizer.from_merges(
        [], specials=("<|eot|>", "<|eot|>x")
    )
    short_id = tok.vocab["<|eot|>"]
    long_id = tok.vocab["<|eot|>x"]
    assert tok.encode_ids_with_specials("<|eot|>x") == [long_id]
    assert tok.encode_ids_with_specials("<|eot|>") == [short_id]
    ids = tok.encode_ids_with_specials("a<|eot|>xb<|eot|>c")
    assert ids.count(long_id) == 1 and ids.count(short_id) == 1
    assert tok.decode_ids(ids) == b"a<|eot|>xb<|eot|>c"
