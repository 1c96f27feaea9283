"""Gopher quality rules (operators/gopher.py): per-rule behavior on
crafted violators, full-signal parity against an in-test pure-python
reference over randomized docs, NULL/empty safety, threshold
overrides, and the no-python plan gate."""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from snapflow_spark.operators.gopher import (
    GOPHER_DEFAULTS,
    GOPHER_STOPWORDS,
    gopher_pass_expr,
    gopher_quality_filter,
    gopher_signals,
)

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


def ref_signals(text: str) -> dict:
    """Single-process reference of every signal, using the module's
    pinned definitions (beyond-first for lines/paras, all-occurrences
    of duplicated grams, max(cnt*len) for top grams)."""
    words = re.findall(r"\S+", text)
    lw = [w.lower() for w in words]
    n_words = len(words)
    word_chars = len(re.sub(r"\s", "", text))
    lines_all = text.split("\n")
    nb_lines = [x for x in lines_all if re.search(r"\S", x)]
    sig = {
        "n_words": n_words,
        "mean_word_len": word_chars / n_words if n_words else None,
        "hash_word_ratio": text.count("#") / n_words if n_words else None,
        "ellipsis_word_ratio": (
            (len(text) - len(text.replace("...", ""))) / 3 / n_words
            if n_words else None
        ),
        "bullet_line_frac": (
            sum(bool(re.match(r"^\s*[-*•‣▪]", x)) for x in nb_lines)
            / len(nb_lines) if nb_lines else None
        ),
        "ellipsis_line_frac": (
            sum(bool(re.search(r"(\.\.\.|…)\s*$", x)) for x in nb_lines)
            / len(nb_lines) if nb_lines else None
        ),
        "alpha_word_frac": (
            sum(any(ch.isalpha() for ch in w) for w in words) / n_words
            if n_words else None
        ),
        "stop_hits": sum(sw in lw for sw in GOPHER_STOPWORDS),
    }

    def rep(units):
        c = Counter(units)
        total = sum(c.values())
        total_chars = sum(cnt * len(u) for u, cnt in c.items())
        extra = sum(cnt - 1 for cnt in c.values() if cnt > 1)
        extra_chars = sum((cnt - 1) * len(u) for u, cnt in c.items() if cnt > 1)
        dupall = sum(cnt * len(u) for u, cnt in c.items() if cnt > 1)
        top = max((cnt * len(u) for u, cnt in c.items()), default=0)
        return total, total_chars, extra, extra_chars, dupall, top

    lines = [x.strip() for x in lines_all if x.strip()]
    paras = [x.strip() for x in re.split(r"\n{2,}", text) if x.strip()]
    for kind, units in (("line", lines), ("para", paras)):
        total, tchars, extra, echars, _, _ = rep(units)
        sig[f"dup_{kind}_frac"] = extra / total if total else 0.0
        sig[f"dup_{kind}_char_frac"] = echars / tchars if tchars else 0.0
    for n in (*TOP_NS, *DUP_NS):
        grams = (
            [" ".join(words[i : i + n]) for i in range(n_words - n + 1)]
            if n_words >= n
            else [" ".join(words)]
        )
        _, tchars, _, _, dupall, top = rep(grams)
        if n in TOP_NS:
            sig[f"top{n}_char_frac"] = top / tchars if tchars else 0.0
        else:
            sig[f"dup{n}_char_frac"] = dupall / tchars if tchars else 0.0
    return sig


WORDS = (
    "the cat sat on a mat and that dog did have fun with some of it "
    "while we be watching more words appear here today quietly"
).split()


def synth_doc(i: int) -> str:
    rng = random.Random(i)
    lines = []
    for _ in range(rng.randint(1, 8)):
        line = " ".join(rng.choices(WORDS, k=rng.randint(2, 12)))
        if rng.random() < 0.2:
            line = "- " + line
        if rng.random() < 0.2:
            line += "..."
        lines.append(line)
        if rng.random() < 0.3:
            lines.append(lines[-1])  # planted duplicate line
        if rng.random() < 0.2:
            lines.append("")  # paragraph break
    return "\n".join(lines)


def test_signals_match_python_reference(spark):
    docs = [(i, synth_doc(i)) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r.asDict() for r in gopher_signals(df).collect()}
    for i, text in docs:
        want = ref_signals(text)
        got = rows[i]
        for kname, wv in want.items():
            gv = got[kname]
            if wv is None:
                assert gv is None or gv == 0.0, (i, kname, gv)
            else:
                assert gv == pytest.approx(wv, abs=1e-9), (i, kname, gv, wv)


def _one(spark, text, thresholds=None):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_quality_filter(df, thresholds=thresholds).count() == 1


def test_each_rule_rejects_its_violator(spark):
    # genuinely non-repetitive: every filler word unique (no gram can
    # duplicate), stopwords present, mean word length in range
    uniq = [f"word{i:02d}" for i in range(52)]
    toks = ["the", "be", "to", "of", "and", "that", "have", "with", *uniq]
    good = "\n".join(" ".join(toks[i : i + 12]) for i in range(0, 60, 12))
    assert _one(spark, good)
    # too short
    assert not _one(spark, "the cat sat with that")
    # mean word length too high (long tokens)
    assert not _one(spark, " ".join("wordiness" * 3 for _ in range(60)) + " the of and")
    # symbol ratio: a '#' per word
    assert not _one(spark, " ".join(f"#{w}" for w in WORDS * 3))
    # ellipsis line endings on every line
    bad_ellipsis = "\n".join(
        " ".join(WORDS[(i + j) % len(WORDS)] for j in range(13)) + "..."
        for i in range(5)
    )
    assert not _one(spark, bad_ellipsis)
    # no required stopwords
    assert not _one(
        spark, " ".join(f"tok{i}" for i in range(80))
    )
    # alphabetic-word fraction: mostly numbers
    assert not _one(
        spark, "the of " + " ".join(str(i) for i in range(80))
    )
    # duplicate lines dominate
    line = " ".join(WORDS[:13])
    assert not _one(spark, "\n".join([line] * 6))
    # repeated 5-gram phrase dominates (dup5_char_frac)
    phrase = "the cat sat on mats"
    filler = " ".join(WORDS[5:18])
    assert not _one(spark, " ".join([phrase] * 12) + " " + filler)


def test_threshold_overrides_and_unknown_key(spark):
    short = "the cat sat with that and more of it be here now"
    assert not _one(spark, short)  # fails the 50-word floor
    assert _one(spark, short, thresholds={"min_words": 5})
    with pytest.raises(ValueError, match="unknown gopher thresholds"):
        gopher_pass_expr({"min_wordz": 1})


def test_null_and_empty_docs_fail_closed(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   \n  ")], "doc_id long, text string"
    )
    assert gopher_quality_filter(df).count() == 0
    sig = gopher_signals(df)
    assert sig.count() == 3  # signals never drop rows
    assert sig.where(gopher_pass_expr()).count() == 0


def test_keep_signals_and_shape(spark):
    df = spark.createDataFrame([(1, synth_doc(3))], "doc_id long, text string")
    audited = gopher_quality_filter(df, keep_signals=True)
    assert "dup_line_frac" in audited.columns
    plain = gopher_quality_filter(df)
    assert plain.columns == df.columns


def test_plan_is_one_arrow_crossing_no_shuffle(spark):
    # round 17: the repetition tier is ONE Arrow-batched pandas UDF
    # (vectorized numpy/pandas — the interpreted fold battery it
    # replaced cost ~4 ms/KB of task CPU); the plan must stay
    # shuffle-free with exactly one ArrowEvalPython and no
    # row-pickled BatchEvalPython.
    df = spark.createDataFrame([(1, synth_doc(1))], "doc_id long, text string")
    plan = (
        gopher_signals(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_defaults_cover_every_threshold_key():
    # every threshold named in the pass expression exists in defaults
    assert set(GOPHER_DEFAULTS) == {
        "min_words", "max_words", "min_mean_word_len", "max_mean_word_len",
        "max_hash_word_ratio", "max_ellipsis_word_ratio",
        "max_bullet_line_frac", "max_ellipsis_line_frac",
        "min_alpha_word_frac", "min_stop_hits",
        "max_dup_line_frac", "max_dup_para_frac",
        "max_dup_line_char_frac", "max_dup_para_char_frac",
        *(f"max_top{n}_char_frac" for n in TOP_NS),
        *(f"max_dup{n}_char_frac" for n in DUP_NS),
    }


def test_line_units_are_space_trimmed(spark):
    # regression: F.transform(arr, F.trim) silently no-ops (F.trim's
    # optional 2nd param makes transform pass (element, index), the
    # index becoming the trim-character set) — "a." and "  a.  " must
    # count as the SAME duplicate line unit, like the oracle's trim
    text = "a.\n  a.  \nb."
    row = gopher_signals(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).collect()[0]
    assert row.dup_line_frac == pytest.approx(1 / 3)


# --- non-English retargeting (round 10) ---------------------------------

GERMAN_STOPS = ("der", "die", "und", "das", "ist", "von", "mit", "auch")


def _german_doc() -> str:
    """A perfectly healthy German document: >=50 words, unique filler
    words (no gram duplicates), stopwords from the GERMAN list, in-range
    word lengths — everything passes EXCEPT the English stopword rule."""
    uniq = [f"wort{i:02d}" for i in range(52)]
    toks = [*GERMAN_STOPS, *uniq]
    return "\n".join(" ".join(toks[i : i + 12]) for i in range(0, 60, 12))


def test_english_stopword_rule_wrongly_rejects_german(spark):
    """The documented failure the knob exists for: on a healthy
    non-English corpus the paper's English list scores stop_hits 0 and
    rejects EVERYTHING; retargeting stopwords= keeps everything."""
    docs = spark.createDataFrame(
        [(i, _german_doc()) for i in range(5)], "doc_id long, text string"
    )
    assert gopher_quality_filter(docs).count() == 0
    assert (
        gopher_quality_filter(docs, stopwords=GERMAN_STOPS).count() == 5
    )
    # the override touches ONLY stop_hits: every other signal is equal
    a = gopher_signals(docs).drop("stop_hits").collect()
    b = gopher_signals(docs, stopwords=GERMAN_STOPS).drop("stop_hits").collect()
    assert a == b


def test_stopwords_by_lang_routes_per_row(spark):
    """A mixed en/de corpus with a lang column (core.lang_id's output
    shape): per-language lists route per ROW; rows with an unrouted
    lang fall back to the corpus-wide default."""
    uniq = [f"word{i:02d}" for i in range(52)]
    en = "\n".join(
        " ".join(["the", "be", "to", "of", "and", "that", "have", "with", *uniq][i : i + 12])
        for i in range(0, 60, 12)
    )
    de = _german_doc()
    df = spark.createDataFrame(
        [(1, "en", en), (2, "de", de), (3, "fr", de), (4, "de", en)],
        "doc_id long, lang string, text string",
    )
    routed = gopher_signals(
        df,
        stopwords_by_lang={"en": GOPHER_STOPWORDS, "de": GERMAN_STOPS},
    )
    hits = {r.doc_id: r.stop_hits for r in routed.collect()}
    assert hits[1] == 8  # English doc scored by the English list
    assert hits[2] == 8  # German doc scored by the German list
    assert hits[3] == 0  # unrouted lang falls back to the paper list
    assert hits[4] == 0  # German list applied to the English doc: miss
    kept = gopher_quality_filter(
        df, stopwords_by_lang={"en": GOPHER_STOPWORDS, "de": GERMAN_STOPS}
    )
    assert {r.doc_id for r in kept.collect()} == {1, 2}


def test_multilingual_plan_stays_one_crossing_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "de", "x")], "doc_id long, lang string, text string"
    )
    plan = (
        gopher_signals(
            df, stopwords_by_lang={"de": GERMAN_STOPS, "fr": ("le", "la")}
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the when-chain stopword routing itself adds no python and no
    # shuffle; the one ArrowEvalPython is the repetition tier (r17)
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_yaml_gopher_multilingual_e2e(spark, tmp_path):
    """core.gopher_filter with stopwords_by_lang declared entirely in
    YAML — the per-language config a lang_id-routed pipeline ships."""
    from snapflow_spark.plans import load_graph

    src = spark.createDataFrame(
        [(1, "de", _german_doc())], "doc_id long, lang string, text string"
    )
    src.createOrReplaceTempView("raw_docs_ml")
    cfg = {
        "warehouse": str(tmp_path / "wh_ml"),
        "nodes": [
            {
                "name": "raw",
                "function": "core.sql",
                "params": {"sql": "SELECT * FROM raw_docs_ml"},
                "overwrite": True,
            },
            {
                "name": "clean",
                "function": "core.gopher_filter",
                "upstream": {"input": "raw"},
                "params": {
                    "stopwords_by_lang": {"de": list(GERMAN_STOPS)},
                    "keep_signals": True,
                },
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    g.produce(spark)
    rows = g.read(spark, "clean").collect()
    assert len(rows) == 1 and rows[0].stop_hits == 8
