"""C4 cleaning rules (operators/c4.py): per-rule behavior on crafted
violators, full parity against an in-test pure-python reference over
randomized docs, badword token matching, threshold overrides, and the
map-only plan gate."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from snapflow_spark.operators.c4 import (
    C4_POLICY_SUBSTRINGS,
    SIGNAL_COLUMNS,
    c4_clean,
    c4_pass_expr,
    c4_signals,
)

_SENT_RE = re.compile(r'[.!?]"?([ \t\f\r\n]|$)')


def ref_line_kept(x: str, min_words: int = 5) -> bool:
    lx = x.lower()
    if not re.search(r'[.!?"]$', x):
        return False
    if re.search(r"\.\.\.$", x):
        return False
    if len(re.findall(r"[^ \t\f\r]+", x)) < min_words:
        return False
    if "javascript" in lx:
        return False
    if any(p in lx for p in C4_POLICY_SUBSTRINGS):
        return False
    return True


def ref_c4(text: str, badwords=(), min_words=5):
    """Single-process reference of every signal, using the module's
    pinned definitions."""
    lines = [x.strip(" ") for x in re.split(r"\r?\n", text)]
    kept = [x for x in lines if ref_line_kept(x, min_words)]
    joined = "\n".join(kept)
    lower_words = re.findall(r"\S+", text.lower())
    bad = {b.lower() for b in badwords}
    return {
        "c4_n_lines": len(lines),
        "c4_n_kept_lines": len(kept),
        "c4_n_sentences": len(_SENT_RE.findall(joined)),
        "c4_has_lorem_ipsum": int("lorem ipsum" in text.lower()),
        "c4_has_curly": int("{" in text),
        "c4_badword_hits": sum(w in bad for w in lower_words),
        "c4_text": joined,
    }


GOOD_LINE = "This is a perfectly normal sentence with many words."
GOOD_PAGE = "\n".join(
    [
        "Here is the first proper sentence of the page.",
        "Here is the second proper sentence of the page!",
        "And here is a third one, to clear the sentence floor?",
    ]
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )


def test_line_rules_each_violator_dropped(spark):
    violators = [
        "No terminal punctuation here at all",          # end mark
        "This line trails off into an ellipsis...",     # ellipsis end
        "Too short.",                                    # < 5 words
        "Please enable javascript to view this page.",   # javascript
        "You agree to our terms of use and more words.", # policy
    ]
    text = "\n".join([GOOD_PAGE, *violators])
    row = c4_signals(_df(spark, [text])).collect()[0]
    assert row.c4_n_kept_lines == 3
    kept_lines = row.c4_text.split("\n")
    assert kept_lines == GOOD_PAGE.split("\n")
    for v in violators:
        assert not ref_line_kept(v)
    assert ref_line_kept(GOOD_LINE)


def test_page_rules_reject(spark):
    pages = [
        GOOD_PAGE,                                            # keeps
        GOOD_PAGE + "\nSome lorem ipsum filler text here.",   # lorem
        GOOD_PAGE + "\nfunction f() { return 1; }",           # curly
        "Only one proper sentence lives on this page.",       # < 3 sents
    ]
    out = c4_clean(_df(spark, pages))
    kept = {r.doc_id for r in out.collect()}
    assert kept == {"d0"}
    # thresholds are overridable: with a floor of 1 the short page survives
    out2 = c4_clean(_df(spark, pages), min_num_sentences=1)
    assert {r.doc_id for r in out2.collect()} == {"d0", "d3"}


def test_badword_token_matching(spark):
    pages = [
        GOOD_PAGE + "\nThe word badstuff appears here as a token, yes.",
        GOOD_PAGE + "\nThe word notbadstuffy appears only as a substring, yes.",
    ]
    out = c4_clean(_df(spark, pages), badwords=("BADSTUFF",))
    assert {r.doc_id for r in out.collect()} == {"d1"}


def test_clean_replaces_text_and_keeps_shape(spark):
    df = _df(spark, [GOOD_PAGE + "\nno end mark so this line drops"])
    out = c4_clean(df)
    assert out.columns == df.columns
    assert out.collect()[0].text == GOOD_PAGE
    sig = c4_clean(df, keep_signals=True)
    assert set(SIGNAL_COLUMNS) <= set(sig.columns)


def test_randomized_parity_with_reference(spark):
    rng = random.Random(94)
    frags = [
        GOOD_LINE,
        "short.",
        "trailing ellipsis with plenty of words goes on...",
        "A fine question with enough words to pass, right?",
        'He said the quoted words end with a mark."',
        "  \tleading blanks but a proper sentence ending here.",
        "Use of cookies is described in many words here.",
        "lorem ipsum",
        "js-free line about JavaScript frameworks and more words.",
        "brace { inside",
        "Ends with bang and has quite a few words!",
        "",
        "word",
        "a.. b.. c.. d.. e..",
    ]
    texts = []
    for _ in range(40):
        n = rng.randint(0, 8)
        sep = ["\n", "\r\n"]
        t = ""
        for i in range(n):
            t += rng.choice(frags) + rng.choice(sep)
        texts.append(t + rng.choice(frags))
    bad = ("badstuff", "verybad")
    rows = (
        c4_signals(_df(spark, texts), badwords=bad)
        .orderBy("doc_id")
        .collect()
    )
    by_id = {r.doc_id: r for r in rows}
    for i, t in enumerate(texts):
        want = ref_c4(t, badwords=bad)
        got = by_id[f"d{i}"]
        for k, v in want.items():
            assert got[k] == v, (k, repr(t))


def test_pass_expr_matches_reference_decision(spark):
    rng = random.Random(7)
    texts = [
        GOOD_PAGE,
        GOOD_PAGE.replace("page.", "page{."),
        "One sentence only here with enough words to keep.",
        GOOD_PAGE + "\nlorem ipsum dolor sit amet and more words here.",
    ]
    sig = c4_signals(_df(spark, texts))
    got = {
        r.doc_id: bool(r.keep)
        for r in sig.select("doc_id", c4_pass_expr().alias("keep")).collect()
    }
    for i, t in enumerate(texts):
        w = ref_c4(t)
        want = (
            not w["c4_has_lorem_ipsum"]
            and not w["c4_has_curly"]
            and w["c4_n_sentences"] >= 3
        )
        assert got[f"d{i}"] == want, repr(t)


def test_plan_is_map_only_no_python(spark):
    df = _df(spark, [GOOD_PAGE])
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


# --- non-English retargeting (round 10) ---------------------------------

FR_POLICY = ("politique de confidentialité", "conditions d'utilisation")
FR_PAGE = "\n".join(
    [
        "Voici la première phrase correcte de la page entière.",
        "Voici la deuxième phrase correcte de la page entière!",
        "Et voici une troisième phrase pour le plancher requis?",
        "Consultez notre politique de confidentialité pour détails.",
    ]
)


def test_policy_substrings_retarget(spark):
    """The English boilerplate list misses French policy lines; a
    corpus-wide policy_substrings= drops them. Defaults unchanged:
    no kwargs == the published list (pinned by equality)."""
    df = _df(spark, [FR_PAGE])
    base = c4_signals(df).collect()[0]
    assert base.c4_n_kept_lines == 4  # English list: policy line kept
    fr = c4_signals(df, policy_substrings=FR_POLICY).collect()[0]
    assert fr.c4_n_kept_lines == 3  # French list drops it
    assert "politique" not in fr.c4_text
    # explicit default == implicit default, line for line
    same = c4_signals(df, policy_substrings=C4_POLICY_SUBSTRINGS).collect()[0]
    assert same == base


def test_per_lang_policy_and_badwords_route_per_row(spark):
    en_page = "\n".join(
        [
            GOOD_PAGE,
            "Please read our privacy policy before continuing today.",
        ]
    )
    df = spark.createDataFrame(
        [
            ("e1", "en", en_page),
            ("f1", "fr", FR_PAGE),
            ("x1", "it", FR_PAGE),  # unrouted: corpus-wide default
        ],
        "doc_id string, lang string, text string",
    )
    sig = {
        r.doc_id: r
        for r in c4_signals(
            df,
            policy_by_lang={"en": C4_POLICY_SUBSTRINGS, "fr": FR_POLICY},
            badwords_by_lang={"fr": ("page",), "en": ("zzz",)},
        ).collect()
    }
    assert sig["e1"].c4_n_kept_lines == 3  # English policy line dropped
    assert sig["f1"].c4_n_kept_lines == 3  # French policy line dropped
    assert sig["x1"].c4_n_kept_lines == 4  # default list keeps it
    assert sig["f1"].c4_badword_hits == 2  # 'page' counted in French
    assert sig["e1"].c4_badword_hits == 0


def test_multilingual_c4_plan_stays_map_only(spark):
    df = spark.createDataFrame(
        [("d", "fr", FR_PAGE)], "doc_id string, lang string, text string"
    )
    plan = (
        c4_signals(
            df,
            policy_by_lang={"fr": FR_POLICY},
            badwords_by_lang={"fr": ("mot",)},
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_yaml_c4_multilingual_e2e(spark, tmp_path):
    from snapflow_spark.plans import load_graph

    df = spark.createDataFrame(
        [(1, "fr", FR_PAGE)], "doc_id long, lang string, text string"
    )
    df.createOrReplaceTempView("raw_c4_ml")
    cfg = {
        "warehouse": str(tmp_path / "wh_c4ml"),
        "nodes": [
            {
                "name": "raw",
                "function": "core.sql",
                "params": {"sql": "SELECT * FROM raw_c4_ml"},
                "overwrite": True,
            },
            {
                "name": "clean",
                "function": "core.c4_clean",
                "upstream": {"input": "raw"},
                "params": {
                    "policy_by_lang": {"fr": list(FR_POLICY)},
                    "keep_signals": True,
                },
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    g.produce(spark)
    rows = g.read(spark, "clean").collect()
    assert len(rows) == 1
    assert rows[0].c4_n_kept_lines == 3
    assert "politique" not in rows[0].text
