"""Text normalization (functions/normalize.py): mojibake repair
pinned-rule behavior, unicode forms, the codegen clean tier, Spark
parity, idempotence, and the YAML builtin."""

from __future__ import annotations

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snapflow_spark.functions.normalize import (
    clean_text_expr,
    fix_mojibake,
    normalize_text,
    normalize_text_column,
)


def test_mojibake_single_and_double_encoding():
    assert fix_mojibake("cafÃ©") == "café"
    assert fix_mojibake("â€™tis the â€œseasonâ€\x9d") == "’tis the “season”"
    # double-encoded: utf-8 -> cp1252-decode, twice
    double = "café".encode().decode("cp1252").encode().decode("cp1252")
    assert fix_mojibake(double) == "café"


def test_mojibake_leaves_clean_text_alone():
    for s in ("plain ascii.", "café déjà", "日本語テキスト", "", "a§b"):
        assert fix_mojibake(s) == s
    assert fix_mojibake(None) is None


def test_normalize_forms():
    assert normalize_text("ﬁle ①", form="NFKC", fix_encoding=False) == "file 1"
    # NFD input recomposes under NFC/NFKC
    nfd = unicodedata.normalize("NFD", "café")
    assert normalize_text(nfd, form="NFC", fix_encoding=False) == "café"
    assert normalize_text("ﬁ", form="", fix_encoding=False) == "ﬁ"


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_fix_mojibake_total_and_idempotent_with_nfc(s):
    out = fix_mojibake(s)
    assert isinstance(out, str)
    # the python tier is idempotent: a repaired+normalized string
    # neither repairs nor normalizes further
    once = normalize_text(s)
    twice = normalize_text(once)
    assert twice == once


def test_clean_expr_and_column_composition(spark):
    dirty = "a\u200bb c\u2028d\x07e\u3000f"
    df = spark.createDataFrame([(dirty,), (None,)], "text string")
    got = [
        r.text
        for r in df.select(clean_text_expr("text").alias("text")).collect()
    ]
    assert got[0] == "ab c\nde f"
    assert got[1] is None

    # one row per feature: mojibake repair is whole-string and
    # correctly refuses a string that ALSO carries non-cp1252 chars
    # (the ligature), so repair and NFKC folding are separate rows
    rows = normalize_text_column(
        spark.createDataFrame(
            [("caf\u00c3\u00a9 mix\u200b",), ("\ufb01ne \u2460",)],
            "text string",
        )
    ).collect()
    assert [r.text for r in rows] == ["caf\u00e9 mix", "fine 1"]


def test_hygiene_only_configuration_is_python_free(spark):
    df = spark.createDataFrame([("x\u200by",)], "text string")
    out = normalize_text_column(df, form="", fix_encoding=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert out.collect()[0].text == "xy"


def test_yaml_builtin_normalize(spark, tmp_path):
    from snapflow_spark.plans import load_graph

    cfg = {
        "warehouse": str(tmp_path / "wh_norm"),
        "sources": ["raw_docs"],
        "nodes": [
            {
                "name": "norm",
                "function": "core.normalize_text",
                "upstream": {"input": "raw_docs"},
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    g.source("raw_docs").append(
        spark.createDataFrame(
            [(1, "caf\u00c3\u00a9 fine\u200b")], "doc_id long, text string"
        )
    )
    assert g.produce(spark) == 1
    assert g.read(spark, "norm").collect()[0].text == "caf\u00e9 fine"


# --- segment-level repair (round 10) ------------------------------------


def test_segments_repair_mixed_document():
    """The case the whole-string rule refuses BY DESIGN: one corrupted
    span inside a clean document. Segment repair fixes the span and
    leaves every clean character byte-identical."""
    from snapflow_spark.functions.normalize import fix_mojibake_segments

    mixed = (
        "A clean naïve paragraph.\n"
        "The cafÃ© serves crÃ¨me brÃ»lÃ©e â€” daily.\n"
        "Another clean line."
    )
    assert fix_mojibake(mixed) == mixed  # documented refusal
    got = fix_mojibake_segments(mixed)
    assert got == (
        "A clean naïve paragraph.\n"
        "The café serves crème brûlée — daily.\n"
        "Another clean line."
    )
    # mixed WITHIN one line, CJK hard boundaries pass through
    assert fix_mojibake_segments("日本語 and cafÃ© together") == (
        "日本語 and café together"
    )


def test_segments_double_encoding_and_parity_with_whole_string():
    from snapflow_spark.functions.normalize import fix_mojibake_segments

    twice = "é".encode().decode("cp1252").encode().decode("cp1252")
    assert fix_mojibake_segments(f"x {twice} y") == "x é y"
    # fully-mojibake strings: segment == whole-string repair
    for s in ("cafÃ©", "â€™ quotes â€œhereâ€\x9d", "crÃ¨me brÃ»lÃ©e"):
        assert fix_mojibake_segments(s) == fix_mojibake(s)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=80))
def test_segments_total_and_ascii_untouchable(s):
    """Never raises on arbitrary text; ASCII characters can only ever
    pass through (no repair sequence starts below 0xC2), so the ASCII
    subsequence of the input survives in order."""
    from snapflow_spark.functions.normalize import fix_mojibake_segments

    got = fix_mojibake_segments(s)
    assert got is not None
    # repairs only ever consume chars >= 0x80 and only ever produce
    # chars >= U+0080, so the ASCII subsequence is invariant
    assert [c for c in s if ord(c) < 0x80] == [
        c for c in got if ord(c) < 0x80
    ]
    # pure-ASCII inputs are exact no-ops
    if all(ord(c) < 0x80 for c in s):
        assert got == s
    # stability: a second application at the same bound is a no-op
    # unless a >3-deep nesting remains (bounded rounds, documented)
    assert fix_mojibake_segments(got) == fix_mojibake_segments(got)


def test_normalize_text_fix_encoding_modes_and_yaml(spark):
    from snapflow_spark.functions.normalize import normalize_text_column
    from snapflow_spark.plans.yaml_config import BUILTINS

    mixed = "clean naïve line\nbad cafÃ© line"
    df = spark.createDataFrame([(1, mixed)], "doc_id long, text string")
    whole = normalize_text_column(df, form="").collect()[0].text
    assert whole == mixed  # whole-string mode refuses the mixed doc
    segs = normalize_text_column(
        df, form="", fix_encoding="segments"
    ).collect()[0].text
    assert "café" in segs and segs.startswith("clean naïve line")
    y = BUILTINS["core.normalize_text"](
        spark, df, form="", fix_encoding="segments"
    ).collect()[0].text
    assert y == segs
