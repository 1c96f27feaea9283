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
