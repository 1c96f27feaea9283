"""Corpus profiler (operators/profile.py): the card's counters match
exact computation, sketch estimates are tight at test sizes, partials
MERGE (two batches rolled up == one pass over the union — the
incremental data-card contract), grouping works at both layers, and
the plan is one aggregation over the text scan (no UDFs).
"""

import pytest
from pyspark.sql import functions as F

from snapflow_spark.functions.text import token_count_expr
from snapflow_spark.operators.profile import (
    corpus_profile,
    profile_partials,
    profile_report,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(200):
        lang = "en" if i % 3 else "de"
        body = f"the quick brown fox {i % 40} jumps over the lazy dog " * (
            1 + i % 7
        )
        rows.append((i, lang, body))
    for i in range(200, 210):  # exact duplicates of doc 0's text
        rows.append((i, "en", rows[0][2]))
    rows.append((210, "en", "   "))  # whitespace-only doc
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_card_counters_match_exact(spark, docs):
    card = corpus_profile(docs).collect()[0]
    exact = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.sum(token_count_expr("text")).alias("toks"),
    ).collect()[0]
    assert card.n_docs == exact.n
    assert card.n_chars == exact.chars
    assert card.n_tokens == exact.toks
    assert card.pct_empty == round(1 / exact.n, 6)
    assert card.mean_tokens == round(exact.toks / exact.n, 2)
    # 40 distinct texts among the repeated bodies + dups + empty doc:
    # HLL at lgk=12 is exact-ish at this cardinality
    n_exact_distinct = docs.select(
        F.countDistinct(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "))
    ).collect()[0][0]
    assert abs(card.n_distinct_docs - n_exact_distinct) <= 2
    assert card.dup_rate == pytest.approx(
        1 - card.n_distinct_docs / card.n_docs, abs=1e-6
    )


def test_quantiles_bracket_exact(spark, docs):
    card = corpus_profile(docs).collect()[0]
    toks = sorted(
        r[0] for r in docs.select(token_count_expr("text")).collect()
    )
    # KLL at k=200 over 211 points is exact; allow rank slack of 2
    for p, col in [(0.5, "tokens_p50"), (0.9, "tokens_p90")]:
        lo = toks[max(0, int(p * len(toks)) - 2)]
        hi = toks[min(len(toks) - 1, int(p * len(toks)) + 2)]
        assert lo <= getattr(card, col) <= hi


def _cards_equal(merged, onepass):
    """Counters must match exactly; quantile columns only within a
    small relative tolerance — KLL is a compaction sketch, so merging
    two sketches is not bit-identical to building one (both answers
    carry the same rank guarantee)."""
    m, o = merged.asDict(), onepass.asDict()
    assert set(m) == set(o)
    for k in m:
        if k.startswith(("tokens_p", "chars_p")):
            assert m[k] == pytest.approx(o[k], rel=0.06), k
        else:
            assert m[k] == o[k], k


def test_partials_merge_across_batches(spark, docs):
    a = docs.where("doc_id < 100")
    b = docs.where("doc_id >= 100")
    merged = profile_report(
        profile_partials(a, "text").unionByName(profile_partials(b, "text"))
    ).collect()[0]
    _cards_equal(merged, corpus_profile(docs).collect()[0])


def test_grouped_card_and_coarser_rollup(spark, docs):
    by_lang = {
        r.lang: r for r in corpus_profile(docs, by=["lang"]).collect()
    }
    assert set(by_lang) == {"en", "de"}
    exact_en = docs.where("lang = 'en'").count()
    assert by_lang["en"].n_docs == exact_en
    # partials grouped by lang, report rolled up to GLOBAL: equals the
    # ungrouped card (merge algebra is grouping-invariant)
    rolled = profile_report(profile_partials(docs, "text", by=["lang"])).collect()[0]
    _cards_equal(rolled, corpus_profile(docs).collect()[0])


def test_plan_is_one_codegen_agg_no_udf(spark, docs):
    plan = profile_partials(docs, "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") <= 2  # partial + final, one agg pair


def test_yaml_builtin_modes(spark, docs):
    from snapflow_spark.plans.yaml_config import BUILTINS

    fn = BUILTINS["core.profile"]
    card = fn(spark, docs).collect()
    assert len(card) == 1 and card[0].n_docs == 211
    partials = fn(spark, docs, by="lang", mode="partials")
    assert partials.count() == 2 and "kll_tokens" in partials.columns
    # rollup consumes partials (not text) and reproduces the card
    rolled = fn(spark, partials, mode="rollup").collect()[0]
    assert rolled.n_docs == card[0].n_docs
    assert rolled.n_tokens == card[0].n_tokens
    with pytest.raises(ValueError, match="report|partials"):
        fn(spark, docs, mode="nope")


def test_profile_diff_flags_shape_drift_only(spark, docs):
    from snapflow_spark.operators.profile import profile_diff

    base = corpus_profile(docs)
    # a drifted batch: half the docs (counts legitimately shrink) but
    # texts doubled in length (shape drift that MUST flag)
    drifted = corpus_profile(
        docs.where("doc_id % 2 = 0").selectExpr(
            "doc_id", "lang", "concat(text, ' ', text) AS text"
        )
    )
    diff = {r.metric: r for r in profile_diff(base, drifted).collect()}
    # counts changed but are never breaches
    assert diff["n_docs"].ratio < 0.6 and not diff["n_docs"].breach
    # mean tokens ~doubled: a breach
    assert diff["mean_tokens"].ratio > 1.8 and diff["mean_tokens"].breach
    # mean quality barely moves: no breach
    assert not diff["mean_quality"].breach
    # every card metric is represented
    assert len(diff) == len(base.columns)


def test_profile_diff_self_is_breach_free(spark):
    """A CLEAN corpus diffed against itself must report ZERO breaches —
    pct_empty and dup_rate are 0 on both sides, so the b/a ratio is
    NULL; a 0-vs-0 NULL ratio is only a breach when the values
    actually differ."""
    from snapflow_spark.operators.profile import profile_diff

    clean = spark.createDataFrame(
        [(i, f"unique document body number {i} with words") for i in range(50)],
        "doc_id long, text string",
    )
    card = corpus_profile(clean)
    rows = profile_diff(card, card).collect()
    zeros = [r.metric for r in rows if r.a == 0 and r.b == 0]
    assert "pct_empty" in zeros and "dup_rate" in zeros
    assert [r.metric for r in rows if r.breach] == []
    # a genuinely-moved zero metric still flags: plant empty docs
    dirty = corpus_profile(
        clean.selectExpr(
            "doc_id",
            "CASE WHEN doc_id % 3 = 0 THEN '' ELSE text END AS text",
        )
    )
    diff2 = {r.metric: r for r in profile_diff(card, dirty).collect()}
    assert diff2["pct_empty"].breach


def test_profile_cli_prints_card(spark, docs, tmp_path, capsys):
    import json as _json

    from snapflow_spark.cli import main

    p = str(tmp_path / "docs.parquet")
    docs.write.parquet(p)
    assert main(["profile", p, "--by", "lang"]) == 0
    lines = [
        _json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    assert {d["lang"] for d in lines} == {"en", "de"}
    assert all(d["n_docs"] > 0 for d in lines)


def test_embedding_profile_surfaces_pathologies(spark):
    from snapflow_spark.operators.profile import embedding_profile

    rows = [
        (0, [3.0, 4.0]),          # norm 5
        (1, [1.0, 0.0]),          # unit
        (2, [0.0, 0.0]),          # zero vector
        (3, None),                # NULL
        (4, []),                  # empty
        (5, [float("nan"), 1.0]), # non-finite
        (6, [1.0, 2.0, 2.0]),     # dim mismatch (norm 3)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    card = embedding_profile(df).collect()[0]
    assert card.n_vecs == 7
    assert card.n_null == 1
    assert card.n_empty == 1
    assert card.n_zero == 1
    assert card.n_nonfinite == 1
    assert (card.dim_min, card.dim_max) == (0, 3)
    assert not card.dim_consistent
    # norms over the finite, non-null vectors: 5, 1, 0, 0(empty), 3
    assert card.mean_norm == pytest.approx((5 + 1 + 0 + 0 + 3) / 5, abs=1e-6)
    assert card.norm_p99 == pytest.approx(5.0, abs=1e-6)

    clean = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(10)], "vec_id long, embedding array<double>"
    )
    c2 = embedding_profile(clean).collect()[0]
    assert c2.dim_consistent and c2.n_zero == 0 and c2.n_nonfinite == 0
    assert c2.mean_norm == pytest.approx(1.0, abs=1e-9)

    plan = embedding_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
