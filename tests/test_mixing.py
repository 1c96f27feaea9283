"""Dataset mixing (operators/mixing.py): achieved token shares track
target weights, up-sampling repeats whole epochs exactly plus a
hash-sampled fraction, determinism under repartition, recipe-error
guards, and the audit report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snapflow_spark.operators.mixing import mix_corpora, mix_report


def _corpus(spark, name: str, n_docs: int, tokens_per_doc: int):
    return spark.range(n_docs).select(
        F.concat(F.lit(name + "-"), F.col("id")).alias("doc_id"),
        F.lit(tokens_per_doc).alias("n_tokens"),
    )


def test_downsample_shares_track_weights(spark):
    # web: 200k tokens, books: 50k tokens; 3:1 weights over a 40k budget
    web = _corpus(spark, "w", 2000, 100)
    books = _corpus(spark, "b", 500, 100)
    mixed = mix_corpora(
        {"web": web, "books": books},
        {"web": 3.0, "books": 1.0},
        token_budget=40_000,
    )
    got = {r.mix_source: r for r in mix_report(mixed).collect()}
    # targets: web 30k, books 10k; hash sampling concentrates within a
    # few percent at 2000/500-doc scale
    assert got["web"].tokens == pytest.approx(30_000, rel=0.10)
    assert got["books"].tokens == pytest.approx(10_000, rel=0.15)
    assert got["web"].epochs == 1 and got["books"].epochs == 1
    assert got["web"].token_share == pytest.approx(0.75, abs=0.05)


def test_upsample_whole_epochs_plus_fraction(spark):
    # tiny corpus, big weight: 10k tokens asked to fill 25k -> 2 full
    # epochs + 0.5 fractional
    tiny = _corpus(spark, "t", 100, 100)
    mixed = mix_corpora({"tiny": tiny}, {"tiny": 1.0}, token_budget=25_000)
    per_epoch = dict(
        (r.epoch, r.n)
        for r in mixed.groupBy("epoch").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert per_epoch[0] == 100 and per_epoch[1] == 100  # complete copies
    assert 25 <= per_epoch[2] <= 75  # ~50% hash-sampled fraction
    # every doc appears in both full epochs exactly once
    dups = (
        mixed.where(F.col("epoch") < 2)
        .groupBy("doc_id", "epoch").count().where("count != 1").count()
    )
    assert dups == 0


def test_mix_deterministic_under_repartition(spark):
    web = _corpus(spark, "w", 800, 50)
    a = mix_corpora({"web": web}, {"web": 1.0}, token_budget=20_000)
    b = mix_corpora(
        {"web": web.repartition(13)}, {"web": 1.0}, token_budget=20_000
    )
    ka = sorted((r.doc_id, r.epoch) for r in a.collect())
    kb = sorted((r.doc_id, r.epoch) for r in b.collect())
    assert ka == kb


def test_recipe_guards(spark):
    c = _corpus(spark, "c", 10, 10)
    with pytest.raises(ValueError, match="disagree"):
        mix_corpora({"a": c}, {"b": 1.0}, token_budget=100)
    with pytest.raises(ValueError, match="epochs"):
        mix_corpora({"a": c}, {"a": 1.0}, token_budget=10_000, max_epochs=5)
    empty = c.where("n_tokens < 0")
    with pytest.raises(ValueError, match="no tokens"):
        mix_corpora({"a": empty}, {"a": 1.0}, token_budget=100)
    with pytest.raises(ValueError, match="negative"):
        mix_corpora({"a": c}, {"a": -1.0}, token_budget=100)


def test_yaml_builtin_mix(spark, tmp_path):
    """core.mix over two named upstream corpora, declared in YAML."""
    from snapflow_spark.plans import load_graph

    cfg = {
        "warehouse": str(tmp_path / "wh_mix"),
        "sources": [{"name": "web_src"}, {"name": "book_src"}],
        "nodes": [
            {
                "name": "train_mix",
                "function": "core.mix",
                "upstream": {"web": "web_src", "books": "book_src"},
                "params": {
                    "weights": {"web": 1.0, "books": 1.0},
                    "token_budget": 10_000,
                },
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    g.pipeline.sources["web_src"].append(_corpus(spark, "w", 500, 100))
    g.pipeline.sources["book_src"].append(_corpus(spark, "b", 500, 100))
    assert g.produce(spark) == 1
    got = {r.mix_source: r for r in mix_report(g.read(spark, "train_mix")).collect()}
    # plumbing test: concentration is pinned at 2000-doc scale above;
    # at 500 docs the (deterministic) hash draw can sit ~2 sigma out
    assert got["web"].tokens == pytest.approx(5_000, rel=0.3)
    assert got["books"].tokens == pytest.approx(5_000, rel=0.3)


def test_totals_shortcut_matches_internal_aggregates(spark):
    """Passing precomputed totals= plans with zero extra jobs and
    selects the IDENTICAL document set (integer token sums are exact
    either way)."""
    web = _corpus(spark, "w", 600, 70)
    books = _corpus(spark, "b", 150, 70)
    kw = dict(weights={"web": 3.0, "books": 1.0}, token_budget=30_000)
    a = mix_corpora({"web": web, "books": books}, **kw)
    b = mix_corpora(
        {"web": web, "books": books},
        totals={"web": 600 * 70, "books": 150 * 70},
        **kw,
    )
    ka = sorted((r.doc_id, r.epoch) for r in a.collect())
    kb = sorted((r.doc_id, r.epoch) for r in b.collect())
    assert ka == kb and len(ka) > 0


def test_mix_over_materialized_token_counts_matches_raw(spark):
    """The 100 TB shape (round 9): mix a materialized (id, n_tokens)
    metadata table, join text back ONCE — selection must be
    bit-identical to mixing the raw text tables (it is a pure
    function of (salt, epoch, id) + totals), while the per-epoch
    re-scan touches integers instead of text."""
    from pyspark.sql import functions as F

    rows = [(i, f"src{'ab'[i % 2]}", "tok " * (5 + i % 7)) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, corpus string, text string")
    docs = docs.withColumn("n_tokens", F.size(F.split(F.trim("text"), " ")))
    a = docs.where("corpus = 'srca'")
    b = docs.where("corpus = 'srcb'")
    weights = {"a": 3.0, "b": 1.0}
    budget = 6000  # srca must up-sample, srcb down-samples

    raw = mix_corpora({"a": a, "b": b}, weights, budget)
    meta = mix_corpora(
        {
            "a": a.select("doc_id", "n_tokens"),
            "b": b.select("doc_id", "n_tokens"),
        },
        weights,
        budget,
    )
    key = lambda r: (r.mix_source, r.doc_id, r.epoch)  # noqa: E731
    raw_sel = sorted(key(r) for r in raw.collect())
    meta_sel = sorted(key(r) for r in meta.collect())
    assert raw_sel == meta_sel and len(raw_sel) > 0
    # text joins back once, by id (ids unique within the corpus)
    joined = meta.join(docs.select("doc_id", "text"), "doc_id")
    assert joined.count() == len(meta_sel)
    assert joined.where(F.col("text").isNull()).count() == 0


# --- temperature language balancing (round 10) ---------------------------


def _ml_corpus(spark, shares: dict[str, int], tokens_per_doc: int = 100):
    parts = []
    for lang, n in shares.items():
        parts.append(
            spark.range(n).select(
                F.concat(F.lit(lang + "-"), F.col("id")).alias("doc_id"),
                F.lit(lang).alias("lang"),
                F.lit(tokens_per_doc).alias("n_tokens"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def test_temperature_weights_endpoints_and_paper_value():
    from snapflow_spark.operators.mixing import temperature_weights

    totals = {"en": 900.0, "sw": 100.0}
    # alpha=1: the natural distribution
    w1 = temperature_weights(totals, alpha=1.0)
    assert w1["en"] == pytest.approx(0.9) and w1["sw"] == pytest.approx(0.1)
    # alpha=0: uniform across languages
    w0 = temperature_weights(totals, alpha=0.0)
    assert w0["en"] == pytest.approx(0.5) and w0["sw"] == pytest.approx(0.5)
    # alpha=0.3 (the XLM value): between, monotone in the share
    w3 = temperature_weights(totals, alpha=0.3)
    assert 0.5 < w3["en"] < 0.9 and w3["en"] + w3["sw"] == pytest.approx(1.0)
    # q ∝ p^alpha exactly
    assert w3["en"] / w3["sw"] == pytest.approx((9.0) ** 0.3)
    with pytest.raises(ValueError):
        temperature_weights({}, 0.3)
    with pytest.raises(ValueError):
        temperature_weights(totals, -1)


def test_language_balanced_mix_rebalances_token_mass(spark):
    from snapflow_spark.operators.mixing import language_balanced_mix

    df = _ml_corpus(spark, {"en": 1800, "sw": 200})  # 90/10 natural
    # alpha=0: equal token mass per language — sw up-samples by epochs
    mixed = language_balanced_mix(
        df, token_budget=80_000, alpha=0.0, max_epochs=20
    )
    got = {r.mix_source: r for r in mix_report(mixed).collect()}
    assert got["en"].token_share == pytest.approx(0.5, abs=0.05)
    assert got["sw"].token_share == pytest.approx(0.5, abs=0.05)
    assert got["sw"].epochs == 2  # 40k target over a 20k corpus
    # alpha=1: natural shares preserved
    nat = {
        r.mix_source: r
        for r in mix_report(
            language_balanced_mix(df, token_budget=80_000, alpha=1.0)
        ).collect()
    }
    assert nat["en"].token_share == pytest.approx(0.9, abs=0.05)
    # deterministic under repartition
    a = sorted(
        (r.doc_id, r.epoch)
        for r in language_balanced_mix(
            df, token_budget=80_000, alpha=0.3
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.epoch)
        for r in language_balanced_mix(
            df.repartition(17), token_budget=80_000, alpha=0.3
        ).collect()
    )
    assert a == b


def test_yaml_builtin_lang_balance(spark, tmp_path):
    from snapflow_spark.plans import load_graph

    _ml_corpus(spark, {"en": 900, "de": 100}).createOrReplaceTempView(
        "ml_docs_lb"
    )
    cfg = {
        "warehouse": str(tmp_path / "wh_lb"),
        "nodes": [
            {
                "name": "docs",
                "function": "core.sql",
                "params": {"sql": "SELECT * FROM ml_docs_lb"},
                "overwrite": True,
            },
            {
                "name": "balanced",
                "function": "core.lang_balance",
                "upstream": {"input": "docs"},
                "params": {"token_budget": 40000, "alpha": 0.0},
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    g.produce(spark)
    rows = g.read(spark, "balanced").groupBy("mix_source").agg(
        F.sum("n_tokens").alias("t")
    ).collect()
    shares = {r.mix_source: r.t for r in rows}
    total = sum(shares.values())
    assert shares["de"] / total == pytest.approx(0.5, abs=0.06)


def test_language_balanced_mix_excludes_null_lang(spark):
    """NULL-lang rows must not claim budget share: the equality filter
    can never select them, so counting their tokens in the weights
    silently under-delivers the budget (advisor repro: 2 en + 2 null
    at budget 200 used to yield 1 doc / 100 tokens)."""
    from snapflow_spark.operators.mixing import language_balanced_mix

    df = spark.createDataFrame(
        [("e0", "en", 100), ("e1", "en", 100),
         ("n0", None, 100), ("n1", None, 100)],
        "doc_id string, lang string, n_tokens int",
    )
    mixed = language_balanced_mix(df, token_budget=200, alpha=1.0)
    rows = mixed.collect()
    assert sum(r.n_tokens for r in rows) == 200  # full budget delivered
    assert all(r.lang == "en" for r in rows)
