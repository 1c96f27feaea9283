"""Trained language identification (operators/langid.py): multinomial
LR over hashed char n-grams — holdout accuracy on a synthetic
multi-language corpus, determinism under repartition, confidence
routing to 'und', artifact round-trip, and the core.lang_id YAML gate
wired scan_warc → html_text → lang_id → quality_filter."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from snapflow_spark.operators.langid import (
    LangIdModel,
    featurize_chars,
    predict_lang,
    train_lang_id,
)

# Deterministic synthetic corpus: per-language invented vocabularies
# with distinct orthography (diacritics / scripts / function words) —
# the fixtures' lang column is uncorrelated with its English-ish text,
# so the signal must be synthesized (SURVEY §5.2(3) convention).
VOCAB = {
    "en": "the and with house water light great people from would there street".split(),
    "de": "der und nicht haus wasser licht straße über schön zwischen möchte".split(),
    "fr": "le et avec maison eau lumière très être château français déjà".split(),
    "es": "el y con casa agua luz niño señor también después además".split(),
    "zh": list("的是和水光房人大小天地中国学生工作"),
    "ru": "и дом вода свет человек большой работа учиться хорошо".split(),
}
LANGS = sorted(VOCAB)


def synth_rows(n=1200, words=30):
    rows = []
    for i in range(n):
        lang = LANGS[i % len(LANGS)]
        rng = random.Random(i)
        sep = "" if lang == "zh" else " "
        rows.append((i, lang, sep.join(rng.choices(VOCAB[lang], k=words))))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        synth_rows(), "doc_id long, lang string, text string"
    ).persist()


@pytest.fixture(scope="module")
def model(corpus):
    return train_lang_id(corpus.where("doc_id % 10 < 7"), iters=25)


def test_holdout_accuracy_at_least_95(corpus, model):
    test = corpus.where("doc_id % 10 >= 7")
    pred = predict_lang(test, model)
    acc = pred.select(
        F.avg((F.col("lang_pred") == F.col("lang")).cast("double")).alias("a")
    ).first().a
    assert acc >= 0.95, acc
    assert model.labels == LANGS  # sorted distinct, deterministic


def test_predictions_deterministic_under_repartition(corpus, model):
    test = corpus.where("doc_id % 10 >= 7").drop("lang")
    a = {r.doc_id: (r.lang_pred, r.lang_prob)
         for r in predict_lang(test, model).collect()}
    b = {r.doc_id: (r.lang_pred, r.lang_prob)
         for r in predict_lang(test.repartition(7), model).collect()}
    assert a == b


def test_threshold_routes_low_confidence_to_und(spark, model):
    # no char evidence at all -> softmax of the bias prior, far below
    # any useful threshold; digits-only is likewise language-free
    df = spark.createDataFrame(
        [(1, ""), (2, "12345 67890"), (3, " ".join(VOCAB["de"]))],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred
           for r in predict_lang(df, model, threshold=0.5).collect()}
    assert got[1] == "und" and got[2] == "und"
    assert got[3] == "de"


def test_model_round_trip(tmp_path, corpus, model):
    p = str(tmp_path / "langid.json")
    model.save(p)
    loaded = LangIdModel.load(p)
    assert loaded.labels == model.labels
    assert loaded.ngrams == model.ngrams
    np.testing.assert_array_equal(loaded.weights, model.weights)
    test = corpus.where("doc_id % 10 >= 7").limit(30)
    a = {r.doc_id: r.lang_pred for r in predict_lang(test, model).collect()}
    b = {r.doc_id: r.lang_pred for r in predict_lang(test, loaded).collect()}
    assert a == b


def test_featurizer_l1_normalized_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in featurize_chars(df).collect()}
    assert abs(sum(rows[1].val) - 1.0) < 1e-9
    assert len(rows[1].idx) == len(rows[1].val) > 0
    assert rows[2].idx == [] and rows[3].idx == []  # bias-prior docs


def test_training_validation_errors(spark, corpus, model):
    one = spark.createDataFrame([(1, "en", "x")], "doc_id long, lang string, text string")
    with pytest.raises(ValueError, match=">= 2 language labels"):
        train_lang_id(one)
    with pytest.raises(ValueError, match="already exists"):
        predict_lang(corpus.withColumn("lang_pred", F.lit("x")), model)


def test_yaml_gate_scan_warc_html_langid_quality(spark, tmp_path, model):
    """The VERDICT's e2e wiring: WARC responses → html_text →
    core.lang_id (threshold route) → core.quality_filter keyed on the
    predicted language — every stage a builtin, no hand code."""
    import yaml

    from snapflow_spark.plans.yaml_config import load_graph
    from snapflow_spark.sources.warc import write_warc

    def resp(url, body_words):
        html = (
            "<html><head><title>t</title></head><body><p>"
            + body_words
            + "</p></body></html>"
        )
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
            + html.encode()
        )
        return (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:uuid:{abs(hash(url))}>",
                "WARC-Target-URI": url,
                "WARC-Date": "2026-08-14T12:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            payload,
        )

    drop = tmp_path / "drop"
    drop.mkdir()
    recs = []
    for lang in ("en", "de", "zh"):
        for j in range(3):
            rng = random.Random(hash((lang, j)) & 0xFFFF)
            sep = "" if lang == "zh" else " "
            recs.append(
                resp(
                    f"https://{lang}.example/page{j}",
                    sep.join(rng.choices(VOCAB[lang], k=40)),
                )
            )
    write_warc(str(drop / "crawl.warc.gz"), recs)
    mpath = str(tmp_path / "langid.json")
    model.save(mpath)

    cfg = yaml.safe_load(
        f"""
warehouse: "{tmp_path / 'wh'}"
sources:
  - name: crawl
    warc: "{drop}"
    types: response
nodes:
  - name: pages
    function: core.html_text
    upstream: crawl
    params: {{ from_http_payload: true, body_col: payload }}
  - name: docs
    function: core.select
    upstream: {{ input: pages }}
    params:
      columns:
        - "xxhash64(target_uri) AS doc_id"
        - "target_uri AS url"
        - "text"
  - name: routed
    function: core.lang_id
    upstream: {{ input: docs }}
    params: {{ model: "{mpath}", threshold: 0.5 }}
  - name: english
    function: core.quality_filter
    upstream: {{ input: {{ node: routed, mode: reference }} }}
    params: {{ positive_where: "lang_pred = 'en'", threshold: 0.5, iters: 300 }}
    overwrite: true
"""
    )
    g = load_graph(cfg)
    assert g.produce(spark) > 0
    routed = g.read(spark, "routed").collect()
    assert len(routed) == 9
    by_url = {r.url: r.lang_pred for r in routed}
    for lang in ("en", "de", "zh"):
        for j in range(3):
            assert by_url[f"https://{lang}.example/page{j}"] == lang
    english = g.read(spark, "english").collect()
    assert english and all("quality_prob" in r.asDict() for r in english)
    assert {r.lang_pred for r in english} == {"en"}
