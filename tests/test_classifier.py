"""Trained quality classifier (operators/classifier.py): separable
synthetic corpora train to high accuracy, Spark-trained weights match
a single-process numpy reference implementation, featurization is
bit-stable, save/load round-trips, and the labels/empty guards fire."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from snapflow_spark.operators.classifier import (
    QualityClassifier,
    featurize_docs,
    score_quality,
    train_quality_classifier,
)

GOOD = ["measured", "verified", "coherent", "sourced", "edited", "review"]
BAD = ["spam", "click", "casino", "winner", "free", "pills"]


def _docs(spark, n=120, seed=3):
    """Separable corpora: positives draw from GOOD, negatives from
    BAD, with a shared neutral filler vocabulary."""
    rng = np.random.default_rng(seed)
    rows = []
    filler = ["the", "and", "of", "data", "with"]
    for i in range(n):
        label = i % 2
        vocab = GOOD if label else BAD
        words = list(rng.choice(vocab, size=8)) + list(rng.choice(filler, size=4))
        rng.shuffle(words)
        rows.append((i, " ".join(words), label))
    return spark.createDataFrame(rows, "doc_id bigint, text string, label int")


def _ref_hash_bucket(gram: str, salt: str, buckets: int) -> int:
    """The curation._hash_bucket contract in plain python."""
    h = hashlib.sha256((salt + gram).encode()).hexdigest()
    return int(h[:8], 16) % buckets


def _ref_features(texts, salt, buckets):
    """Reference featurization: lowercase word tokens (letters only,
    the shared WORD_RE semantics), unigrams+bigrams, sha256 buckets,
    L1-normalized counts."""
    import re

    out = []
    for t in texts:
        toks = re.findall(r"[a-z]+", t.lower())
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        counts: dict[int, float] = {}
        for g in grams:
            k = _ref_hash_bucket(g, salt, buckets)
            counts[k] = counts.get(k, 0.0) + 1.0
        tot = max(len(grams), 1)
        out.append({k: v / tot for k, v in sorted(counts.items())})
    return out


def _ref_train(feat_dicts, ys, d, iters, lr, l2):
    """The exact GD loop of train_quality_classifier, single-process."""
    w = np.zeros(d + 1)
    for _ in range(iters):
        grad = np.zeros(d + 1)
        for fd, y in zip(feat_dicts, ys):
            z = w[-1] + sum(w[k] * v for k, v in fd.items())
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            for k, v in fd.items():
                grad[k] += err * v
            grad[-1] += err
        grad /= len(ys)
        grad[:d] += l2 * w[:d]
        w = w - lr * grad
    return w


def test_featurization_matches_reference(spark):
    df = _docs(spark, n=12)
    got = {
        r.doc_id: dict(zip(r.idx, r.val))
        for r in featurize_docs(df, num_buckets=256, salt="t-v1").collect()
    }
    texts = {r.doc_id: r.text for r in df.collect()}
    for did, text in texts.items():
        (ref,) = _ref_features([text], "t-v1", 256)
        assert got[did] == pytest.approx(ref), did


def test_train_matches_numpy_reference_and_separates(spark):
    df = _docs(spark, n=120)
    clf = train_quality_classifier(
        df.repartition(8), num_buckets=512, iters=20, lr=1.0, l2=1e-4
    )
    rows = df.orderBy("doc_id").collect()
    feats = _ref_features([r.text for r in rows], "qclf-v1", 512)
    ref_w = _ref_train(
        feats, [r.label for r in rows], 512, iters=20, lr=1.0, l2=1e-4
    )
    # executor tree-fold order jitters the float64 sums only in the
    # last ulps; the learned model must match the reference closely
    assert np.allclose(clf.weights, ref_w, rtol=1e-8, atol=1e-10)

    scored = score_quality(df, clf).select("doc_id", "label", "quality_prob")
    got = [(r.label, r.quality_prob) for r in scored.collect()]
    acc = np.mean([(p >= 0.5) == bool(y) for y, p in got])
    assert acc >= 0.95
    # scores and reference predictions agree row-for-row
    for r in scored.orderBy("doc_id").collect():
        fd = feats[r.doc_id]
        z = ref_w[-1] + sum(ref_w[k] * v for k, v in fd.items())
        assert r.quality_prob == pytest.approx(1 / (1 + np.exp(-z)), rel=1e-9)


def test_scoring_generalizes_and_filters(spark):
    train = _docs(spark, n=120, seed=3)
    clf = train_quality_classifier(train, num_buckets=512, iters=20)
    unseen = _docs(spark, n=40, seed=99)  # same vocabularies, new draws
    scored = score_quality(unseen, clf)
    acc = np.mean(
        [(r.quality_prob >= 0.5) == bool(r.label) for r in scored.collect()]
    )
    assert acc >= 0.9
    kept = scored.where(F.col("quality_prob") >= 0.5)
    assert 0 < kept.count() < unseen.count()
    # schema: original columns preserved, one appended probability
    assert scored.columns[-1] == "quality_prob"
    assert set(unseen.columns) <= set(scored.columns)


def test_quality_filter_yaml_builtin(spark, tmp_path):
    """core.quality_filter end-to-end from a YAML graph: positives via
    a SQL predicate (the core.dsir convention), threshold turns the
    node into the filter itself."""
    from snapflow_spark.plans import load_graph

    docs = _docs(spark, n=120)
    cfg = {
        "warehouse": str(tmp_path / "wh_qf"),
        "sources": [{"name": "docs"}],
        "nodes": [
            {
                "name": "kept",
                "function": "core.quality_filter",
                "upstream": {"input": {"node": "docs", "mode": "reference"}},
                "params": {
                    "positive_where": "label = 1",
                    "threshold": 0.5,
                    "num_buckets": 512,
                    "iters": 20,
                },
            }
        ],
    }
    g = load_graph(cfg)
    g.pipeline.sources["docs"].append(docs)
    assert g.produce(spark) == 1
    kept = g.read(spark, "kept").collect()
    assert kept and all(r.quality_prob >= 0.5 for r in kept)
    # the filter keeps (nearly) only the positive class
    acc = np.mean([r.label == 1 for r in kept])
    assert acc >= 0.95


def test_cli_train_quality(spark, tmp_path, capsys):
    """CLI surface: `python -m snapflow_spark train-quality out.json`
    trains on the documents fixture (positives via a SQL predicate)
    and writes a loadable model that scores that predicate well."""
    from snapflow_spark.cli import main

    out = str(tmp_path / "qclf.json")
    assert main([
        "train-quality", out, "--sf", "/root/testdata/sf0.001",
        "--positive-where", "lang = 'en'", "--buckets", "512",
        "--iters", "10",
    ]) == 0
    assert "trained:" in capsys.readouterr().out
    clf = QualityClassifier.load(out)
    from snapflow_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    scored = score_quality(docs, clf).select("lang", "quality_prob")
    rows = scored.collect()
    en = np.mean([r.quality_prob for r in rows if r.lang == "en"])
    rest = np.mean([r.quality_prob for r in rows if r.lang != "en"])
    assert en > rest  # the model learned the positive slice


def test_save_load_roundtrip_and_guards(spark, tmp_path):
    df = _docs(spark, n=40)
    clf = train_quality_classifier(df, num_buckets=128, iters=5)
    path = str(tmp_path / "qclf.json")
    clf.save(path)
    loaded = QualityClassifier.load(path)
    assert np.array_equal(loaded.weights, clf.weights)
    assert (loaded.num_buckets, loaded.salt) == (clf.num_buckets, clf.salt)
    a = {r.doc_id: r.quality_prob for r in score_quality(df, clf).collect()}
    b = {r.doc_id: r.quality_prob for r in score_quality(df, loaded).collect()}
    assert a == b
    # zero-token docs score the prior sigmoid(bias), never crash
    odd = spark.createDataFrame(
        [(0, "!!! 123 ???", 1)], "doc_id bigint, text string, label int"
    )
    (row,) = score_quality(odd, clf).collect()
    assert row.quality_prob == pytest.approx(
        1 / (1 + np.exp(-clf.weights[-1]))
    )
    # guards
    with pytest.raises(ValueError, match="labels must be 0/1"):
        train_quality_classifier(
            df.withColumn("label", F.col("label") + 1), iters=1, num_buckets=64
        )
    with pytest.raises(ValueError, match="empty corpus"):
        train_quality_classifier(df.where(F.lit(False)), iters=1, num_buckets=64)
    with pytest.raises(ValueError, match="weights must be"):
        QualityClassifier(np.zeros(5), num_buckets=8, salt="s")


def test_score_quality_streams(spark, tmp_path):
    """The scoring stage is map-only (featurize + broadcast-weights
    dot product in one mapInPandas), so it runs UNCHANGED on a
    Structured Streaming source — the streaming quality filter a
    live ingest pipeline applies before landing documents."""
    from snapflow_spark.incremental.store import SnapshotStore
    from snapflow_spark.streaming.runner import (
        run_stream_to_batch,
        stream_from_snapshots,
    )

    train = _docs(spark, n=120, seed=3)
    clf = train_quality_classifier(train, num_buckets=512, iters=15)

    unseen = _docs(spark, n=30, seed=77)
    store = SnapshotStore(tmp_path / "docs")
    store.append(unseen)
    stream = stream_from_snapshots(
        spark, str(store.path), store.read(spark).schema
    )
    scored = score_quality(stream, clf)
    got = run_stream_to_batch(
        scored, checkpoint=str(tmp_path / "ckpt")
    ).collect()
    batch = {
        r.doc_id: r.quality_prob for r in score_quality(unseen, clf).collect()
    }
    assert {r.doc_id: r.quality_prob for r in got} == batch
    acc = np.mean([(r.quality_prob >= 0.5) == bool(r.label) for r in got])
    assert acc >= 0.9


def test_null_text_and_collision_guards(spark):
    """NULL text featurizes as a zero-feature doc (bias prior) instead
    of dying in the Arrow batch; stale-output and bad-label guards
    fail with the intended messages."""
    df = _docs(spark, n=20)
    clf = train_quality_classifier(df, num_buckets=128, iters=3)
    withnull = spark.createDataFrame(
        [(0, None, 1), (1, "measured verified", 1)],
        "doc_id bigint, text string, label int",
    )
    rows = {r.doc_id: r.quality_prob for r in score_quality(withnull, clf).collect()}
    assert rows[0] == pytest.approx(1 / (1 + np.exp(-clf.weights[-1])))
    # NULL labels excluded from training via the shared predicate rule
    from snapflow_spark.operators.classifier import train_from_predicate

    docs2 = _docs(spark, n=40).withColumn(
        "label", F.when(F.col("doc_id") < 30, F.col("label"))
    )
    clf2 = train_from_predicate(docs2, "label = 1", num_buckets=128, iters=3)
    assert clf2.weights.shape == (129,)
    # direct training on NULL-bearing labels raises the INTENDED error
    with pytest.raises(ValueError, match="labels must be 0/1"):
        train_quality_classifier(docs2, num_buckets=64, iters=1)
    # re-scoring guard: stale quality_prob must be dropped first
    scored = score_quality(df, clf)
    with pytest.raises(ValueError, match="already exists"):
        score_quality(scored, clf)


def test_pareto_noise_keep_rates_and_stability(spark):
    """The GPT-3 keep rule score > 1 - Pareto(alpha): boundary docs
    are admitted at the closed-form rate P = (2 - score)^-alpha, the
    decision is bit-stable across repartition (noise from sha256(id),
    not rand()), and monotone in score."""
    from snapflow_spark.operators.classifier import pareto_noise_keep

    n = 20_000
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    for score, alpha in ((0.5, 2.0), (0.9, 9.0), (0.2, 9.0)):
        df = base.withColumn("quality_prob", F.lit(float(score)))
        kept = df.where(pareto_noise_keep(alpha=alpha)).count()
        expected = (2.0 - score) ** (-alpha)
        assert abs(kept / n - expected) < 0.02, (score, alpha, kept / n)
    # bit-stable: same keep SET regardless of partitioning, twice
    df = base.withColumn("quality_prob", F.lit(0.5))
    a = {r.doc_id for r in df.where(pareto_noise_keep(alpha=2.0)).collect()}
    b = {
        r.doc_id
        for r in df.repartition(7)
        .where(pareto_noise_keep(alpha=2.0))
        .collect()
    }
    assert a == b and len(a) > 0
    # monotone: a doc kept at score s stays kept at any higher score
    lo = {r.doc_id for r in base.withColumn("quality_prob", F.lit(0.3))
          .where(pareto_noise_keep(alpha=9.0)).collect()}
    hi = {r.doc_id for r in base.withColumn("quality_prob", F.lit(0.8))
          .where(pareto_noise_keep(alpha=9.0)).collect()}
    assert lo <= hi
    import pytest

    with pytest.raises(ValueError, match="alpha"):
        pareto_noise_keep(alpha=0.0)


def test_quality_filter_yaml_pareto(spark, tmp_path):
    """pareto_alpha on core.quality_filter: no hard cliff — some docs
    below any fixed cutoff survive, high scorers almost all survive,
    and the node output is deterministic across two produces."""
    from snapflow_spark.plans import load_graph

    docs = _docs(spark, n=160)

    def graph(wh):
        cfg = {
            "warehouse": str(tmp_path / wh),
            "sources": [{"name": "docs"}],
            "nodes": [
                {
                    "name": "kept",
                    "function": "core.quality_filter",
                    "upstream": {"input": {"node": "docs", "mode": "reference"}},
                    "params": {
                        "positive_where": "label = 1",
                        "pareto_alpha": 9.0,
                        "num_buckets": 512,
                        "iters": 20,
                    },
                }
            ],
        }
        g = load_graph(cfg)
        g.pipeline.sources["docs"].append(docs)
        assert g.produce(spark) == 1
        return {(r.doc_id, round(r.quality_prob, 12)) for r in g.read(spark, "kept").collect()}

    kept1 = graph("wh_par1")
    kept2 = graph("wh_par2")
    assert kept1 == kept2 and len(kept1) > 0
    # mutually exclusive knobs raise loudly
    import pytest

    from snapflow_spark.plans.yaml_config import _quality_filter

    with pytest.raises(ValueError, match="mutually exclusive"):
        _quality_filter(
            spark, docs, positive_where="label = 1",
            threshold=0.5, pareto_alpha=9.0,
        )
