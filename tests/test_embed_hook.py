"""Pluggable model-embedding hook (functions/embed.py): a user batch
embedding function — picklable callable or module:function path
resolved lazily per worker — attaches the engine's array<float>
embedding contract via mapInArrow, and the result flows straight into
semantic_dedup.  The hashed lexical embedding stays the model-free
default (core.text_embed without ``model:``)."""

from __future__ import annotations

import pickle

import numpy as np
import pytest
from pyspark.sql import functions as F

from snapflow_spark.functions.embed import ImportedCallable, embed_with_model


def _make_toy_model():
    """Deterministic numpy stand-in for a real encoder: a doc's
    vector depends only on its first word, so docs sharing a head
    word are exact semantic dups (cosine 1).  Returned as a CLOSURE
    so cloudpickle ships it by value — a test-module function would
    pickle by reference and hit ModuleNotFoundError on workers."""

    def toy_model(texts):
        import hashlib

        import numpy as np

        out = np.zeros((len(texts), 8), dtype=np.float64)
        for i, t in enumerate(texts):
            head = (t.split() or [""])[0]
            seed = int.from_bytes(
                hashlib.sha256(head.encode()).digest()[:4], "big"
            )
            rng = np.random.default_rng(seed)
            out[i] = rng.normal(size=8)
        return out

    return toy_model


_toy_model = _make_toy_model()


def _docs(spark):
    rows = [
        (0, "alpha first doc"),
        (1, "alpha second doc, same head word"),
        (2, "beta quite different"),
        (3, None),  # NULL text must not reach the model
        (4, "gamma unrelated entirely"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_embed_with_model_contract_and_nulls(spark):
    df = embed_with_model(_docs(spark), _toy_model, dim=8, batch_size=2)
    got = {r.doc_id: r.embedding for r in df.collect()}
    assert got[3] is None  # NULL in, NULL out, model never saw it
    for i in (0, 1, 2, 4):
        assert len(got[i]) == 8
    # driver-parity: Spark vectors equal the model run directly
    ref = _toy_model(["alpha first doc"])[0].astype(np.float32)
    assert np.allclose(got[0], ref, atol=1e-6)
    assert got[0] == got[1] or np.allclose(got[0], got[1])  # same head
    assert not np.allclose(got[0], got[2])


def test_embed_to_semantic_dedup_end_to_end(spark):
    """text -> embed_with_model -> semantic_dedup: the two alpha docs
    embed identically and collapse to one representative."""
    from snapflow_spark.operators import semantic_dedup

    emb = embed_with_model(
        _docs(spark).where(F.col("text").isNotNull()), _toy_model
    )
    decision = semantic_dedup(
        emb, cos_threshold=0.95, vec_col="embedding", id_col="doc_id"
    )
    rows = {r.doc_id: (r.component, r.is_rep) for r in decision.collect()}
    assert rows[0] == (0, True) and rows[1] == (0, False)
    assert rows[2][1] and rows[4][1]  # distinct docs represent themselves


def test_model_as_import_path_resolves_on_workers(spark, tmp_path):
    """The --py-files production story: the model is an import path in
    YAML (core.text_embed model:), shipped via addPyFile, resolved
    lazily inside each python worker — never pickled by value."""
    from snapflow_spark.plans import load_graph

    mod = tmp_path / "toy_embedder.py"
    mod.write_text(
        "import numpy as np\n\n"
        "def embed_batch(texts):\n"
        "    out = np.zeros((len(texts), 4), dtype=np.float64)\n"
        "    for i, t in enumerate(texts):\n"
        "        out[i] = [len(t), t.count('a'), t.count('e'), 1.0]\n"
        "    return out\n"
    )
    spark.sparkContext.addPyFile(str(mod))
    cfg = {
        "warehouse": str(tmp_path / "wh_embed"),
        "sources": [{"name": "docs"}],
        "nodes": [
            {
                "name": "embedded",
                "function": "core.text_embed",
                "upstream": {"input": {"node": "docs", "mode": "reference"}},
                "params": {
                    "model": "toy_embedder:embed_batch",
                    "dim": 4,
                    "batch_size": 2,
                },
            }
        ],
    }
    g = load_graph(cfg)
    g.pipeline.sources["docs"].append(
        _docs(spark).where(F.col("text").isNotNull())
    )
    assert g.produce(spark) == 1
    got = {r.doc_id: r.embedding for r in g.read(spark, "embedded").collect()}
    assert got[0] == [15.0, 2.0, 0.0, 1.0]  # len, 2 a's, no e
    assert all(len(v) == 4 for v in got.values())


def test_imported_callable_pickles_path_only():
    c = ImportedCallable("json:loads", what="embedding model")
    assert c('{"a": 1}') == {"a": 1}
    state = pickle.loads(pickle.dumps(c)).__dict__
    assert state["_fn"] is None and state["path"] == "json:loads"
    with pytest.raises(ValueError, match="module:function"):
        ImportedCallable("no_colon")
    with pytest.raises(ImportError, match="definitely_missing"):
        ImportedCallable("definitely_missing:fn")()


def test_embed_with_model_validation(spark):
    # coalesce(1): one Arrow batch holds all 4 docs, so a model that
    # returns the wrong vector count is actually caught
    docs = _docs(spark).where(F.col("text").isNotNull()).coalesce(1)
    # wrong vector count
    with pytest.raises(Exception, match="lengths must match"):
        embed_with_model(docs, lambda ts: np.zeros((1, 4))).collect()
    # declared dim enforced
    with pytest.raises(Exception, match="dim"):
        embed_with_model(docs, _toy_model, dim=16).collect()
    # pre-existing column / missing text column / bad model type
    with pytest.raises(ValueError, match="already exists"):
        embed_with_model(docs.withColumn("embedding", F.lit(1)), _toy_model)
    with pytest.raises(ValueError, match="no column"):
        embed_with_model(docs, _toy_model, text_col="nope")
    with pytest.raises(TypeError, match="callable"):
        embed_with_model(docs, 42)


def test_hashed_default_unchanged(spark):
    """core.text_embed without model: stays the hashed lexical
    embedding — bit-identical to calling hashed_embedding_udf."""
    from snapflow_spark.functions.text import hashed_embedding_udf
    from snapflow_spark.plans.yaml_config import _text_embed

    docs = _docs(spark).where(F.col("text").isNotNull())
    a = {r.doc_id: r.embedding for r in _text_embed(spark, docs).collect()}
    b = {
        r.doc_id: r.embedding
        for r in docs.withColumn(
            "embedding", hashed_embedding_udf("text", dim=64, salt="embed-v1")
        ).collect()
    }
    assert a == b


def test_embed_to_ivfpq_index_end_to_end(spark):
    """The full real-model ANN pipeline the hook exists for:
    text -> embed_with_model -> IVFPQIndex.build -> search. A probe
    sharing a head word with a corpus doc embeds identically and must
    come back as its own nearest neighbor."""
    from snapflow_spark.operators.similarity import IVFPQIndex

    rows = [(i, f"{head} document number {i}")
            for i, head in enumerate(["alpha", "beta", "gamma", "delta",
                                      "epsilon", "zeta", "eta", "theta"])]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    emb = embed_with_model(docs, _toy_model).withColumnRenamed(
        "doc_id", "vec_id"
    )
    idx = IVFPQIndex.build(
        emb.select("vec_id", "embedding"), k_cells=2, m=4, n_codes=8
    )
    probes = embed_with_model(
        spark.createDataFrame(
            [(100, "gamma probe text")], "probe_id bigint, text string"
        ),
        _toy_model,
    )
    hits = idx.search(probes, k=1, nprobe=2).collect()
    assert len(hits) == 1 and hits[0].vec_id == 2  # the gamma doc


def test_yaml_semantic_dedup_and_d4_with_model_param(spark, tmp_path):
    """core.semantic_dedup / core.d4 accept model: directly (round
    11) — the full real-model recipe in ONE node, no separate
    text_embed stage."""
    from snapflow_spark.plans import load_graph

    mod = tmp_path / "onenode_embedder.py"
    mod.write_text(
        "import hashlib\n"
        "import numpy as np\n\n"
        "def embed_batch(texts):\n"
        "    out = np.zeros((len(texts), 6))\n"
        "    for i, t in enumerate(texts):\n"
        "        head = (t.split() or [''])[0]\n"
        "        seed = int.from_bytes(hashlib.sha256(head.encode()).digest()[:4], 'big')\n"
        "        out[i] = np.random.default_rng(seed).normal(size=6)\n"
        "    return out\n"
    )
    spark.sparkContext.addPyFile(str(mod))
    docs = spark.createDataFrame(
        [(i, f"{h} doc {i}") for i, h in enumerate(
            ["alpha", "alpha", "beta", "gamma", "delta", "epsilon"]
        )],
        "doc_id bigint, text string",
    )
    df_view = "onenode_docs"
    docs.createOrReplaceTempView(df_view)
    cfg = {
        "warehouse": str(tmp_path / "wh_onenode"),
        "nodes": [
            {"name": "raw", "function": "core.sql",
             "params": {"sql": f"SELECT * FROM {df_view}"},
             "overwrite": True},
            {"name": "sem", "function": "core.semantic_dedup",
             "upstream": {"input": {"node": "raw", "mode": "reference"}},
             "params": {"model": "onenode_embedder:embed_batch",
                        "id_col": "doc_id", "dim": 6},
             "overwrite": True},
            {"name": "d4", "function": "core.d4",
             "upstream": {"input": {"node": "raw", "mode": "reference"}},
             "params": {"model": "onenode_embedder:embed_batch",
                        "id_col": "doc_id", "dim": 6, "k_cells": 2,
                        "drop_frac": 0.2},
             "overwrite": True},
        ],
    }
    g = load_graph(cfg)
    assert g.produce(spark) == 3
    sem = {r.doc_id: r.is_rep for r in g.read(spark, "sem").collect()}
    assert sem[0] and not sem[1]  # the two alpha docs collapsed
    assert all(sem[i] for i in (2, 3, 4, 5))
    d4 = {r.doc_id: r.is_kept for r in g.read(spark, "d4").collect()}
    assert not d4[1] and len(d4) == 6  # dup dropped there too


def test_stub_embed_batch_via_import_path(spark):
    """The bench stand-in encoder (op_embed_model's model) satisfies
    the contract through the production wiring: import-path
    resolution, dim enforcement, determinism, L1 normalization."""
    import numpy as np

    from snapflow_spark.functions.embed import stub_embed_batch

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "hello world"), (2, None), (3, "xyz")],
        "doc_id bigint, text string",
    )
    out = embed_with_model(
        docs, "snapflow_spark.functions.embed:stub_embed_batch", dim=32
    )
    got = {r.doc_id: r.embedding for r in out.collect()}
    assert got[0] == got[1] and got[2] is None
    assert len(got[0]) == 32
    assert abs(sum(got[0]) - 1.0) < 1e-5  # L1-normalized histogram
    want = stub_embed_batch(["hello world"])[0]
    assert np.allclose(got[0], want)
