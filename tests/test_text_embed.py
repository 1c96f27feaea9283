"""Hashed text embedding (functions/text.py: hashed_embedding_udf) —
the model-free bridge from text to the embedding family: determinism,
unit norm, near-dup geometry (copies ≈ cosine 1, unrelated text
well below), NULL/empty zero-vector policy, and the end-to-end
composition text → embed → semantic_dedup recovering planted dups.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from snapflow_spark.functions.text import (
    _hashed_embedding_batch,
    hashed_embedding_udf,
)
from snapflow_spark.functions.vectors import cosine_similarity


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sailors debate the merits of distributed query engines "
    )
    other = (
        "completamente diferente contenido sobre cocina mediterránea "
        "aceitunas tomates y albahaca fresca en el mercado "
    )
    rows = [
        (0, base * 3),
        (1, base * 3),  # exact copy
        (2, base * 3 + "extra trailing clause appended here"),  # near copy
        (3, other * 3),  # unrelated
        (4, None),
        (5, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_deterministic_unit_norm_and_geometry(spark, docs):
    out = docs.select(
        "doc_id", hashed_embedding_udf("text", dim=64).alias("e")
    )
    a = {r.doc_id: np.array(r.e) for r in out.collect()}
    b = {r.doc_id: np.array(r.e) for r in out.collect()}  # re-run
    for k in a:
        assert np.array_equal(a[k], b[k])  # deterministic
    for k in (0, 1, 2, 3):
        assert abs(np.linalg.norm(a[k]) - 1.0) < 1e-5  # unit norm
    assert np.array_equal(a[0], a[1])  # exact copy -> identical vector
    assert float(a[0] @ a[2]) > 0.95  # near copy -> near cosine 1
    assert float(a[0] @ a[3]) < 0.6  # unrelated -> well below
    assert not a[4].any() and not a[5].any()  # NULL/empty -> zero vector


def test_matches_local_reference_and_salt_changes_space(spark, docs):
    import pandas as pd

    rows = docs.where("doc_id = 0").collect()
    got = (
        docs.where("doc_id = 0")
        .select(hashed_embedding_udf("text", dim=32).alias("e"))
        .collect()[0]
        .e
    )
    import hashlib

    seed = np.uint64(
        int.from_bytes(hashlib.sha256(b"embed-v1").digest()[:8], "big")
    )
    want = _hashed_embedding_batch(
        pd.Series([rows[0].text]), 32, (2, 3), seed
    )[0]
    assert np.allclose(np.array(got), want, atol=1e-7)
    other_salt = (
        docs.where("doc_id = 0")
        .select(hashed_embedding_udf("text", dim=32, salt="v2").alias("e"))
        .collect()[0]
        .e
    )
    assert not np.allclose(np.array(got), np.array(other_salt))


def test_embed_feeds_semantic_dedup(spark, docs):
    from snapflow_spark.operators import semantic_dedup

    emb = docs.where("doc_id <= 3").select(
        F.col("doc_id").alias("vec_id"),
        hashed_embedding_udf("text", dim=64).alias("embedding"),
    )
    decision = semantic_dedup(emb, cos_threshold=0.95, id_col="vec_id")
    rows = {r.vec_id: (r.component, r.is_rep) for r in decision.collect()}
    # 0,1,2 collapse to one component represented by 0; 3 stands alone
    assert rows[0] == (0, True)
    assert rows[1][0] == 0 and not rows[1][1]
    assert rows[2][0] == 0 and not rows[2][1]
    assert rows[3][1]


def test_yaml_builtin_attaches_column(spark, docs):
    from snapflow_spark.plans.yaml_config import BUILTINS

    out = BUILTINS["core.text_embed"](spark, docs, dim=16)
    assert "embedding" in out.columns
    first = out.where("doc_id = 0").collect()[0]
    assert len(first.embedding) == 16
