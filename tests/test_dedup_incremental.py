"""Incremental dedup against corpus history
(operators/dedup_incremental.py): exact and MinHash tiers across
multiple ingest batches, re-run idempotence, short-doc bypass, and
determinism under repartition."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from snapflow_spark.incremental import SnapshotStore
from snapflow_spark.operators.dedup_incremental import (
    incremental_exact_dedup,
    incremental_minhash_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_across_batches(spark, tmp_path):
    store = SnapshotStore(tmp_path / "fps")
    b1 = _docs(spark, [(1, "alpha text"), (2, "beta text"), (3, "alpha text")])
    k1 = incremental_exact_dedup(spark, b1, store)
    assert sorted(r.doc_id for r in k1.collect()) == [1, 2]  # batch keeper
    # batch 2: one known duplicate (normalization collapses case/ws),
    # one novel doc
    b2 = _docs(spark, [(10, "  ALPHA   text "), (11, "gamma text")])
    k2 = incremental_exact_dedup(spark, b2, store)
    assert [r.doc_id for r in k2.collect()] == [11]
    # store holds exactly the kept fingerprints
    fps = store.read(spark).select("fingerprint").collect()
    assert len(fps) == 3
    # replaying a committed batch is a no-op (idempotent ingest)
    k2b = incremental_exact_dedup(spark, b2, store)
    assert k2b.count() == 0


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _near(text: str, seed: int) -> str:
    """A near-duplicate: append one token (shingle Jaccard ≈ 22/23 ≈
    0.96 — a token SWAP kills 3 shingles and lands at ~0.76, below
    the 0.8 gate; that miss is the LSH recall curve working, not a
    bug, so the fixture stays clearly above threshold)."""
    return text + f" tail{seed}"


def _fresh(seed: int) -> str:
    rng = random.Random(seed)
    return " ".join(rng.choices(WORDS, k=24))


def test_minhash_dedup_across_batches(spark, tmp_path):
    sig_store = SnapshotStore(tmp_path / "sigs")
    band_store = SnapshotStore(tmp_path / "bands")

    base = [(i, _fresh(i)) for i in range(1, 6)]
    k1 = incremental_minhash_dedup(
        spark, _docs(spark, base), sig_store, band_store
    )
    assert k1.count() == 5  # novel docs all kept

    # batch 2: near-dups of history + one batch-internal near-pair +
    # one genuinely new doc
    b2 = [
        (101, _near(base[0][1], 7)),   # ~history doc 1
        (102, _near(base[3][1], 8)),   # ~history doc 4
        (103, _fresh(900)),            # novel
        (104, _near(_fresh(900), 9)),  # ~batch sibling 103 (lower id)
    ]
    k2 = incremental_minhash_dedup(
        spark, _docs(spark, b2), sig_store, band_store
    )
    assert sorted(r.doc_id for r in k2.collect()) == [103]
    # artifacts grew only by the kept doc
    assert sig_store.read(spark).dropDuplicates(["doc_id"]).count() == 6
    # re-run of the same batch: the previously KEPT doc survives
    # (self-matches excluded), the dups stay dropped
    k2b = incremental_minhash_dedup(
        spark, _docs(spark, b2), sig_store, band_store
    )
    assert sorted(r.doc_id for r in k2b.collect()) == [103]


def test_minhash_short_and_null_docs(spark, tmp_path):
    sig_store = SnapshotStore(tmp_path / "s2")
    band_store = SnapshotStore(tmp_path / "b2")
    docs = _docs(spark, [(1, "one two"), (2, "one two"), (3, None)])
    kept = incremental_minhash_dedup(
        spark, docs, sig_store, band_store, shingle_n=3
    )
    # sub-shingle docs degrade to ONE whole-text shingle (ngram_expr's
    # documented degradation) — identical short docs therefore DO
    # dedup; only tokenless/NULL docs bypass the gate entirely
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]
    assert sig_store.read(spark).dropDuplicates(["doc_id"]).count() == 1


def test_minhash_dissimilar_band_collision_survives(spark, tmp_path):
    """A band collision alone is not a duplicate: the signature
    agreement must reach the threshold."""
    sig_store = SnapshotStore(tmp_path / "s3")
    band_store = SnapshotStore(tmp_path / "b3")
    a = " ".join(WORDS)
    incremental_minhash_dedup(
        spark, _docs(spark, [(1, a)]), sig_store, band_store,
        num_hash_tables=16, rows_per_band=1,  # aggressive banding
    )
    b = " ".join(reversed(WORDS[:5])) + " nu xi omicron pi rho sigma"
    kept = incremental_minhash_dedup(
        spark, _docs(spark, [(2, b)]), sig_store, band_store,
        num_hash_tables=16, rows_per_band=1,
        jaccard_threshold=0.9,
    )
    assert kept.count() == 1  # collided buckets maybe, but est < 0.9


def test_exact_deterministic_under_repartition(spark, tmp_path):
    rows = [(i, f"text {i % 7}") for i in range(40)]
    s1 = SnapshotStore(tmp_path / "r1")
    s2 = SnapshotStore(tmp_path / "r2")
    k1 = {r.doc_id for r in incremental_exact_dedup(
        spark, _docs(spark, rows), s1).collect()}
    k2 = {r.doc_id for r in incremental_exact_dedup(
        spark, _docs(spark, rows).repartition(13), s2).collect()}
    assert k1 == k2 == {0, 1, 2, 3, 4, 5, 6}


def test_yaml_builtin_modes_and_guard(spark, tmp_path):
    from snapflow_spark.plans.yaml_config import BUILTINS
    import pytest as _pytest

    fn = BUILTINS["core.dedup_incremental"]
    b1 = _docs(spark, [(1, "alpha text"), (2, "alpha text")])
    k = fn(spark, b1, artifacts=str(tmp_path / "art"))
    assert [r.doc_id for r in k.collect()] == [1]
    k2 = fn(spark, _docs(spark, [(3, "alpha text")]), artifacts=str(tmp_path / "art"))
    assert k2.count() == 0  # history caught it
    km = fn(
        spark, _docs(spark, [(4, " ".join(WORDS))]),
        artifacts=str(tmp_path / "art2"), mode="minhash",
    )
    assert km.count() == 1
    with _pytest.raises(ValueError, match="exact|minhash"):
        fn(spark, b1, artifacts=str(tmp_path / "art3"), mode="nope")
