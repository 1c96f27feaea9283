"""D4 selection (operators/similarity.py: prototype_filter, d4_select
— Tirumala et al. 2023): per-cell prototype ranking matches a numpy
reference built from the SAME quantizer centroids, drop counts are
exact, `among` restricts ranking to dedup survivors, and the composed
recipe keeps exactly (reps − ceil(drop_frac·reps)) per cell.
"""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from snapflow_spark.operators import IVFIndex, d4_select, prototype_filter


@pytest.fixture(scope="module")
def clustered(spark):
    """Two well-separated gaussian blobs (20 + 30 points) plus 3
    near-duplicate copies of point 0 — k=2 k-means recovers the blobs
    exactly, so cell structure is deterministic."""
    rng = random.Random(7)
    rows = []
    for i in range(20):
        rows.append((i, [5.0 + rng.gauss(0, 0.5) for _ in range(8)]))
    for i in range(20, 50):
        rows.append((i, [-5.0 + rng.gauss(0, 0.5) for _ in range(8)]))
    base = rows[0][1]
    for j in range(3):
        rows.append((100 + j, [x + rng.gauss(0, 0.004) for x in base]))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )
    return df, {i: np.array(v) for i, v in rows}


def _numpy_keep_set(index, vecs, ids, drop_frac):
    """Reference: rank by cosine-to-own-centroid desc (ties id asc)
    per cell, drop the top min(ceil(drop_frac * n), n-1) — a cell
    never empties."""
    cells = {}
    for i in ids:
        v = vecs[i]
        sims = index.centers @ v / (
            np.linalg.norm(index.centers, axis=1) * np.linalg.norm(v)
        )
        cell = int(sims.argmax())
        proto = round(float(sims[cell]), 8)
        cells.setdefault(cell, []).append((-proto, i))
    kept = set()
    for members in cells.values():
        members.sort()
        n_drop = min(math.ceil(drop_frac * len(members)), len(members) - 1)
        kept.update(i for _, i in members[n_drop:])
    return kept


def test_prototype_ranking_matches_numpy_reference(clustered):
    df, vecs = clustered
    index = IVFIndex.build(df, k_cells=2, vec_col="embedding", id_col="vec_id")
    got = prototype_filter(index, drop_frac=0.25)
    kept = {r.vec_id for r in got.where("is_kept").collect()}
    want = _numpy_keep_set(index, vecs, list(vecs), 0.25)
    assert kept == want


def test_drop_counts_are_exact_per_cell(clustered):
    df, _ = clustered
    index = IVFIndex.build(df, k_cells=2, vec_col="embedding", id_col="vec_id")
    for frac in (0.0, 0.1, 0.5):
        out = (
            prototype_filter(index, drop_frac=frac)
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("is_kept").cast("long")).alias("kept"),
            )
            .collect()
        )
        for r in out:
            assert r.n - r.kept == min(math.ceil(frac * r.n), r.n - 1), (
                frac,
                r,
            )
    with pytest.raises(ValueError, match="drop_frac"):
        prototype_filter(index, drop_frac=1.0)


def test_singleton_cell_keeps_its_only_member(spark):
    """A cell with one member must keep it for ANY drop_frac — the
    sole representative of a semantic region cannot be erased — and
    small cells are capped at n-1 drops (n=2 at frac 0.9 drops 1,
    not 2)."""
    rows = [(0, [10.0] * 4)]  # blob A: singleton
    rows += [(i, [-10.0 + 0.01 * i] * 4) for i in range(1, 3)]  # blob B: n=2
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    index = IVFIndex.build(df, k_cells=2, vec_col="embedding", id_col="vec_id")
    for frac in (0.2, 0.9):
        out = {
            r.cell: r
            for r in prototype_filter(index, drop_frac=frac)
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("is_kept").cast("long")).alias("kept"),
            )
            .collect()
        }
        for r in out.values():
            assert r.kept >= 1, (frac, r)
            assert r.n - r.kept == min(math.ceil(frac * r.n), r.n - 1)


def _blob_corpus(spark, n_rows, dim=6, noise=0.1):
    """n_rows vectors in well-separated deterministic blobs of ~50,
    plus 3 planted near-copies of row 0."""
    rng = random.Random(11)
    rows = []
    for i in range(n_rows):
        b = i // 50
        base = [20.0 * ((b * (d + 3)) % 7) for d in range(dim)]
        rows.append((i, [x + rng.gauss(0, noise) for x in base]))
    base0 = rows[0][1]
    for j in range(3):
        rows.append((10_000 + j, [x + rng.gauss(0, 0.001) for x in base0]))
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )


def test_target_cell_size_autoscales_cells_with_corpus(spark):
    """The deployment rule (~target members/cell) enforced by code:
    k_cells derives from the corpus count, so a 4x corpus gets 4x the
    cells and cell size stays flat — instead of silently growing
    toward the cell_max_bucket truncation cliff."""
    from snapflow_spark.operators.similarity import derive_k_cells

    assert derive_k_cells(100_000_000, 2000) == 50_000  # the paper regime
    assert derive_k_cells(1, 2000) == 1
    assert derive_k_cells(2001, 2000) == 2
    with pytest.raises(ValueError, match="target_cell_size"):
        derive_k_cells(10, 0)

    small = _blob_corpus(spark, 150)
    big = _blob_corpus(spark, 600)
    i_small = IVFIndex.build(small, target_cell_size=50, id_col="vec_id")
    i_big = IVFIndex.build(big, target_cell_size=50, id_col="vec_id")
    assert len(i_small.centers) == (150 + 3 + 49) // 50
    assert len(i_big.centers) == (600 + 3 + 49) // 50
    # an explicit pre-collected sample contradicts the derivation
    with pytest.raises(ValueError, match="sample"):
        IVFIndex.build(
            big, target_cell_size=50, id_col="vec_id",
            sample=i_small.centers,
        )


def test_target_cell_size_keeps_truncation_zero(spark):
    """On the planted blob geometry, auto-scaled cells stay under
    cell_max_bucket (zero truncation, dedup exact), while a FIXED
    k_cells=1 on the same corpus and cap visibly truncates — the
    cliff the auto-scaling exists to prevent."""
    from pyspark.sql import Observation

    from snapflow_spark.operators import semantic_dedup

    corpus = _blob_corpus(spark, 600)
    obs = Observation("auto")
    sd = semantic_dedup(
        corpus,
        cos_threshold=0.999,
        target_cell_size=50,
        cell_max_bucket=128,
        observation=obs,
    )
    rows = {r.vec_id: r for r in sd.collect()}
    m = obs.get
    assert m["truncated_buckets"] == 0 and m["dropped_members"] == 0
    # the 3 planted copies of row 0 deduped into row 0's component
    for j in (10_000, 10_001, 10_002):
        assert rows[j].component == rows[0].component and not rows[j].is_rep
    # contrast: one fixed cell at the same cap -> everything in one
    # bucket, truncation fires
    obs_fixed = Observation("fixed")
    fixed_index = IVFIndex.build(corpus, k_cells=1, id_col="vec_id")
    semantic_dedup(
        index=fixed_index, cell_max_bucket=128, observation=obs_fixed
    ).count()
    assert obs_fixed.get["dropped_members"] > 0


def test_d4_select_accepts_target_cell_size(spark):
    corpus = _blob_corpus(spark, 150)
    decision = d4_select(
        corpus, cos_threshold=0.999, drop_frac=0.2,
        target_cell_size=50, id_col="vec_id",
    )
    rows = {r.vec_id: r for r in decision.collect()}
    assert len(rows) == 153
    # planted copies deduped (blob members are cosine-near at this
    # geometry, so components span blobs — the copies specifically
    # must be non-reps of row 0's component)
    for j in (10_000, 10_001, 10_002):
        assert rows[j].component == rows[0].component and not rows[j].is_rep
    # survivors diversified per cell: some rep was dropped by the
    # prototype stage, and every kept row is a rep
    assert any(r.is_rep and not r.is_kept for r in rows.values())
    assert all(r.is_rep for r in rows.values() if r.is_kept)
    assert any(r.is_kept for r in rows.values())


def test_among_restricts_ranking(clustered):
    df, vecs = clustered
    index = IVFIndex.build(df, k_cells=2, vec_col="embedding", id_col="vec_id")
    subset = [i for i in vecs if i % 2 == 0]
    among = df.where(F.col("vec_id").isin(subset)).select("vec_id")
    got = prototype_filter(index, drop_frac=0.25, among=among)
    rows = got.collect()
    assert {r.vec_id for r in rows} == set(subset)  # others never ranked
    kept = {r.vec_id for r in rows if r.is_kept}
    assert kept == _numpy_keep_set(index, vecs, subset, 0.25)


def test_d4_end_to_end(clustered):
    df, vecs = clustered
    decision = d4_select(
        df, cos_threshold=0.99, drop_frac=0.2, k_cells=2, id_col="vec_id"
    )
    rows = {r.vec_id: r for r in decision.collect()}
    assert len(rows) == len(vecs)  # every vector got a decision
    # stage 1: the 3 planted copies of vec 0 deduped — one component,
    # vec 0 represents, copies carry NULL proto and are not kept
    for j in (100, 101, 102):
        assert rows[j].component == 0 and not rows[j].is_rep
        assert rows[j].proto is None and not rows[j].is_kept
    assert rows[0].is_rep
    # stage 2 accounting: per cell, kept = reps - ceil(0.2 * reps)
    reps = [i for i, r in rows.items() if r.is_rep]
    n_kept = sum(1 for r in rows.values() if r.is_kept)
    # rebuild cell split of the reps from the numpy keep-set machinery
    index = IVFIndex.build(df, k_cells=2, vec_col="embedding", id_col="vec_id")
    want_kept = _numpy_keep_set(index, vecs, reps, 0.2)
    assert n_kept == len(want_kept)
    # a kept doc is always a representative
    assert all(rows[i].is_rep for i, r in rows.items() if r.is_kept)


def test_d4_requires_corpus_or_index(clustered):
    with pytest.raises(ValueError, match="corpus or an index"):
        d4_select()
    df, _ = clustered
    index = IVFIndex.build(df, k_cells=2, vec_col="embedding", id_col="vec_id")
    # index-only form works and matches the corpus form
    a = sorted(
        (r.vec_id, r.is_kept)
        for r in d4_select(index=index, cos_threshold=0.99, drop_frac=0.2).collect()
    )
    b = sorted(
        (r.vec_id, r.is_kept)
        for r in d4_select(
            df, cos_threshold=0.99, drop_frac=0.2, k_cells=2, id_col="vec_id"
        ).collect()
    )
    assert [x for x, _ in a] == [x for x, _ in b]


def test_d4_yaml_builtin(clustered):
    from snapflow_spark.plans.yaml_config import BUILTINS

    df, _ = clustered
    out = BUILTINS["core.d4"](
        df.sparkSession, df, cos_threshold=0.99, drop_frac=0.2, k_cells=2
    )
    assert set(out.columns) == {"vec_id", "component", "is_rep", "proto", "is_kept"}
    assert out.where("is_kept AND NOT is_rep").count() == 0
