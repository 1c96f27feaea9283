"""Shared LSH bucket -> candidate-pair pattern (SURVEY.md §2.B.11).

All near-dup operators (MinHash bands, SimHash bands, signed random
projections) reduce to the same physical shape:

    (bucket key, member) rows
      -> ONE shuffle: groupBy(bucket key) + collect members
      -> in-bucket all-pairs via higher-order fns (codegen, no self-join)
      -> explode pairs

A band self-join would evaluate the signature subtree once per side
and shuffle the full table twice; this shape does one pass and one
shuffle, and bounds the quadratic in-bucket work with ``max_bucket``
(degenerate buckets — e.g. near-empty documents — are truncated after
an id-sort, never N²).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    member_struct: Column,
    pair_fn: Callable[[Column, Column], Column],
    max_bucket: int = 64,
    observation=None,
) -> DataFrame:
    """``df`` has one row per (bucket key, member). Returns one row per
    in-bucket ordered pair, shaped by ``pair_fn(a, b) -> struct``.

    ``member_struct``'s FIRST field must be the unique id — members are
    sorted on it, so pair_fn always sees id_a < id_b. Callers dedupe
    across buckets afterwards (dropDuplicates on the pair ids).

    ``observation`` (a ``pyspark.sql.Observation``): the max_bucket
    truncation is a RECALL loss by design — degenerate buckets are cut
    after an id-sort rather than exploding N² — but in production that
    loss must be measurable, not silent. When an Observation is
    passed, truncation counters accumulate on it during whatever
    action the caller runs anyway (zero extra scans, same contract as
    quality.observe_expectations): ``buckets`` (all), ``pair_buckets``
    (>1 member), ``truncated_buckets`` (> max_bucket members),
    ``dropped_members`` (members cut), ``dropped_pairs`` (candidate
    pairs lost: C(n,2) − C(max_bucket,2) summed over truncated
    buckets), ``max_bucket_size``. Read ``observation.get`` AFTER the
    first action. Exactness caveat (inherent to Spark observed
    metrics): counters are exact when the observed subtree
    materializes once — persist()/checkpoint the downstream candidate
    frame if it is referenced multiple times (ngram_jaccard_pairs
    does); cache eviction or concurrently-scheduled sibling stages
    recompute the subtree and recount."""
    grouped = df.groupBy(*bucket_cols).agg(
        F.collect_list(member_struct).alias("__all")
    )
    sized = grouped.select(
        *bucket_cols,
        F.size("__all").alias("__n"),
        F.slice(F.array_sort("__all"), 1, max_bucket).alias("members"),
    )
    if observation is not None:
        # n cast to LONG before any product: F.size is IntegerType and
        # n*(n-1) overflows 32 bits at ~46k members — exactly the
        # mega-bucket case these counters exist to measure (ANSI mode,
        # Spark 4's default, would turn that into a query-killing
        # ARITHMETIC_OVERFLOW instead of a metric).
        n, m = F.col("__n").cast("long"), F.lit(int(max_bucket)).cast("long")
        sized = sized.observe(
            observation,
            F.count(F.lit(1)).alias("buckets"),
            F.sum((n > 1).cast("long")).alias("pair_buckets"),
            F.sum((n > m).cast("long")).alias("truncated_buckets"),
            F.sum(F.greatest(n - m, F.lit(0).cast("long"))).alias("dropped_members"),
            F.sum(
                F.when(n > m, (n * (n - 1) - m * (m - 1)) / 2).otherwise(0)
            ).cast("long").alias("dropped_pairs"),
            F.max(n).alias("max_bucket_size"),
        )
    buckets = sized.where(F.size("members") > 1)
    pair_structs = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + F.lit(2), F.size(F.col("members"))),
                lambda y: pair_fn(x, y),
            ),
        )
    )
    return buckets.select(F.explode(pair_structs).alias("p")).select("p.*")


def lsh_candidate_prob(s: float, b: int, r: int) -> float:
    """P(pair with Jaccard similarity ``s`` becomes a candidate) under
    b bands of r rows: the classic S-curve 1 - (1 - s^r)^b (Leskovec,
    Rajaraman & Ullman, Mining of Massive Datasets §3.4.2)."""
    return 1.0 - (1.0 - s**r) ** b


def lsh_threshold(b: int, r: int) -> float:
    """The S-curve's inflection-point approximation (1/b)^(1/r) — the
    similarity at which candidacy becomes more likely than not."""
    return (1.0 / b) ** (1.0 / r)


def optimal_bands(
    num_hashes: int,
    threshold: float,
    fp_weight: float = 0.5,
    steps: int = 1000,
) -> tuple[int, int]:
    """Choose (bands, rows) for a MinHash signature of ``num_hashes``
    values targeting Jaccard ``threshold``: minimize
    ``fp_weight · ∫₀ᵗ P(s) ds + (1-fp_weight) · ∫ᵗ¹ (1-P(s)) ds``
    (the false-positive mass below the threshold plus the
    false-negative mass above it, trapezoid-integrated in ``steps``)
    over every (b, r) with b·r ≤ num_hashes. Deterministic; ties
    break toward more bands (recall). The standard parameter-tuning
    rule every LSH library applies — exposed so callers sizing a
    custom banding (minhash_sha_candidates pins its own oracle-
    reproducible 16×2) can derive one from a target threshold."""
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0, 1): {threshold}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1: {num_hashes}")
    best: tuple[float, int, int] | None = None
    for r in range(1, num_hashes + 1):
        b = num_hashes // r
        if b < 1:
            break
        fp = fn = 0.0
        for k in range(steps + 1):
            s = k / steps
            w = 0.5 if k in (0, steps) else 1.0
            p = lsh_candidate_prob(s, b, r)
            if s < threshold:
                fp += w * p
            else:
                fn += w * (1.0 - p)
        err = (fp_weight * fp + (1.0 - fp_weight) * fn) / steps
        key = (err, -b, r)
        if best is None or key < (best[0], -best[1], best[2]):
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]
