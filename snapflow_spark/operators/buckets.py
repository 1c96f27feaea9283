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
