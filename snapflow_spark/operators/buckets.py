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
) -> DataFrame:
    """``df`` has one row per (bucket key, member). Returns one row per
    in-bucket ordered pair, shaped by ``pair_fn(a, b) -> struct``.

    ``member_struct``'s FIRST field must be the unique id — members are
    sorted on it, so pair_fn always sees id_a < id_b. Callers dedupe
    across buckets afterwards (dropDuplicates on the pair ids)."""
    buckets = (
        df.groupBy(*bucket_cols)
        .agg(
            F.slice(F.array_sort(F.collect_list(member_struct)), 1, max_bucket).alias(
                "members"
            )
        )
        .where(F.size("members") > 1)
    )
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
