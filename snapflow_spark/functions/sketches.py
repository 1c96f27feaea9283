"""Mergeable sketches (SURVEY.md §2.B.4 approx ops) — the 100 TB
aggregation story made explicit.

At scale, "how many distinct users" and "what is p99 latency" are
answered by sketches because sketches MERGE: each shard/partition/day
computes a small fixed-size summary once, and any rollup (cross-shard,
cross-day, incremental) is a union of summaries — no re-scan of
history. Spark 4 ships the Apache DataSketches family
(hll_sketch_agg/hll_union/hll_sketch_estimate, kll_* quantiles,
theta_* set ops); these helpers wrap the two canonical patterns so
pipelines use them as one-liners, and the tests pin the merge
property itself (union-of-partials == whole-data sketch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_partials(
    df: DataFrame, key: str | Column, by: list[str], lgk: int = 12
) -> DataFrame:
    """One HLL sketch per ``by`` group — the shard-level summary a
    long-lived pipeline persists (a few KB per group) instead of raw
    keys. Column ``hll`` is a binary, mergeable sketch."""
    return df.groupBy(*by).agg(F.hll_sketch_agg(key, F.lit(lgk)).alias("hll"))


def hll_rollup(partials: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Merge shard sketches to any coarser grouping (or global when
    ``by`` is empty) and estimate distinct counts — reads ONLY the
    sketches, never the raw data again."""
    grouped = partials.groupBy(*(by or []))
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("n_distinct")
    )


def kll_quantile_partials(
    df: DataFrame, value: str | Column, by: list[str], k: int = 200
) -> DataFrame:
    """One KLL quantile sketch (double) per group — the mergeable
    alternative to exact percentiles whose state is bounded by k, not
    by group cardinality."""
    return df.groupBy(*by).agg(
        F.kll_sketch_agg_double(value, F.lit(k)).alias("kll")
    )


def kll_rollup_quantiles(
    partials: DataFrame, probs: list[float], by: list[str] | None = None
) -> DataFrame:
    """Merge KLL sketches to a coarser grouping and read quantiles
    from the merged sketch."""
    grouped = partials.groupBy(*(by or []))
    # kll_sketch_merge_double is a BINARY scalar merge (no union-agg
    # form yet): collect the group's sketches — one small binary per
    # shard, never row-scale — and fold them
    merged = grouped.agg(F.collect_list("kll").alias("ks")).select(
        *(by or []),
        F.aggregate(
            F.slice("ks", 2, F.greatest(F.size("ks") - 1, F.lit(0))),
            F.element_at("ks", 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("kll"),
    )
    return merged.select(
        *(by or []),
        *[
            F.kll_sketch_get_quantile_double("kll", F.lit(p)).alias(_plabel(p))
            for p in probs
        ],
    )


def _plabel(p: float) -> str:
    """Collision-free quantile column label: p50, p99, p99_9, p0_1 —
    truncating to int would alias 0.99 and 0.999 both to 'p99'."""
    return "p" + f"{p * 100:g}".replace(".", "_").replace("-", "m")


def theta_partials(
    df: DataFrame, key: str | Column, by: list[str], lgk: int = 12
) -> DataFrame:
    """One Theta sketch per group — like HLL it estimates distinct
    counts from a KB-scale summary, but Theta additionally supports
    SET OPERATIONS on merged sketches (intersection/difference), which
    is the tool for corpus questions like "how many distinct doc
    fingerprints do crawl A and crawl B share" without rescanning
    either crawl."""
    return df.groupBy(*by).agg(F.theta_sketch_agg(key, F.lit(lgk)).alias("theta"))


def theta_rollup(partials: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Union-merge Theta partials to a coarser grouping and estimate
    distinct counts — sketches only, raw data never re-read."""
    grouped = partials.groupBy(*(by or []))
    return grouped.agg(
        F.theta_sketch_estimate(F.theta_union_agg("theta")).alias("n_distinct")
    )


def theta_overlap(
    partials_a: DataFrame, partials_b: DataFrame
) -> DataFrame:
    """Estimated |A ∩ B| and |A \\ B| between two partial sets (each
    union-merged to one sketch first). One row: n_a, n_b, n_common,
    n_only_a — the crawl-overlap / contamination dashboard numbers."""
    a = partials_a.agg(F.theta_union_agg("theta").alias("ta"))
    b = partials_b.agg(F.theta_union_agg("theta").alias("tb"))
    return (
        a.crossJoin(b)
        .select(
            F.theta_sketch_estimate("ta").alias("n_a"),
            F.theta_sketch_estimate("tb").alias("n_b"),
            F.theta_sketch_estimate(
                F.theta_intersection("ta", "tb")
            ).alias("n_common"),
            F.theta_sketch_estimate(F.theta_difference("ta", "tb")).alias(
                "n_only_a"
            ),
        )
    )
