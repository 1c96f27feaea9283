"""Corpus profiling — the mergeable "data card" every released
pre-training corpus ships (doc/token counts, length distributions,
duplication rate, quality mass, per-language breakdown).

The 100 TB shape is the same partials/rollup split the sketch module
uses (functions/sketches.py): ``profile_partials`` folds ONE scan of
the text into a handful of rows per group — counters plus mergeable
sketches (KLL for length quantiles, HLL for distinct fingerprints) —
and ``profile_report`` reads ONLY those rows to produce the card, at
any coarser grouping. So the expensive pass is a single map-side-
combined aggregation over codegen features (no UDFs, no second text
scan), and the cheap pass is re-runnable forever: persist per-batch
partials in a SnapshotStore and the corpus dashboard never touches
text again — profiles MERGE across ingest batches the way the
incremental dedup artifacts do (operators/dedup_incremental.py).

Duplication rate falls out of the sketch algebra: ``n_docs`` counts
rows, the HLL over the exact-dedup fingerprint (functions/text.py::
fingerprint_expr) estimates distinct docs, and
``dup_rate = 1 - distinct/total`` — the number exact_dedup would
remove, estimated without a shuffle-heavy distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.functions.sketches import _plabel
from snapflow_spark.functions.text import (
    fingerprint_expr,
    quality_score_expr,
    token_count_expr,
)

#: Default card quantiles: the spread (p10/p50/p90) plus the tail
#: (p99) that sequence-packing and truncation decisions read.
PROFILE_QUANTILES = (0.1, 0.5, 0.9, 0.99)


def _kll_merge(col: str) -> Column:
    """Fold a collect_list of KLL sketches into one (binary scalar
    merge — no union-agg form in Spark yet; each element is a
    KB-scale sketch, one per input group, never row-scale)."""
    ks = F.col(col)
    return F.aggregate(
        F.slice(ks, 2, F.greatest(F.size(ks) - 1, F.lit(0))),
        F.element_at(ks, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )


def profile_partials(
    df: DataFrame,
    text_col: str = "text",
    by: list[str] | None = None,
    kll_k: int = 200,
    hll_lgk: int = 12,
) -> DataFrame:
    """One profile row per ``by`` group (global row when ``by`` is
    empty): additive counters + mergeable sketches. THE text scan —
    everything downstream reads these rows only.

    Columns: ``n_docs, n_empty, n_chars, n_tokens, sum_quality``
    (additive), ``kll_tokens, kll_chars`` (KLL sketches over per-doc
    token/char counts), ``hll_fp`` (HLL over the exact-dedup
    fingerprint). All features are whole-stage-codegen expressions;
    the aggregation partial-combines map-side, so the shuffle is
    O(groups), not O(docs)."""
    c = F.col(text_col)
    n_toks = token_count_expr(c).cast("double")
    n_chars = F.length(c).cast("double")
    feat = df.select(
        *(by or []),
        n_toks.alias("__nt"),
        n_chars.alias("__nc"),
        (F.length(F.trim(c)) == 0).cast("long").alias("__empty"),
        quality_score_expr(c).alias("__q"),
        fingerprint_expr(c).alias("__fp"),
    )
    return feat.groupBy(*(by or [])).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__empty").alias("n_empty"),
        F.sum("__nc").cast("long").alias("n_chars"),
        F.sum("__nt").cast("long").alias("n_tokens"),
        F.sum("__q").alias("sum_quality"),
        F.kll_sketch_agg_double("__nt", F.lit(kll_k)).alias("kll_tokens"),
        F.kll_sketch_agg_double("__nc", F.lit(kll_k)).alias("kll_chars"),
        F.hll_sketch_agg("__fp", F.lit(hll_lgk)).alias("hll_fp"),
    )


def profile_report(
    partials: DataFrame,
    by: list[str] | None = None,
    quantiles: tuple[float, ...] = PROFILE_QUANTILES,
) -> DataFrame:
    """The data card from partials alone, merged to any coarser
    grouping (default: one global row). Counters add, KLL sketches
    fold, HLL sketches union — text is never re-read, so this runs
    identically over fresh partials or a store of per-batch ones."""
    merged = (
        partials.groupBy(*(by or []))
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_empty").alias("n_empty"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("sum_quality").alias("sum_quality"),
            F.collect_list("kll_tokens").alias("__kt"),
            F.collect_list("kll_chars").alias("__kc"),
            F.hll_union_agg("hll_fp").alias("__hfp"),
        )
        .select(
            *(by or []),
            "n_docs",
            "n_empty",
            "n_chars",
            "n_tokens",
            "sum_quality",
            _kll_merge("__kt").alias("__ktm"),
            _kll_merge("__kc").alias("__kcm"),
            F.hll_sketch_estimate("__hfp").alias("n_distinct_docs"),
        )
    )
    return merged.select(
        *(by or []),
        "n_docs",
        "n_chars",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("n_docs"), 2).alias("mean_tokens"),
        F.round(F.col("n_empty") / F.col("n_docs"), 6).alias("pct_empty"),
        F.round(F.col("sum_quality") / F.col("n_docs"), 6).alias("mean_quality"),
        *[
            F.kll_sketch_get_quantile_double("__ktm", F.lit(p)).alias(
                "tokens_" + _plabel(p)
            )
            for p in quantiles
        ],
        *[
            F.kll_sketch_get_quantile_double("__kcm", F.lit(p)).alias(
                "chars_" + _plabel(p)
            )
            for p in quantiles
        ],
        F.col("n_distinct_docs"),
        F.round(
            F.greatest(
                F.lit(0.0), 1 - F.col("n_distinct_docs") / F.col("n_docs")
            ),
            6,
        ).alias("dup_rate"),
    )


def corpus_profile(
    df: DataFrame,
    text_col: str = "text",
    by: list[str] | None = None,
    quantiles: tuple[float, ...] = PROFILE_QUANTILES,
    kll_k: int = 200,
    hll_lgk: int = 12,
) -> DataFrame:
    """Convenience: partials → report in one plan (ad-hoc profiling).
    Long-lived pipelines should persist ``profile_partials`` per
    ingest batch instead and report from the store."""
    return profile_report(
        profile_partials(df, text_col, by, kll_k=kll_k, hll_lgk=hll_lgk),
        by,
        quantiles,
    )


def profile_diff(
    card_a: DataFrame,
    card_b: DataFrame,
    by: list[str] | None = None,
    tolerance: float = 0.25,
) -> DataFrame:
    """Drift between two data cards (e.g. this ingest batch vs the
    corpus to date): one row per (group,) metric with both values,
    the b/a ratio, and a breach flag when the ratio leaves
    [1-tolerance, 1/(1-tolerance)]. The ingest-monitoring primitive —
    a batch whose mean_tokens halves or dup_rate quadruples is a
    crawler or extractor incident, and this surfaces it from two
    1-row-per-group frames (no corpus access at all).

    Count metrics (n_docs/n_chars/n_tokens/n_distinct_docs) are
    EXCLUDED from breach flagging by default reasoning: batch sizes
    legitimately vary; shape metrics (means, quantiles, rates) are
    what drift watches. They still appear in the output with ratios.
    """
    keys = list(by or [])
    shape_prefixes = ("mean_", "pct_", "dup_", "tokens_p", "chars_p")
    metrics = [c for c in card_a.columns if c not in keys]
    lo = 1.0 - tolerance
    hi = 1.0 / lo

    def melt(card: DataFrame, side: str) -> DataFrame:
        pairs = []
        for m in metrics:
            pairs.append(F.struct(F.lit(m).alias("metric"),
                                  F.col(m).cast("double").alias(side)))
        return card.select(
            *keys, F.explode(F.array(*pairs)).alias("__kv")
        ).select(*keys, "__kv.metric", f"__kv.{side}")

    joined = melt(card_a, "a").join(melt(card_b, "b"), [*keys, "metric"])
    ratio = F.when(F.col("a") != 0, F.col("b") / F.col("a"))
    is_shape = F.col("metric").rlike("^(" + "|".join(shape_prefixes) + ")")
    return joined.select(
        *keys,
        "metric",
        "a",
        "b",
        F.round(ratio, 6).alias("ratio"),
        (
            # NULL ratio (a == 0) is only a breach when the values
            # actually differ — 0 vs 0 (clean corpus vs clean corpus)
            # must not alarm
            is_shape
            & F.coalesce((ratio < lo) | (ratio > hi),
                         F.col("b") != F.col("a"))
        ).alias("breach"),
    )


def embedding_profile(
    df: DataFrame,
    vec_col: str = "embedding",
    by: list[str] | None = None,
    quantiles: tuple[float, ...] = PROFILE_QUANTILES,
    kll_k: int = 200,
) -> DataFrame:
    """The VECTOR-table data card — the health check run before any
    similarity/ANN/D4 job, because every one of them silently
    degrades on the pathologies this surfaces: NULL or empty vectors
    (match nothing), mixed dimensions (crash or worse, broadcast-side
    truncation), zero vectors (cosine 0 with everything — planted by
    the text-embedder's NULL policy, so COUNT them, don't discover
    them pair-by-pair), non-finite components (poison every dot
    product downstream), and un-normalized norms when cosine assumed
    unit length.

    One codegen scan -> one aggregation row per group: n_vecs,
    n_null, n_empty, dim_min/dim_max (equal = consistent), n_zero,
    n_nonfinite, mean_norm + norm quantiles (KLL). All Column
    algebra (higher-order aggregate for the norm), no python."""
    v = F.col(vec_col)
    norm_sq = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    nonfinite = F.exists(
        v, lambda x: F.isnan(x.cast("double")) | (F.abs(x) == float("inf"))
    )
    feat = df.select(
        *(by or []),
        v.isNull().cast("long").alias("__null"),
        F.when(v.isNull(), None).otherwise(F.size(v)).alias("__dim"),
        F.when(v.isNull() | nonfinite, None)
        .otherwise(F.sqrt(norm_sq))
        .alias("__norm"),
        F.coalesce(nonfinite, F.lit(False)).cast("long").alias("__nonfin"),
    )
    agg = feat.groupBy(*(by or [])).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("__null").alias("n_null"),
        F.sum((F.col("__dim") == 0).cast("long")).alias("n_empty"),
        F.min("__dim").alias("dim_min"),
        F.max("__dim").alias("dim_max"),
        F.sum("__nonfin").alias("n_nonfinite"),
        # zero VECTORS only — empties are already counted in n_empty,
        # and their norm is also 0 (double-counting would overstate)
        F.sum(
            ((F.col("__norm") == 0.0) & (F.col("__dim") > 0)).cast("long")
        ).alias("n_zero"),
        F.round(F.avg("__norm"), 6).alias("mean_norm"),
        F.kll_sketch_agg_double("__norm", F.lit(kll_k)).alias("__kll"),
    )
    return agg.select(
        *(by or []),
        "n_vecs",
        "n_null",
        "n_empty",
        "dim_min",
        "dim_max",
        (F.col("dim_min") == F.col("dim_max")).alias("dim_consistent"),
        "n_zero",
        "n_nonfinite",
        "mean_norm",
        *[
            F.kll_sketch_get_quantile_double("__kll", F.lit(p)).alias(
                "norm_" + _plabel(p)
            )
            for p in quantiles
        ],
    )
