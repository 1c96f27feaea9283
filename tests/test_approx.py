"""Property tests for approximate operators (SURVEY.md §5.2(3)) —
no-t2 ops verified against exact computation within tolerance."""

import pyspark.sql.functions as F

from snapflow_spark.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rtol(spark):
    o = load_table(spark, SF, "orders")
    row = o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_percentile_approx_brackets_exact(spark):
    li = load_table(spark, SF, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.01


def test_hll_sketch_merge_equals_whole_data_sketch(spark):
    """THE mergeability contract: per-shard HLL sketches unioned give
    the SAME estimate as one sketch over all data — rollups never
    re-scan history."""
    from snapflow_spark.functions.sketches import hll_partials, hll_rollup

    df = spark.range(0, 20000).select(
        (F.col("id") % 4).alias("shard"), (F.col("id") % 3777).alias("user")
    )
    partials = hll_partials(df, "user", by=["shard"])
    merged = hll_rollup(partials).first()["n_distinct"]
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user", F.lit(12)))
    ).first()[0]
    assert merged == direct  # identical sketch algebra, not just close
    assert abs(merged - 3777) / 3777 < 0.05


def test_kll_quantile_merge_brackets_exact(spark):
    from snapflow_spark.functions.sketches import (
        kll_quantile_partials,
        kll_rollup_quantiles,
    )

    df = spark.range(0, 10000).select(
        (F.col("id") % 8).alias("shard"), F.col("id").cast("double").alias("v")
    )
    partials = kll_quantile_partials(df, "v", by=["shard"])
    q = kll_rollup_quantiles(partials, [0.5, 0.99]).first()
    assert abs(q["p50"] - 5000) < 200
    assert abs(q["p99"] - 9900) < 200


def test_kll_quantile_labels_do_not_collide():
    from snapflow_spark.functions.sketches import _plabel

    labels = [_plabel(p) for p in (0.5, 0.99, 0.999, 0.001, 0.25)]
    assert labels == ["p50", "p99", "p99_9", "p0_1", "p25"]
    assert len(set(labels)) == len(labels)
