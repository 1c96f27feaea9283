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


def test_theta_rollup_and_overlap(spark):
    """Theta partials merge like HLL, and intersection/difference
    estimates answer the crawl-overlap question from sketches only.
    On small exact-capacity sketches the estimates are exact."""
    from pyspark.sql import functions as F

    from snapflow_spark.functions.sketches import (
        theta_overlap,
        theta_partials,
        theta_rollup,
    )

    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("shard"), F.concat(F.lit("u"), (F.col("id") % 3000)).alias("user")
    )
    partials = theta_partials(df, "user", by=["shard"])
    merged = theta_rollup(partials).first()["n_distinct"]
    assert abs(merged - 3000) / 3000 < 0.05

    # overlap: A = users 0..2999, B = users 2000..4999 -> common 1000
    b = spark.range(2000, 5000).select(
        F.lit(0).alias("shard"), F.concat(F.lit("u"), F.col("id")).alias("user")
    )
    pb = theta_partials(b, "user", by=["shard"])
    row = theta_overlap(partials, pb).first()
    assert abs(row.n_common - 1000) / 1000 < 0.1
    assert abs(row.n_only_a - 2000) / 2000 < 0.1


def test_bloom_filter_contract():
    """No false negatives ever; false-positive rate in the configured
    ballpark; merge(A, B) bit-identical to build(A ∪ B); serialization
    round-trips."""
    from snapflow_spark.functions.bloom import BloomFilter

    m, k = 1 << 14, 5
    a_keys = [f"a{i}" for i in range(500)]
    b_keys = [f"b{i}" for i in range(500)]
    a = BloomFilter.from_items(a_keys, m, k)
    b = BloomFilter.from_items(b_keys, m, k)
    assert all(a.contains(x) for x in a_keys)  # no false negatives
    fp = sum(a.contains(f"zz{i}") for i in range(10000)) / 10000
    assert fp < 0.05, fp  # m/n=32 bits/key, k=5 -> ~0.2% expected

    merged = a.merge(b)
    union = BloomFilter.from_items(a_keys + b_keys, m, k)
    assert (merged.bits == union.bits).all()  # exact merge contract

    rt = BloomFilter.deserialize(merged.serialize())
    assert (rt.bits == merged.bits).all() and (rt.m, rt.k) == (m, k)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        a.merge(BloomFilter(1 << 10, 5))
    with _pytest.raises(ValueError):
        BloomFilter.deserialize(b"junk")


def test_bloom_spark_build_and_filter(spark):
    """Distributed build is bit-identical to the local build over the
    same keys; membership filter keeps every true member and the
    negated form drops none of the genuinely-new keys (the ingestion
    dedup shape: no false negatives -> no lost data)."""
    from pyspark.sql import functions as F

    from snapflow_spark.functions.bloom import (
        BloomFilter,
        build_bloom,
        filter_might_contain,
    )

    seen = spark.range(0, 2000).select(F.concat(F.lit("k"), "id").alias("key"))
    bf = build_bloom(seen.repartition(8), "key", m_bits=1 << 16, k=5)
    local = BloomFilter.from_items([f"k{i}" for i in range(2000)], 1 << 16, 5)
    assert (bf.bits == local.bits).all()

    incoming = spark.range(1500, 4000).select(
        F.concat(F.lit("k"), "id").alias("key")
    )
    kept = {r.key for r in filter_might_contain(incoming, "key", bf).collect()}
    assert {f"k{i}" for i in range(1500, 2000)} <= kept  # all true members
    new = {r.key for r in filter_might_contain(incoming, "key", bf, negate=True).collect()}
    assert new <= {f"k{i}" for i in range(2000, 4000)}  # only genuinely-new keys
    assert len(new) >= 1900  # few false positives stole at most a handful


def test_bloom_and_cms_empty_corpus(spark):
    """Empty input yields an all-zero filter/sketch (the treeAggregate
    zeroValue path — the build no longer double-scans with isEmpty)."""
    from snapflow_spark.functions.bloom import build_bloom
    from snapflow_spark.functions.heavyhitters import build_cms

    empty = spark.range(0).selectExpr("cast(id as string) as key")
    bf = build_bloom(empty, "key", m_bits=1 << 12, k=3)
    assert not bf.bits.any() and bf.fill_ratio() == 0.0
    cms = build_cms(empty, "key", depth=3, width=64)
    assert cms.n == 0 and not cms.counts.any()
    assert cms.estimate("anything") == 0
