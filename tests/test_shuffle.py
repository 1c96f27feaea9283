"""deterministic_shuffle (operators/curation.py): reproducible global
training order — total-order stability across input partitionings,
salt independence, globally ordered range partitions, row
preservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from snapflow_spark.operators.curation import deterministic_shuffle


def _df(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    )


def order_of(df):
    return [r.doc_id for r in df.toLocalIterator()]


def test_total_order_stable_across_input_partitioning(spark):
    a = order_of(deterministic_shuffle(_df(spark).coalesce(1)))
    b = order_of(deterministic_shuffle(_df(spark).repartition(7)))
    assert a == b
    assert sorted(a) == list(range(200))  # nothing lost, nothing added
    assert a != list(range(200))  # actually shuffled


def test_salt_yields_independent_order(spark):
    a = order_of(deterministic_shuffle(_df(spark), salt="epoch-0"))
    b = order_of(deterministic_shuffle(_df(spark), salt="epoch-1"))
    assert sorted(a) == sorted(b)
    assert a != b


def test_partitions_are_globally_range_ordered(spark):
    out = deterministic_shuffle(
        _df(spark, 500), num_partitions=8, key_col="k"
    ).withColumn("pid", F.spark_partition_id())
    ranges = {
        r.pid: (r.lo, r.hi)
        for r in out.groupBy("pid")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    }
    pids = sorted(ranges)
    assert len(pids) > 1
    for p, q in zip(pids, pids[1:]):
        assert ranges[p][1] <= ranges[q][0]  # partition p precedes q


def test_key_col_kept_or_dropped(spark):
    base = _df(spark, 20)
    assert deterministic_shuffle(base).columns == base.columns
    kept = deterministic_shuffle(base, key_col="shuffle_key")
    assert "shuffle_key" in kept.columns
