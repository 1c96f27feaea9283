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
