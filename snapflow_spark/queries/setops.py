"""Set operations + top-k queries (SURVEY.md §2.B.6–2.B.7).

UNION ALL is snapflow's stream ``merge`` (§2.A A8) — zero-shuffle in
Spark. The distinct set ops shuffle once on the full row, which is the
only correct plan; keys are projected first so the shuffle carries the
minimum width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.catalog import load_table
from snapflow_spark.compat import exact_revenue_sum, exact_revenue_sum_sql
from snapflow_spark.operators import merge_streams, topk
from snapflow_spark.registry import query

_HIGH = "o_totalprice > 400000"
_RECENT = "o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'"


def _high(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select("o_custkey")
    )


def _recent(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1998-06-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )


@query(
    "q_union",
    oracle=f"""
    SELECT 'all' AS mode, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE {_HIGH}
      UNION ALL
      SELECT o_custkey FROM orders WHERE {_RECENT})
    UNION ALL
    SELECT 'distinct' AS mode, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE {_HIGH}
      UNION
      SELECT o_custkey FROM orders WHERE {_RECENT})
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream merge (UNION ALL, duplicates preserved — snapflow's A8
    merge, a zero-shuffle logical concat via operators.merge_streams)
    and UNION DISTINCT (merge + one hash-distinct shuffle on the key)
    as two tagged branches of one result."""
    both = merge_streams(_high(spark, sf_dir), _recent(spark, sf_dir))
    dedup = merge_streams(_high(spark, sf_dir), _recent(spark, sf_dir)).distinct()
    return both.select(F.lit("all").alias("mode"), "o_custkey").unionByName(
        dedup.select(F.lit("distinct").alias("mode"), "o_custkey")
    )


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both a finished and an open order."""
    o = load_table(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@query(
    "q_except",
    oracle=f"""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE {_HIGH}
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): ordering customers who never placed a 400k+
    order."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_custkey").subtract(_high(spark, sf_dir))


@query(
    "q_topk",
    oracle=f"""
    SELECT l_partkey, {exact_revenue_sum_sql('revenue')}, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY revenue DESC, l_partkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 revenue parts via operators.topk —
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(exact_revenue_sum("revenue"), F.count(F.lit(1)).alias("n_items"))
    )
    return topk(agg, [F.col("revenue").desc(), F.col("l_partkey").asc()], 10)
