"""Aggregation queries (SURVEY.md §2.B.4).

Snapflow delegates aggregation to the user's database inside SQL snaps
[P snapflow/core/sql/sql_function.py]; here the engine exposes it
natively as Catalyst hash aggregates with map-side partial aggregation
— at 100 TB each groupBy shuffles one partial row per (group,
partition), not the raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.catalog import load_table
from snapflow_spark.compat import (
    MONEY,
    dec,
    exact_avg,
    exact_avg_sql,
    exact_sum,
    exact_sum_sql,
)
from snapflow_spark.registry import query

_Q1_CUTOFF = "1998-09-02"


@query(
    "q_agg_basic",
    oracle=f"""
    SELECT
      l_returnflag, l_linestatus,
      {exact_sum_sql('l_quantity', 'sum_qty')},
      {exact_sum_sql('l_extendedprice', 'sum_base_price')},
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      {exact_avg_sql('l_quantity', 'avg_qty')},
      {exact_avg_sql('l_extendedprice', 'avg_price')},
      {exact_avg_sql('l_discount', 'avg_disc')},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: multi-measure hash aggregate.

    Exact-decimal sums (compat.py) make the result order-independent, so
    it hash-matches the oracle no matter how AQE repartitions.
    """
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= F.lit(f"{_Q1_CUTOFF} 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", "sum_qty"),
            exact_sum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            exact_avg("l_quantity", "avg_qty"),
            exact_avg("l_extendedprice", "avg_price"),
            exact_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
