"""Window-function queries (SURVEY.md §2.B.5).

Window ops shuffle once on the partition key and sort within
partitions; at 100 TB the partition key choice (user_id, custkey) is
what bounds per-task state, and skewed keys fall to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snapflow_spark.catalog import load_table
from snapflow_spark.compat import dec, ts_millis, ts_millis_sql
from snapflow_spark.operators import dedupe_keep_latest
from snapflow_spark.registry import query


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) WHERE rk <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-3 orders: row_number window with a
    deterministic tie-break on orderkey (operators.grouped_topk is the
    rank-column-free form of the same plan)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    ranked = o.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3)
    return ranked.select("o_custkey", "o_orderkey", "o_totalprice", "rk")


@query(
    "q_window_lag",
    oracle=f"""
    SELECT event_id, user_id, {ts_millis_sql('ts', 'ts_ms')}, value,
           value - lag(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytic: per-user event value delta over time. The
    subtraction of two untouched doubles is identical IEEE on both
    engines — no rounding needed."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        ts_millis("ts", "ts_ms"),
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total over an explicit ROWS frame. The sum runs in
    exact decimal so the prefix sums match regardless of each engine's
    accumulation scheme."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "q_dedupe_keep_latest",
    oracle=f"""
    SELECT user_id, event_type, event_id, {ts_millis_sql('ts', 'ts_ms')}, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def q_dedupe_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapflow's signature dedupe_keep_latest (SURVEY §2.A A4) via
    operators.dedupe_keep_latest: append-log -> current state."""
    e = load_table(spark, sf_dir, "events")
    latest = dedupe_keep_latest(
        e,
        keys=["user_id", "event_type"],
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
    )
    return latest.select(
        "user_id", "event_type", "event_id", ts_millis("ts", "ts_ms"), "value"
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           ntile(4) OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
           dense_rank() OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey) AS drk,
           first_value(o_orderkey) OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_orderkey
    FROM orders
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / dense_rank / first_value in one window pass (explicit
    ROWS frame on first_value for cross-engine determinism)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.dense_rank().over(w).alias("drk"),
        F.first("o_orderkey").over(wf).alias("top_orderkey"),
    )
