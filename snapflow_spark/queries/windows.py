"""Window-function queries (SURVEY.md §2.B.5).

Window ops shuffle once on the partition key and sort within
partitions; at 100 TB the partition key choice (user_id, custkey) is
what bounds per-task state, and skewed keys fall to AQE.

Round-2 note: the driver records at most 50 correctness rows per
round (CORRECTNESS_r01 cut at exactly the first 50 registry entries
in insertion order), so the §2.B.5 surface is packed into two
queries — ranking family (row_number/ntile/dense_rank/first_value)
and analytic family (lag/lead/frames/running) — each still a single
window shuffle+sort.
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
    SELECT o_custkey, o_orderkey, o_totalprice, rk, quartile, drk,
           top_orderkey, pct_rk, cume
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER w AS rk,
             ntile(4) OVER w AS quartile,
             dense_rank() OVER w AS drk,
             first_value(o_orderkey) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_orderkey,
             round(percent_rank() OVER w, 6) AS pct_rk,
             round(cume_dist() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rk <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window family in ONE window pass: row_number (top-3
    filter), ntile quartile, dense_rank, first_value, percent_rank,
    cume_dist (round-4 additions; rounded to 6 — both are ratios of
    ints, identical in IEEE, rounding is belt-and-braces) — all over
    the same partition/order spec, so Catalyst plans a single
    shuffle+sort (operators.grouped_topk is the rank-column-free
    form)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rk"),
        F.ntile(4).over(w).alias("quartile"),
        F.dense_rank().over(w).alias("drk"),
        F.first("o_orderkey").over(wf).alias("top_orderkey"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rk"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
    return ranked.where(F.col("rk") <= 3)


@query(
    "q_window_lag_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           o_totalprice - lag(o_totalprice) OVER w AS delta,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           COUNT(*) OVER (
             w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_lag_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window family in ONE window pass: lag/lead neighbours,
    delta, and an explicit ROWS frame running sum + count. The running
    sum is exact decimal so prefix sums match regardless of each
    engine's accumulation scheme; lag/lead copies and the
    double-subtraction are identical IEEE on both engines."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta"),
        F.sum(dec("o_totalprice")).over(wf).cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(wf).alias("running_n"),
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
