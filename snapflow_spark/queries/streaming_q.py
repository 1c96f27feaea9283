"""Time-window queries (SURVEY.md §2.B.10) — batch-mode runs of the
same window()/session_window() expressions Structured Streaming uses,
so the DuckDB oracle hash-validates the streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.catalog import load_table
from snapflow_spark.compat import exact_sum, exact_sum_sql
from snapflow_spark.registry import query
from snapflow_spark.streaming import session_agg, sliding_agg, tumbling_agg


def _win_ms(field: str, alias: str):
    return (F.col(field).cast("double") * 1000).cast("bigint").alias(alias)


@query(
    "q_stream_windows",
    oracle=f"""
    SELECT 'tumbling' AS mode,
           CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS ws_ms,
           COUNT(*) AS n_events,
           {exact_sum_sql('value', 'sum_value')}
    FROM events GROUP BY 1, 2
    UNION ALL
    SELECT 'sliding' AS mode, ws_ms, n_events, sum_value FROM (
      WITH buckets AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS ws, value FROM events
      )
      SELECT CAST(epoch_ms(ws) AS BIGINT) AS ws_ms,
             COUNT(*) AS n_events,
             {exact_sum_sql('value', 'sum_value')}
      FROM buckets GROUP BY 1)
    """,
)
def q_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows AND sliding 1-hour/30-minute windows
    (batch runs of the same window() expressions Structured Streaming
    uses), tagged and unioned. Spark's window() start aligns to the
    epoch hour = DuckDB's date_trunc('hour'); for the sliding branch
    every event lands in exactly two windows and the oracle replays
    that expansion with time_bucket arithmetic."""
    e = load_table(spark, sf_dir, "events")
    tumbling = tumbling_agg(
        e,
        ts="ts",
        duration="1 hour",
        aggs=[F.count(F.lit(1)).alias("n_events"), exact_sum("value", "sum_value")],
    ).select(
        F.lit("tumbling").alias("mode"),
        _win_ms("window_start", "ws_ms"),
        "n_events",
        "sum_value",
    )
    sliding = sliding_agg(
        e,
        ts="ts",
        duration="1 hour",
        slide="30 minutes",
        aggs=[F.count(F.lit(1)).alias("n_events"), exact_sum("value", "sum_value")],
    ).select(
        F.lit("sliding").alias("mode"),
        _win_ms("window_start", "ws_ms"),
        "n_events",
        "sum_value",
    )
    return tumbling.unionByName(sliding)


@query(
    "q_stream_session",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       < INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(epoch_ms(MIN(ts)) AS BIGINT) AS ss_ms,
           CAST(epoch_ms(MAX(ts) + INTERVAL '30 minutes') AS BIGINT) AS se_ms,
           COUNT(*) AS n_events,
           {exact_sum_sql('value', 'sum_value')}
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization (30-minute gap) via session_window; the
    oracle is the classic gaps-and-islands rewrite. Session end =
    last event + gap, exclusive — a row landing exactly at the
    boundary starts a new session in both formulations."""
    e = load_table(spark, sf_dir, "events")
    out = session_agg(
        e,
        ts="ts",
        gap="30 minutes",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_events"), exact_sum("value", "sum_value")],
    )
    return out.select(
        "user_id",
        _win_ms("session_start", "ss_ms"),
        _win_ms("session_end", "se_ms"),
        "n_events",
        "sum_value",
    )
