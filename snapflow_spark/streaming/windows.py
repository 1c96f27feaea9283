"""Time-window aggregation builders (SURVEY.md §2.B.10).

Each builder takes EITHER a batch DataFrame or a streaming DataFrame —
`window`/`session_window` are the same Catalyst expressions in both
modes, which is exactly why the batch DuckDB oracle validates the
streaming semantics. At scale, tumbling/sliding aggs shuffle once on
(window, keys); session windows shuffle on the user key and merge
per-key sorted runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _windowed(
    df: DataFrame,
    window_col: Column,
    keys: list[str] | None,
    aggs: list[Column],
    start_name: str,
    end_name: str,
) -> DataFrame:
    """groupBy(window, keys).agg(aggs) with the window struct split
    into named start/end columns. Agg output names are recovered
    STRUCTURALLY from the aggregated frame's schema (everything after
    the grouping columns) — no Column._jc string parsing, which breaks
    under Spark Connect and yields unselectable names for unaliased
    aggregates."""
    keys = keys or []
    grouped = df.groupBy(window_col.alias("w"), *keys).agg(*aggs)
    agg_names = grouped.columns[1 + len(keys):]
    return grouped.select(
        F.col("w.start").alias(start_name),
        F.col("w.end").alias(end_name),
        *keys,
        *agg_names,
    )


def tumbling_agg(
    df: DataFrame, ts: str, duration: str, aggs: list[Column], keys: list[str] | None = None
) -> DataFrame:
    return _windowed(
        df, F.window(ts, duration), keys, aggs, "window_start", "window_end"
    )


def sliding_agg(
    df: DataFrame,
    ts: str,
    duration: str,
    slide: str,
    aggs: list[Column],
    keys: list[str] | None = None,
) -> DataFrame:
    return _windowed(
        df, F.window(ts, duration, slide), keys, aggs, "window_start", "window_end"
    )


def session_agg(
    df: DataFrame, ts: str, gap: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """Session windows: events within ``gap`` of the previous event
    merge; the window closes ``gap`` after the last event."""
    return _windowed(
        df, F.session_window(ts, gap), keys, aggs, "session_start", "session_end"
    )
