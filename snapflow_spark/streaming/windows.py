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


def tumbling_agg(
    df: DataFrame, ts: str, duration: str, aggs: list[Column], keys: list[str] | None = None
) -> DataFrame:
    grouped = df.groupBy(F.window(ts, duration).alias("w"), *(keys or []))
    return grouped.agg(*aggs).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(keys or []),
        *[c for c in _agg_names(aggs)],
    )


def sliding_agg(
    df: DataFrame,
    ts: str,
    duration: str,
    slide: str,
    aggs: list[Column],
    keys: list[str] | None = None,
) -> DataFrame:
    grouped = df.groupBy(F.window(ts, duration, slide).alias("w"), *(keys or []))
    return grouped.agg(*aggs).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(keys or []),
        *[c for c in _agg_names(aggs)],
    )


def session_agg(
    df: DataFrame, ts: str, gap: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """Session windows: events within ``gap`` of the previous event
    merge; the window closes ``gap`` after the last event."""
    grouped = df.groupBy(F.session_window(ts, gap).alias("w"), *keys)
    return grouped.agg(*aggs).select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *keys,
        *[c for c in _agg_names(aggs)],
    )


def _agg_names(aggs: list[Column]) -> list[str]:
    # Column metadata keeps the alias; re-reference by name post-agg.
    names = []
    for c in aggs:
        name = c._jc.toString().split(" AS ")[-1].strip("`")
        names.append(name)
    return names
