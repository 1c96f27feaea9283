"""Stream ``merge`` (SURVEY.md §2.A A8) — interleave upstream streams.

Snapflow's stream op merges multiple DataBlock streams into one input
[P snapflow/core/streams.py]. On Spark this is a zero-shuffle
``unionByName``: unions are purely logical (partitions concatenate),
so merging N inputs costs nothing until an action runs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def merge_streams(*dfs: DataFrame, allow_missing_columns: bool = True) -> DataFrame:
    if not dfs:
        raise ValueError("merge_streams needs at least one input")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing_columns), dfs
    )


# accumulate (SURVEY §2.A A3) over in-memory deltas is the same union;
# the persistent form lives in snapflow_spark.incremental.
accumulate = merge_streams
