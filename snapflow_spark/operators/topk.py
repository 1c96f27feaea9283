"""Top-k operators (SURVEY.md §2.B.6).

Global top-k uses ``orderBy().limit(k)`` which Spark plans as
TakeOrderedAndProject: each partition keeps only its local k rows and
the driver merges N×k — no global sort, the only top-k that works at
100 TB. Per-group top-k is a window rank over one shuffle on the keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__topk_rn"


def _cols(order_by: list[Column | str]) -> list[Column]:
    return [F.col(c).desc() if isinstance(c, str) else c for c in order_by]


def topk(df: DataFrame, order_by: list[Column | str], k: int) -> DataFrame:
    """Global top-k; pass explicit tie-break columns for determinism."""
    return df.orderBy(*_cols(order_by)).limit(k)


def grouped_topk(
    df: DataFrame, keys: list[str], order_by: list[Column | str], k: int
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*_cols(order_by))
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) <= k)
        .drop(_RN)
    )
