"""dedupe_keep_latest (SURVEY.md §2.A A4) — one row per key, latest by
an ordering column; turns an append log into current state.

Snapflow ships this as a SQL snap [P snapflow/modules/core/functions/
dedupe_keep_latest]. Spark plan: a single window rank over a shuffle on
the keys — with AQE skew handling, the canonical scalable dedupe.
Always pass a total order (tie-break columns) for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__dedupe_rn"


def dedupe_keep_latest(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column | str],
) -> DataFrame:
    """Keep the first row per key under ``order_by`` (pass descending
    columns, e.g. ``[F.col("updated_at").desc(), F.col("id").desc()]``,
    for keep-LATEST semantics)."""
    cols = [F.col(c).desc() if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_RN)
    )
