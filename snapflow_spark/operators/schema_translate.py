"""Schema translation (SURVEY.md §2.A A9) — conform a block to a target
Schema via field mapping + casts.

Snapflow's ``implementations`` mapping [P snapflow/core/typing/casting.py]
becomes a pure ``select(alias/cast)`` projection: zero shuffle, folded
into whatever scan or stage precedes it by Catalyst, and column pruning
drops unmapped source columns at the reader.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def schema_translate(
    df: DataFrame,
    mapping: dict[str, str | Column],
    casts: dict[str, str] | None = None,
) -> DataFrame:
    """mapping: target column name -> source column (name or Column);
    casts: target column name -> Spark type DDL string."""
    cols = []
    for target, source in mapping.items():
        c = F.col(source) if isinstance(source, str) else source
        if casts and target in casts:
            c = c.cast(casts[target])
        cols.append(c.alias(target))
    return df.select(*cols)
