"""Vector functions over ArrayType(Float) embedding columns
(SURVEY.md §2.B.11).

Everything here is higher-order Column algebra (zip_with/aggregate) —
JVM-side, no UDF, so a 100 TB embedding scan never crosses into
python. Math runs in DOUBLE with strict left-to-right accumulation,
which both Spark and DuckDB honor, making exact cosine oracle-hashable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_vs_normed(a: str | Column, b: str | Column, b_norm: str | Column) -> Column:
    """``cosine_similarity(a, b)`` with ``b``'s norm precomputed —
    float-identical (same folds, same multiply order), used to hoist a
    broadcast probe's norm out of per-corpus-row evaluation (round 17:
    the probe-side norm fold otherwise re-runs on every scored row)."""
    return dot(a, b) / (l2_norm(a) * _c(b_norm))
