"""Banded range join (SURVEY.md §2.B.3 theta/range; SCALE.md gap
closure).

A range join ``point BETWEEN lo AND hi`` has no equi-key, so Spark
falls back to broadcast-nested-loop — fine only while one side fits a
broadcast. The banded rewrite makes it an equi-join at any size:

    band(point)   = floor(point / w)
    bands(lo, hi) = floor(lo / w) .. floor(hi / w)   (interval side
                                                      explodes to one
                                                      row per band)
    equi-join on band, then the exact range predicate.

One shuffle on the band key, sort-merge/hash under AQE; the interval
side's fanout is (hi-lo)/w + 1, so pick ``band_width`` near the
typical interval width (fanout ~2). This is the same
bucketize-then-verify shape as the LSH dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point: Column,
    lo: Column,
    hi: Column,
    band_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join every ``points`` row to the ``intervals`` rows whose
    [lo, hi] contains ``point``. ``point`` must reference only
    ``points`` columns; ``lo``/``hi`` only ``intervals`` columns.
    NULL point or bounds never match (BETWEEN semantics).

    Inner only: the exact range predicate is applied AFTER the band
    equi-join, which would silently drop the null-extended rows of an
    outer join (turning it back into an inner join). Compose outer
    semantics explicitly on top (e.g. left-join the inner result back
    to ``points``)."""
    if how != "inner":
        raise ValueError(
            "banded_range_join supports how='inner' only; the post-join "
            "range filter would drop outer-join null-extended rows"
        )
    w = float(band_width)
    pts = points.withColumn("__band", F.floor(point / w).cast("long"))
    ivs = intervals.withColumn(
        "__band",
        F.explode(F.sequence(F.floor(lo / w).cast("long"), F.floor(hi / w).cast("long"))),
    )
    joined = pts.join(ivs, ["__band"], how).where(point.between(lo, hi))
    return joined.drop("__band")
