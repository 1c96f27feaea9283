"""As-of join (SURVEY.md §2.B.3) — event enrichment with the most
recent right-side row at or before each left timestamp.

Snapflow users did this with pandas ``merge_asof`` inside python snaps
[P SURVEY §2.B.3]; a pandas-per-group port would shuffle every key to a
python worker. Instead this is the classic *union + running last*
plan: one shuffle on the join keys, sort within partitions, a single
window pass — all JVM-side whole-stage codegen, no UDF. At 100 TB the
cost is exactly one exchange of (left ∪ right), which is optimal for a
backward as-of merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_ORDER = "__asof_order"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str | None = None,
    payload: dict[str, str] | None = None,
    right_order: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of
    the latest right row with ``right.ts <= left.ts`` and equal keys.

    payload maps right column -> output column name. ``right_order``
    breaks ties among right rows sharing (keys, ts): the greatest wins.
    """
    right_ts = right_ts or left_ts
    if payload is None:
        payload = {
            c: c for c in right.columns if c not in set(keys) | {right_ts}
        }
    out_cols = list(payload.values())

    # ALL payload columns travel in ONE struct: the struct is non-null
    # for every right row, so a single last(ignorenulls=True) carries
    # the whole payload of the most recent matching right row — even
    # when some of its fields are legitimately NULL. (Filling each
    # column independently would skip NULL fields and mix values from
    # different right rows — diverging from merge_asof/ASOF JOIN.)
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(left_ts),
        F.struct(*[F.col(src).alias(dst) for src, dst in payload.items()]).alias(
            _PAYLOAD
        ),
        F.lit(0).alias(_SIDE),
        (F.col(right_order) if right_order else F.lit(0)).alias(_ORDER),
    )
    l = left.withColumn(_SIDE, F.lit(1)).withColumn(_ORDER, F.lit(None).cast("long"))
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts so exact-ts matches
    # are visible; among right ties the last (max _ORDER) wins.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(left_ts).asc(), F.col(_SIDE).asc(), F.col(_ORDER).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last(F.col(_PAYLOAD), ignorenulls=True).over(w).alias("__filled")
    )
    result = filled.where(F.col(_SIDE) == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__filled.{dst}").alias(dst) for dst in out_cols],
    )
    return result
