"""As-of join (SURVEY.md §2.B.3) — event enrichment with the nearest
right-side row at/before (backward), at/after (forward), or closest
to (nearest) each left timestamp, with an optional match tolerance —
full parity with the pandas ``merge_asof`` surface snapflow users
ran inside python snaps [P SURVEY §2.B.3].

A pandas-per-group port would shuffle every key to a python worker.
Instead this is the classic *union + running last* plan: one shuffle
on the join keys, sort within partitions, a single window pass — all
JVM-side whole-stage codegen, no UDF. At 100 TB the cost is exactly
one exchange of (left ∪ right), which is optimal for a backward or
forward as-of merge; ``nearest`` adds a second sort (two window
orders) over the SAME exchange, never a second shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_ORDER = "__asof_order"
_PAYLOAD = "__asof_payload"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str | None = None,
    payload: dict[str, str] | None = None,
    right_order: str | None = None,
    direction: str = "backward",
    tolerance: str | float | None = None,
) -> DataFrame:
    """As-of join in a chosen ``direction``:

    - ``backward`` (default): latest right row with ``ts <= left.ts``
    - ``forward``: earliest right row with ``ts >= left.ts``
    - ``nearest``: whichever of the two is closer (ties -> backward,
      the merge_asof rule)

    ``payload`` maps right column -> output column name.
    ``right_order`` breaks ties among right rows sharing (keys, ts):
    the greatest wins. ``tolerance`` voids matches farther than the
    given gap: an INTERVAL string for timestamp columns
    ("30 minutes") or a number for numeric ts columns — matching
    merge_asof's Timedelta/number semantics. NULL left timestamps
    never match (as in pandas)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest: {direction!r}")
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
    # The matched timestamp rides inside as _TS for tolerance/nearest.
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(left_ts),
        F.struct(
            F.col(right_ts).alias(_TS),
            *[F.col(src).alias(dst) for src, dst in payload.items()],
        ).alias(_PAYLOAD),
        F.lit(0).alias(_SIDE),
        (F.col(right_order) if right_order else F.lit(0)).alias(_ORDER),
    )
    l = left.withColumn(_SIDE, F.lit(1)).withColumn(_ORDER, F.lit(None).cast("long"))
    unioned = l.unionByName(r, allowMissingColumns=True)

    def running_fill(descending: bool) -> Column:
        # Right rows sort before left rows at equal ts (either scan
        # direction) so exact-ts matches are visible; among right
        # ties the greatest _ORDER wins in both directions.
        ts = F.col(left_ts).desc() if descending else F.col(left_ts).asc()
        w = (
            Window.partitionBy(*keys)
            .orderBy(ts, F.col(_SIDE).asc(), F.col(_ORDER).asc_nulls_last())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(F.col(_PAYLOAD), ignorenulls=True).over(w)

    def within_tolerance(p: Column) -> Column:
        if tolerance is None:
            return p
        gap = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        dist_ok = (
            (p[_TS] >= F.col(left_ts) - gap)
            & (p[_TS] <= F.col(left_ts) + gap)
        )
        return F.when(dist_ok, p)

    if direction == "backward":
        chosen = within_tolerance(running_fill(False))
        filled = unioned.select("*", chosen.alias("__filled"))
    elif direction == "forward":
        chosen = within_tolerance(running_fill(True))
        filled = unioned.select("*", chosen.alias("__filled"))
    else:  # nearest: both fills over the SAME exchange, pick closer
        back = within_tolerance(running_fill(False))
        fwd = within_tolerance(running_fill(True))
        filled = unioned.select("*", back.alias("__b"), fwd.alias("__f"))
        lts = F.col(left_ts)
        pick_b = F.col("__f").isNull() | (
            F.col("__b").isNotNull()
            # tie -> backward (<=), matching merge_asof
            & ((lts - F.col("__b")[_TS]) <= (F.col("__f")[_TS] - lts))
        )
        filled = filled.withColumn(
            "__filled", F.when(pick_b, F.col("__b")).otherwise(F.col("__f"))
        )
    return filled.where(F.col(_SIDE) == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__filled.{dst}").alias(dst) for dst in out_cols],
    )
