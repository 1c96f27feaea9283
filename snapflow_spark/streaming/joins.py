"""Stream-stream joins (SURVEY.md §2.B.10).

Joining two live streams is the one relational op whose STATE is the
whole problem: a row on either side must wait for future matches from
the other, so without a bound the join state grows forever. Spark's
answer — and the only shape that survives 100 TB/day streams — is the
watermarked interval join: both sides declare event-time watermarks and
the join condition constrains the two timestamps to a bounded interval,
which lets the state store evict every buffered row once the watermark
passes its interval. These builders encode that contract so callers
can't accidentally write the unbounded form.

The same expressions run identically on batch DataFrames (the interval
condition is just a theta-join there), which is what lets the bounded
streaming run be compared against a batch oracle in tests.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    watermark: str,
    lower: str = "0 seconds",
    upper: str = "0 seconds",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Watermarked stream-stream interval join:

        l.k == r.k  AND  r.ts BETWEEN l.ts - lower AND l.ts + upper

    Both sides get ``watermark`` on their event-time column; the
    interval bound is what lets Spark evict join state (a left row is
    droppable once the watermark passes ``l.ts + upper``, a right row
    once it passes ``r.ts + lower``). ``how`` may be inner / left /
    right / full — outer results for unmatched rows are emitted only
    after the watermark closes their interval, so on a bounded
    (availableNow) run trailing unmatched rows may be withheld: the
    watermark never advances past the final micro-batch. That is
    correct streaming semantics, not data loss — they emit on the next
    trigger in a live run.

    Right-side columns are renamed with ``right_prefix`` (join keys
    keep one copy from the left) so the result schema is unambiguous
    even when both streams share column names — the common case when
    joining two feeds of the same event type.

    Scale shape: one shuffle per side on the join keys; state per key
    is bounded by (lower + upper + watermark) of stream rate. Skewed
    keys skew state too — salt the key upstream if one entity
    dominates.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)

    # Prefix EVERY right column before the join so the output schema is
    # unambiguous even when both streams share names (the common case:
    # two feeds of the same event type). The rename is a projection
    # inside the streaming plan — no post-join disambiguation needed.
    rw = rw.select(*[F.col(c).alias(f"{right_prefix}{c}") for c in rw.columns])
    r_ts = f"{right_prefix}{right_ts}"

    cond: Column = reduce(
        lambda a, b: a & b,
        [lw[k].eqNullSafe(rw[f"{right_prefix}{k}"]) for k in on],
    )
    cond = (
        cond
        & (rw[r_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lower}"))
        & (rw[r_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    joined = lw.join(rw, cond, how)
    if how == "inner":
        # the prefixed key copies always equal the left keys — drop them
        joined = joined.drop(*[f"{right_prefix}{k}" for k in on])
    # outer joins keep both copies: the left key is NULL for unmatched
    # right rows, so the prefixed copy is the only place the value lives
    return joined


def enrich_latest(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str],
    fact_ts: str,
    dim_ts: str,
    watermark: str,
    max_age: str,
    right_prefix: str = "dim_",
) -> DataFrame:
    """Stream-side dimension enrichment: each fact joins dimension rows
    published within ``max_age`` BEFORE the fact (the streaming
    analogue of an as-of join, with the as-of horizon made explicit so
    state stays bounded). A fact may match several dim versions inside
    the horizon — follow with a keep-latest dedupe keyed on the fact id
    if exactly-one enrichment is required."""
    return interval_join(
        facts,
        dim,
        on=on,
        left_ts=fact_ts,
        right_ts=dim_ts,
        watermark=watermark,
        lower=max_age,
        upper="0 seconds",
        how="inner",
        right_prefix=right_prefix,
    )
