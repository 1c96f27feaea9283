"""Data-quality expectations (training-pipeline gate; snapflow's
schema validators generalized [P kvh/common-model field validators]).

All declared checks evaluate in ONE aggregate pass over the data
(conditional sums) — a 100 TB quality gate costs one scan regardless
of how many expectations it carries. Row-level quarantine splits
pass/fail rows with the same single predicate, no second scan of the
source.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: Column  # True = row passes


def not_null(col: str) -> Expectation:
    return Expectation(f"{col}_not_null", F.col(col).isNotNull())


def unique_key_check(df: DataFrame, keys: list[str]) -> int:
    """Number of duplicated key tuples (0 = unique). Separate from the
    row-level pass because uniqueness is a grouped property."""
    dups = df.groupBy(*keys).count().where(F.col("count") > 1)
    return dups.count()


def in_range(col: str, lo=None, hi=None) -> Expectation:
    c = F.col(col)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (c >= lo)
    if hi is not None:
        pred = pred & (c <= hi)
    return Expectation(f"{col}_in_range", pred | c.isNull())


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"{col}_matches", F.col(col).rlike(pattern) | F.col(col).isNull()
    )


def one_of(col: str, allowed: list) -> Expectation:
    return Expectation(
        f"{col}_one_of", F.col(col).isin(allowed) | F.col(col).isNull()
    )


def _null_safe(e: Expectation) -> Column:
    """A predicate evaluating to NULL (e.g. a custom Expectation with
    no isNull guard) counts as FAILURE — otherwise where(~p) and
    where(p) would both exclude the row, making it vanish from the
    quarantine split while check_expectations counted it as a pass."""
    return F.coalesce(e.predicate, F.lit(False))


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> dict:
    """One aggregate pass: {'rows': N, '<name>_failures': k, ...}."""
    aggs = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.when(~_null_safe(e), 1).otherwise(0)).alias(f"{e.name}_failures")
        for e in expectations
    ]
    row = df.agg(*aggs).first()
    return row.asDict()


def quarantine(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(passed, failed) split on the conjunction of all expectations;
    every input row lands in exactly one side (NULL predicate = fail).
    ``failed`` carries a ``failed_checks`` array naming what broke."""
    all_pass = F.lit(True)
    for e in expectations:
        all_pass = all_pass & _null_safe(e)
    failed_names = F.array_compact(
        F.array(
            *[F.when(~_null_safe(e), F.lit(e.name)) for e in expectations]
        )
    )
    passed = df.where(all_pass)
    failed = df.where(~all_pass).withColumn("failed_checks", failed_names)
    return passed, failed


def observe_expectations(
    df: DataFrame, expectations: list[Expectation], name: str = "quality"
):
    """Attach the expectation counters to the DataFrame itself via
    ``df.observe`` — the ZERO-extra-scan form of check_expectations:
    metrics accumulate during whatever action the pipeline runs anyway
    (the snapshot write, the sink), so at 100 TB the quality gate adds
    no second pass at all. Returns ``(df, observation)``; read
    ``observation.get`` AFTER the first action on ``df``.

    check_expectations stays for the standalone-audit case; this is
    what a production write path uses."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.when(~_null_safe(e), 1).otherwise(0)).alias(f"{e.name}_failures")
        for e in expectations
    ]
    return df.observe(obs, *metrics), obs
