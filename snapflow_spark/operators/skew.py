"""Skew mitigation for shuffle joins (SURVEY.md §4; the 100 TB
"skewed keys hurt" story).

First choice is AQE's runtime skew-join splitting
(spark.sql.adaptive.skewJoin.enabled, on via session.tune) — it splits
oversized sort-merge partitions with no code change. Salting is the
manual fallback for the cases AQE does not cover: aggregations with a
hot key, and joins where the skewed side must stay on one side of a
broadcast boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: each skewed row gets a
    random salt in [0, salt_buckets); ``other`` is replicated across
    all salts; the join key becomes (keys..., salt), spreading each hot
    key over salt_buckets reducers. Replication multiplies the other
    side by salt_buckets — use when it is small-ish but above the
    broadcast threshold. Supports inner/left (semantics preserved
    because every skewed row carries exactly one salt)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = skewed.withColumn(
        "__salt", F.floor(F.rand(seed) * salt_buckets).cast("int")
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted.join(replicated, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_count_by_key(
    df: DataFrame, keys: list[str], salt_buckets: int = 16, seed: int = 42
) -> DataFrame:
    """Two-phase aggregation for hot-key counts: partial count on
    (keys, salt), then final sum on keys. Spark's hash aggregate
    already does map-side partial combine, so this matters mainly when
    a single key overflows ONE reducer's partial map — the classic
    power-law token/user histogram at corpus scale."""
    salted = df.withColumn("__salt", F.floor(F.rand(seed) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("n"))
