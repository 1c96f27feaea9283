"""Cross-engine numeric determinism helpers (SURVEY.md §5.3).

The driver hashes Spark results against a DuckDB oracle value-by-value.
Floating-point SUMs are order-dependent, so a double sum computed over
32 shuffled Spark partitions will not bit-match DuckDB's sequential sum.
The fix is exact arithmetic: route money-like doubles through DECIMAL
(exact in both engines regardless of order), then cast the final result
back to DOUBLE — the decimal->double rounding is IEEE round-nearest in
both engines, so results match bit-for-bit.

Each helper has a Spark (Column) and a SQL (string) form that MUST stay
in sync; every declared query uses these pairs on both sides.

At 100 TB this costs one widened column per aggregate — decimal sums
still run inside whole-stage codegen with map-side partial aggregation,
so the shuffle volume is one 16-byte value per group per partition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"  # fixture money columns carry exactly 2 decimals


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def exact_sum(col: str | Column, alias: str, typ: str = MONEY) -> Column:
    """Order-independent SUM of a money-like double, returned as double."""
    return F.sum(dec(col, typ)).cast("double").alias(alias)


def exact_sum_sql(expr: str, alias: str, typ: str = "DECIMAL(18,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) AS {alias}"


def exact_avg(col: str | Column, alias: str, typ: str = MONEY) -> Column:
    """AVG as exact-decimal SUM / COUNT — identical IEEE division both sides."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, typ)).cast("double") / F.count(c)).alias(alias)


def exact_avg_sql(expr: str, alias: str, typ: str = "DECIMAL(18,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) / COUNT({expr}) AS {alias}"


def revenue_col() -> Column:
    """l_extendedprice*(1-l_discount) in exact decimal (scale 4)."""
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount"))


REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))"


def exact_revenue_sum(alias: str) -> Column:
    return F.sum(revenue_col()).cast("double").alias(alias)


def exact_revenue_sum_sql(alias: str) -> str:
    return f"CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS {alias}"


def ts_millis(col: str | Column, alias: str) -> Column:
    """Timestamp -> epoch milliseconds (bigint) — avoids ns/µs and
    string-formatting mismatches between engines entirely."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("double") * 1000).cast("bigint").alias(alias)


def ts_millis_sql(expr: str, alias: str) -> str:
    return f"CAST(epoch_ms({expr}) AS BIGINT) AS {alias}"
