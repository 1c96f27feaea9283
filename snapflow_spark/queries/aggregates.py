"""Aggregation queries (SURVEY.md §2.B.4).

Snapflow delegates aggregation to the user's database inside SQL snaps
[P snapflow/core/sql/sql_function.py]; here the engine exposes it
natively as Catalyst hash aggregates with map-side partial aggregation
— at 100 TB each groupBy shuffles one partial row per (group,
partition), not the raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.catalog import load_table
from snapflow_spark.compat import (
    dec,
    exact_avg,
    exact_avg_sql,
    exact_sum,
    exact_sum_sql,
)
from snapflow_spark.registry import query

from snapflow_spark.operators import sql_snap

_Q1_CUTOFF = "1998-09-02"


@query(
    "q_agg_basic",
    oracle=f"""
    SELECT
      l_returnflag, l_linestatus,
      {exact_sum_sql('l_quantity', 'sum_qty')},
      {exact_sum_sql('l_extendedprice', 'sum_base_price')},
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      {exact_avg_sql('l_quantity', 'avg_qty')},
      {exact_avg_sql('l_extendedprice', 'avg_price')},
      {exact_avg_sql('l_discount', 'avg_disc')},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: multi-measure hash aggregate.

    Exact-decimal sums (compat.py) make the result order-independent, so
    it hash-matches the oracle no matter how AQE repartitions.
    """
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= F.lit(f"{_Q1_CUTOFF} 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", "sum_qty"),
            exact_sum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            exact_avg("l_quantity", "avg_qty"),
            exact_avg("l_extendedprice", "avg_price"),
            exact_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark plans a two-phase expand + partial
    aggregate, so the distinct set never concentrates on one node."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "q_agg_case",
    oracle=f"""
    WITH j AS (
      SELECT n.n_name, o.o_orderpriority, o.o_totalprice
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT 'case' AS branch, n_name,
           CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*) AS high_share,
           CAST(NULL AS VARCHAR) AS prio,
           CAST(NULL AS BIGINT) AS n_prio
    FROM j GROUP BY n_name
    UNION ALL
    SELECT 'pivot' AS branch, d.n_name,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           p.prio, c.c
    FROM (SELECT DISTINCT n_name FROM j) d
    CROSS JOIN (VALUES {", ".join(f"('{p}')" for p in _PRIORITIES)}) p(prio)
    LEFT JOIN (
      SELECT n_name, o_orderpriority, COUNT(*) AS c FROM j GROUP BY 1, 2
    ) c ON c.n_name = d.n_name AND c.o_orderpriority = p.prio
    """,
)
def q_agg_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union (round 4): conditional aggregation ('case' branch —
    high-value order share per nation, broadcast dimension join) ∪ the
    pivot/unpivot relational surface ('pivot' branch): per-nation order
    counts PIVOTed to one column per priority (explicit value list, the
    scale-safe form — pivot without values runs an extra distinct pass
    and caps at spark.sql.pivotMaxValues) then UNPIVOTed back to long
    form, absent combinations carried as NULLs. The oracle replays
    pivot∘unpivot as dims × values LEFT JOIN counts."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        n, c.c_nationkey == n.n_nationkey
    )
    n_high = F.sum(F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)).cast("bigint")
    null_l = F.lit(None).cast("bigint")
    case = joined.groupBy("n_name").agg(
        n_high.alias("n_high"),
        F.count(F.lit(1)).alias("n_orders"),
        (n_high / F.count(F.lit(1))).alias("high_share"),
    ).select(
        F.lit("case").alias("branch"),
        "n_name", "n_high", "n_orders", "high_share",
        F.lit(None).cast("string").alias("prio"),
        null_l.alias("n_prio"),
    )
    pivoted = (
        joined.groupBy("n_name")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
        .unpivot("n_name", _PRIORITIES, "prio", "n_prio")
        .select(
            F.lit("pivot").alias("branch"),
            "n_name",
            null_l.alias("n_high"),
            null_l.alias("n_orders"),
            F.lit(None).cast("double").alias("high_share"),
            "prio",
            "n_prio",
        )
    )
    return case.unionByName(pivoted)


@query(
    "q_agg_rollup_cube",
    oracle="""
    SELECT 'rollup' AS mode, d1, CAST(d2i AS VARCHAR) AS d2,
           revenue, n_orders, g1, g2
    FROM (
      SELECT n.n_name AS d1, CAST(year(o.o_orderdate) AS INT) AS d2i,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_orders,
             CAST(GROUPING(n.n_name) AS INT) AS g1,
             CAST(GROUPING(CAST(year(o.o_orderdate) AS INT)) AS INT) AS g2
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY ROLLUP (n.n_name, CAST(year(o.o_orderdate) AS INT)))
    UNION ALL
    SELECT 'cube' AS mode, o_orderstatus AS d1, o_orderpriority AS d2,
           revenue, n_orders, g1, g2
    FROM (
      SELECT o_orderstatus, o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_orders,
             CAST(GROUPING(o_orderstatus) AS INT) AS g1,
             CAST(GROUPING(o_orderpriority) AS INT) AS g2
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority))
    """,
)
def q_agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, year) over a broadcast-dimension join AND CUBE
    (status, priority), tagged and unioned — Spark's expand operator
    computes all grouping levels of each branch in one pass over its
    shuffle; GROUPING flags disambiguate super-aggregate rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
    )
    rollup = (
        joined.rollup("n_name", "o_year")
        .agg(
            exact_sum("o_totalprice", "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("n_name").cast("int").alias("g1"),
            F.grouping("o_year").cast("int").alias("g2"),
        )
        .select(
            F.lit("rollup").alias("mode"),
            F.col("n_name").alias("d1"),
            F.col("o_year").cast("string").alias("d2"),
            "revenue",
            "n_orders",
            "g1",
            "g2",
        )
    )
    cube = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            exact_sum("o_totalprice", "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("o_orderstatus").cast("int").alias("g1"),
            F.grouping("o_orderpriority").cast("int").alias("g2"),
        )
        .select(
            F.lit("cube").alias("mode"),
            F.col("o_orderstatus").alias("d1"),
            F.col("o_orderpriority").alias("d2"),
            "revenue",
            "n_orders",
            "g1",
            "g2",
        )
    )
    return rollup.unionByName(cube)


@query(
    "q_agg_having",
    oracle=f"""
    SELECT l_partkey,
           {exact_avg_sql('l_quantity', 'avg_qty')},
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) > 27.5
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — a post-aggregation filter on an exact-decimal average,
    so the comparison resolves identically in both engines."""
    avg_qty = exact_avg("l_quantity", "avg_qty")
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(avg_qty, F.count(F.lit(1)).alias("n_items"))
        .where(F.col("avg_qty") > 27.5)
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per group."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
        )
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT 'collect' AS branch, c.c_custkey,
           string_agg(DISTINCT o.o_orderpriority, ',' ORDER BY o.o_orderpriority) AS priorities,
           COUNT(*) AS n_orders
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey < 50
    GROUP BY c.c_custkey
    UNION ALL
    SELECT 'listagg' AS branch, c.c_custkey,
           string_agg(DISTINCT o.o_orderpriority, ',' ORDER BY o.o_orderpriority) AS priorities,
           COUNT(*) AS n_orders
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey >= 50 AND c.c_custkey < 100
    GROUP BY c.c_custkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union: collect_set → sorted → joined to a string
    ('collect' branch — deterministic serialization of a collected
    aggregate, SURVEY §5.3) ∪ the SQL-standard LISTAGG ... WITHIN
    GROUP (ORDER BY ...) Spark 4 added ('listagg' branch on the next
    custkey slice — ordered aggregation without the collect/sort/join
    detour; DuckDB replays both via ordered string_agg)."""
    o = load_table(spark, sf_dir, "orders")

    def slice_agg(lo, hi, branch, agg_col):
        c = load_table(spark, sf_dir, "customer").where(
            (F.col("c_custkey") >= lo) & (F.col("c_custkey") < hi)
        )
        return (
            c.join(o, c.c_custkey == o.o_custkey)
            .groupBy("c_custkey")
            .agg(agg_col.alias("priorities"), F.count(F.lit(1)).alias("n_orders"))
            .select(
                F.lit(branch).alias("branch"),
                "c_custkey", "priorities", "n_orders",
            )
        )

    collected = slice_agg(
        0, 50, "collect",
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ","),
    )
    listagged = slice_agg(
        50, 100, "listagg",
        F.expr(
            "listagg(DISTINCT o_orderpriority, ',') "
            "WITHIN GROUP (ORDER BY o_orderpriority)"
        ),
    )
    return collected.unionByName(listagged)


@query(
    "q_sql_passthrough",
    oracle="""
    SELECT 'sql' AS branch, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'pipe' AS branch, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def q_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL snap (SURVEY §2.A A2): SQL text over named inputs through
    operators.sql_snap — Spark SQL is the storage engine. Tagged
    union (round 5): the classic SELECT form ('sql' branch) ∪ the
    same snap written in Spark 4's SQL PIPE syntax ('pipe' branch:
    ``FROM t |> WHERE … |> AGGREGATE … GROUP BY …`` over the 'O'
    slice) — both resolve through the identical sql_snap plumbing and
    hash against plain-SQL oracles."""
    orders = load_table(spark, sf_dir, "orders")
    classic = sql_snap(
        spark,
        """
        SELECT 'sql' AS branch, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM {orders_view} WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
        """,
        inputs={"orders_snap_input": orders},
        params={"orders_view": "orders_snap_input"},
    )
    piped = sql_snap(
        spark,
        """
        FROM {orders_view}
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           GROUP BY o_orderpriority
        |> SELECT 'pipe' AS branch, o_orderpriority, n, total
        """,
        inputs={"orders_pipe_input": orders},
        params={"orders_view": "orders_pipe_input"},
    )
    return classic.unionByName(piped)
