"""Scalar function-family queries (SURVEY.md §2.B.8) — one query per
family, several functions per row so one oracle hash covers the family.

Cross-engine gotchas baked in (probed on real data this session):
- libm functions (exp/ln/log10/pow) differ from DuckDB in the last ULP
  -> wrapped in round(x, 6) on BOTH sides.
- Spark floor/ceil return BIGINT, DuckDB DOUBLE -> explicit casts.
- Spark regexp_replace replaces all matches; DuckDB needs the 'g' flag.
- Spark weekday() (0=Mon) == DuckDB isodow()-1.
- orders.o_orderdate arrives as TIMESTAMP_NTZ in Spark 4 -> date parts
  are timezone-independent; timestamps serialize via date_format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.catalog import ensure_parallelism, load_table
from snapflow_spark.registry import query


@query(
    "q_scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS u,
           lower(p_brand) AS lo,
           substring(p_type, 3, 5) AS sub,
           CAST(length(p_name) AS INT) AS len_name,
           trim(concat_ws('|', p_brand, p_type)) AS joined,
           replace(p_type, ' ', '_') AS replaced,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           list_element(string_split(p_type, ' '), 1) AS tok1,
           regexp_extract(p_name, '([0-9]+)', 1) AS first_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           reverse(p_brand) AS rev
    FROM part
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, length, concat, replace, pad,
    split, regex extract/replace — all whole-stage-codegen JVM ops."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("u"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_type", 3, 5).alias("sub"),
        F.length("p_name").alias("len_name"),
        F.trim(F.concat_ws("|", "p_brand", "p_type")).alias("joined"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("replaced"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.element_at(F.split("p_type", " "), 1).alias("tok1"),
        F.regexp_extract("p_name", "([0-9]+)", 1).alias("first_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.reverse(F.col("p_brand")).alias("rev"),
    )


@query(
    "q_scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(isodow(o_orderdate) - 1 AS INT) AS wd,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT) AS days_to_99,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: parts, truncation, arithmetic, diffs —
    serialized as ISO strings so both engines hash identically."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.weekday("o_orderdate").alias("wd"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd"
        ).alias("plus30"),
        F.datediff(
            F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_99"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@query(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / 7, 3) AS r3,
           CAST(floor(l_extendedprice / 7) AS BIGINT) AS fl,
           CAST(ceil(l_extendedprice / 7) AS BIGINT) AS ce,
           abs(l_discount - 0.05) AS ab,
           mod(l_orderkey, 7) AS pm,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
           greatest(l_quantity, l_discount * 100) AS g,
           least(l_tax, l_discount) AS le,
           round(exp(l_discount), 6) AS ex,
           round(ln(l_extendedprice), 6) AS ln_p,
           round(log10(l_extendedprice), 6) AS lg,
           round(pow(l_quantity, 2.5), 6) AS pw,
           sqrt(l_extendedprice) AS sq
    FROM lineitem
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt is IEEE-exact cross-engine; the libm group
    (exp/ln/log10/pow) is rounded to 6 decimals on both sides because
    JVM Math and C libm differ in the last ULP (probed, SURVEY §5.3).

    Round 17: the single-row-group local fixture scans as ONE
    partition, serializing 600k rows of libm work on one core
    (guide §2.5 input skew); ensure_parallelism spreads it (no-op at
    real scan splits). Row-wise projection — values are partition-
    order independent. 1.15 -> 0.79 s interleaved min-of-5."""
    l = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 7, 3).alias("r3"),
        F.floor(F.col("l_extendedprice") / 7).cast("bigint").alias("fl"),
        F.ceil(F.col("l_extendedprice") / 7).cast("bigint").alias("ce"),
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("pm"),
        F.signum(F.col("l_discount") - 0.05).alias("sg"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("le"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 6).alias("lg"),
        F.round(F.pow("l_quantity", F.lit(2.5)), 6).alias("pw"),
        F.sqrt("l_extendedprice").alias("sq"),
    )


@query(
    "q_scalar_array",
    oracle="""
    SELECT 'array' AS branch, p_partkey,
           CAST(len(string_split(p_type, ' ')) AS INT) AS n_tokens,
           array_to_string(list_sort(string_split(p_type, ' ')), ',') AS sorted_tokens,
           CAST(list_contains(string_split(p_type, ' '), 'the') AS INT) AS has_the,
           list_element(string_split(p_type, ' '), 1) AS first_tok,
           CAST(list_aggregate(list_transform(string_split(p_type, ' '),
                x -> length(x)), 'sum') AS INT) AS total_len
    FROM part
    UNION ALL
    SELECT 'lateral' AS branch, p_partkey,
           CAST(len(string_split(p_type, ' ')) AS INT) AS n_tokens,
           array_to_string(list_sort(string_split(p_type, ' ')), ',') AS sorted_tokens,
           CAST(list_contains(string_split(p_type, ' '), 'the') AS INT) AS has_the,
           list_element(string_split(p_type, ' '), 1) AS first_tok,
           CAST(list_aggregate(list_transform(string_split(p_type, ' '),
                x -> length(x)), 'sum') AS INT) AS total_len
    FROM part
    """,
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order transform/aggregate lambdas —
    snapflow had no array columns (SURVEY §1.2); this engine exposes
    them natively and keeps the lambdas inside codegen.

    Tagged union (round 6): the codegen array-expression form
    ('array' branch) ∪ the same six values RE-DERIVED through a SQL
    ``LATERAL split_tokens(p_type)`` python-UDTF join + GROUP BY
    re-aggregation ('lateral' branch, functions/udtfs.py) — the SQL
    registration surface of B.9's UDTF row that was previously only
    pytest-exercised. The oracle replays both branches from the same
    array semantics, so a hash match proves the UDTF explode +
    regroup path is value-identical to the codegen expressions."""
    from snapflow_spark.functions.udtfs import register_udtfs

    p = load_table(spark, sf_dir, "part")
    toks = F.split("p_type", " ")
    arr = p.select(
        F.lit("array").alias("branch"),
        "p_partkey",
        F.size(toks).alias("n_tokens"),
        F.array_join(F.sort_array(toks), ",").alias("sorted_tokens"),
        F.array_contains(toks, "the").cast("int").alias("has_the"),
        F.element_at(toks, 1).alias("first_tok"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("total_len"),
    )
    register_udtfs(spark)
    p.createOrReplaceTempView("part_scalar_array_input")
    lateral = spark.sql(
        """
        SELECT 'lateral' AS branch, p_partkey,
               CAST(COUNT(*) AS INT) AS n_tokens,
               array_join(sort_array(collect_list(s.token)), ',') AS sorted_tokens,
               CAST(MAX(CASE WHEN s.token = 'the' THEN 1 ELSE 0 END) AS INT)
                 AS has_the,
               min_by(s.token, s.tok_idx) AS first_tok,
               CAST(SUM(length(s.token)) AS INT) AS total_len
        FROM part_scalar_array_input, LATERAL split_tokens(p_type) s
        GROUP BY p_partkey
        """
    )
    return arr.unionByName(lateral)


@query(
    "q_scalar_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(len(json_keys(props::JSON)) AS INT) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_variant,
           json_extract_string(props, '$.k') IS NULL AS k_missing
    FROM events
    """,
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: snapflow rode nested data in Json fields (SURVEY
    §1.2); here both path extraction and full map parsing are native.
    Round 5 adds the Spark 4 VARIANT path — ``parse_json`` to the
    binary semi-structured type, ``try_variant_get`` typed extraction
    — asserting it agrees value-for-value with the string-path
    functions (the oracle replays both from the same JSON).

    Round 17: the triple JSON parse (from_json + parse_json string
    path + variant) is the roster's heaviest row-wise scan work after
    gopher; the single-row-group fixture serialized it on one core.
    ensure_parallelism spreads it (no-op at real scan splits);
    0.73 -> 0.22 s interleaved min-of-5."""
    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    parsed = F.from_json("props", "map<string,string>")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.size(F.map_keys(parsed)).alias("n_keys"),
        F.try_variant_get(v, "$.k", "int").alias("k_variant"),
        F.try_variant_get(v, "$.k", "string").isNull().alias("k_missing"),
    )


#: Superset guard for Spark's string->integral try_cast grammar: the
#: cast trims chars <= U+0020 (UTF8String.trimAll), then accepts an
#: optional sign and ASCII digits only. Any string try_cast could
#: parse matches this regex, so routing non-matches straight to NULL
#: is exactly try_cast's result — WITHOUT constructing the formatted
#: per-row SparkNumberFormatException a failing TRY cast pays (~8 us/
#: row: 1.17 s -> 0.08 s on the all-failing status column at sf0.1;
#: overflow strings match and still take the real try_cast, so they
#: NULL exactly as before). Anchored \A..\z, not ^..$ (r17 advice):
#: Java's $ also matches before a FINAL LINE TERMINATOR (U+0085,
#: U+2028, U+2029 - none trimmed by trimAll), so '42<U+2028>' would
#: pass a $-anchored guard. That was harmless (matches take the real
#: try_cast, the superset direction), but \z makes the guard the
#: exact accept boundary — it must never silently become a parse
#: shortcut that skips the cast. Equivalence pinned over adversarial
#: inputs in tests/test_scalar_guards.py.
_TRY_BIGINT_GUARD = r"\A[\x00-\x20]*[+-]?[0-9]+[\x00-\x20]*\z"


def guarded_try_bigint(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.rlike(_TRY_BIGINT_GUARD), c.try_cast("bigint"))


@query(
    "q_scalar_cast",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
           COALESCE(TRY_CAST(o_orderstatus AS BIGINT), -1) AS status_num,
           NULLIF(o_orderstatus, 'O') AS status_nz,
           CAST(floor(o_totalprice) AS BIGINT) AS price_long,
           CAST(CAST(o_orderkey AS DOUBLE) AS STRING) AS key_str
    FROM orders
    """,
)
def q_scalar_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast/null family: try_cast (ANSI-safe failure -> NULL),
    coalesce, nullif, numeric/string round-trips — identical semantics
    both engines, exercised on real mixed-content columns."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).try_cast("bigint").alias("prio_num"),
        F.coalesce(guarded_try_bigint("o_orderstatus"), F.lit(-1)).alias("status_num"),
        F.nullif("o_orderstatus", F.lit("O")).alias("status_nz"),
        # explicit floor: CAST(double AS BIGINT) truncates in Spark but
        # rounds in DuckDB — the only divergent cast in the family
        F.floor("o_totalprice").cast("bigint").alias("price_long"),
        F.col("o_orderkey").cast("double").cast("string").alias("key_str"),
    )
