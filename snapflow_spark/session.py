"""SparkSession construction and runtime tuning.

Snapflow's Environment (SURVEY.md §1.1 [P snapflow/core/environment.py])
is replaced by a SparkSession plus the runtime confs below. ``tune`` is
idempotent and safe to call on a session we did not create (the driver
passes its own session to ``__spark_entry__.entry``): it only touches
runtime-settable confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs every query in this engine relies on.

    - UTC session timezone: the DuckDB oracle treats parquet timestamps
      as naive instants; Spark must extract date parts in UTC to match.
    - AQE on: runtime re-planning (partition coalescing, skew-join
      splitting) is the 100 TB story for every shuffle in this engine.
    - Arrow on: all pandas-UDF operators cross JVM->python in batches.
    """
    conf = spark.conf
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # pinned explicitly (not left to Spark's default) — SCALE.md's
    # skew story depends on AQE splitting oversized join partitions
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # spark.sql.execution.pythonUDTF.arrow.enabled is deliberately NOT
    # set: each UDTF in functions/udtfs.py pins useArrow explicitly at
    # the decorator (the conf is only consulted at decoration time
    # anyway, i.e. before any session exists for import-time UDTFs),
    # and the Arrow eval path measured ~2x SLOWER than plain pickle
    # for generator-style UDTFs — see the SplitSentences docstring.
    # InferFiltersFromGenerate synthesizes `size(arr) > 0` under every
    # explode(), and predicate pushdown then SUBSTITUTES the full array
    # expression into a Filter at the FileScan — for this engine's
    # exploded arrays (gram hashes, winnow fingerprints, LSH bands:
    # expensive to compute, never empty by construction) that evaluates
    # the whole tokenize/sha256 subtree TWICE per row, with the filter
    # copy running on the raw scan partitions BEFORE ensure_parallelism
    # (measured: q_fingerprint_winnow's span branch 31 s -> 2 s at
    # sf0.1 with the rule excluded; q_text_quality carried four such
    # pushed filters). The rule only ever saves work when exploded
    # arrays are frequently empty, which none of ours are.
    # MERGE with (never overwrite) any exclusions the deployment set
    rule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    try:
        existing = conf.get("spark.sql.optimizer.excludedRules")
    except Exception:
        existing = None
    if existing and rule not in existing:
        conf.set("spark.sql.optimizer.excludedRules", f"{existing},{rule}")
    elif not existing:
        conf.set("spark.sql.optimizer.excludedRules", rule)
    # events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
    # default; read as long nanos, converted in catalog.load_table.
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        conf.set("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
    except Exception:
        pass  # static in some deployments; AQE coalescing still applies
    return spark


def build_session(app_name: str = "snapflow-spark", master: str | None = None) -> SparkSession:
    """Build the engine's own session (tests, bench, CLI runs)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return tune(builder.getOrCreate())
