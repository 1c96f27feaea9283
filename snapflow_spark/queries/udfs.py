"""UDF/UDAF surface queries (SURVEY.md §2.B.9) — snapflow's
python-snap essence: arbitrary pandas logic per block / per group,
re-expressed as Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.catalog import load_table
from snapflow_spark.functions.text import token_count_udf
from snapflow_spark.registry import query


@query(
    "q_udf_scalar",
    oracle=r"""
    SELECT doc_id, lang,
           CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens
    FROM documents
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Series->Series over Arrow batches): token
    count on documents.text — the python-snap hot path done the only
    way that survives scale (vectorized, never row-at-a-time)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", token_count_udf("text").alias("n_tokens"))


_ZSCORE_SCHEMA = "event_id bigint, user_id bigint, z double"


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group pandas transform: z-score of event value within the
    user's history (ddof=1 == SQL stddev_samp)."""
    std = pdf["value"].std(ddof=1)
    mean = pdf["value"].mean()
    z = (pdf["value"] - mean) / std if std and np.isfinite(std) else pd.Series(
        [None] * len(pdf), dtype="float64"
    )
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z.round(4)}
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 4) AS z
    FROM events
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas) — the direct analogue of
    a snapflow pandas snap over a keyed group. One shuffle on user_id;
    each group crosses to a python worker as one Arrow batch. Rounded
    to 4 decimals: pandas and DuckDB aggregate doubles in different
    orders (probed: equal after round)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # Pin the exchange width instead of letting AQE coalesce it: the
    # python stage's cost is per-GROUP python/pandas overhead, not
    # bytes, and AQE's 1 MB minPartitionSize floor coalesces this
    # ~1.7 MB shuffle to 1-2 partitions — serializing every group's
    # crossing on one core (measured 3.45 s -> 0.66 s at sf0.1 with
    # the pin; plan shape unchanged, still exactly one Exchange since
    # groupBy reuses the repartition's hashpartitioning). Width is
    # max(defaultParallelism, shuffle.partitions), not a constant, so
    # a cluster profile (tune_cluster: 2000 shuffle partitions) keeps
    # its width and the local shim fills local[N] — guide §2.5/§4:
    # python-crossing stages want parallelism first, byte-sized
    # partitions second.
    sc = spark.sparkContext
    width = max(
        sc.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    return (
        e.repartition(width, "user_id")
        .groupBy("user_id")
        .applyInPandas(_zscore, _ZSCORE_SCHEMA)
    )
