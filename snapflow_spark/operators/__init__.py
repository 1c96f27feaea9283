"""Engine operators — snapflow's framework ops re-expressed on Spark.

Each module documents which SURVEY.md §2 row it fulfills and the
scale story (shuffle/broadcast behavior at 100 TB).
"""

from snapflow_spark.operators.asof import asof_join
from snapflow_spark.operators.dedupe import dedupe_keep_latest
from snapflow_spark.operators.merge import merge_streams
from snapflow_spark.operators.schema_translate import schema_translate
from snapflow_spark.operators.sql_snap import sql_snap
from snapflow_spark.operators.topk import grouped_topk, topk

__all__ = [
    "asof_join",
    "dedupe_keep_latest",
    "merge_streams",
    "schema_translate",
    "sql_snap",
    "topk",
    "grouped_topk",
]
