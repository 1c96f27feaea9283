"""snapflow_spark — a PySpark-native functional data-pipeline engine.

A brand-new engine with the query and data-processing capabilities of
kvh/snapflow (see SURVEY.md; the reference checkout is empty, so all
parity claims cite SURVEY.md's provenance-tagged inventory), re-expressed
on Spark primitives:

- DataBlocks        -> immutable DataFrames / parquet snapshot dirs
- Schemas           -> StructType + declarative translation (operators.schema_translate)
- python snaps      -> DataFrame ops / pandas UDFs (operators, functions)
- SQL snaps         -> temp views + spark.sql (operators.sql_snap)
- stream ops        -> operators.merge_streams / incremental snapshots
- reactive run loop -> incremental.Pipeline with a run-ledger
- north-star ops    -> dedup / similarity / text analysis / multimodal
"""

from snapflow_spark.session import build_session, tune
from snapflow_spark.catalog import TABLES, load_table, register_views

__all__ = ["build_session", "tune", "TABLES", "load_table", "register_views"]

__version__ = "0.1.0"
