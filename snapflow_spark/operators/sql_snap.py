"""SQL snap (SURVEY.md §2.A A2) — run SQL text against named inputs.

Snapflow renders jinja-templated SQL and ships it to the storage's
database [P snapflow/core/sql/sql_function.py]. Here the "database" is
Spark SQL itself: inputs become temp views, the text runs through
Catalyst, and the entire optimizer applies. Parameters use
``str.format`` (the engine does not re-implement jinja).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sql_snap(
    spark: SparkSession,
    sql_text: str,
    inputs: dict[str, DataFrame] | None = None,
    params: dict | None = None,
) -> DataFrame:
    for name, df in (inputs or {}).items():
        df.createOrReplaceTempView(name)
    if params:
        sql_text = sql_text.format(**params)
    return spark.sql(sql_text)
