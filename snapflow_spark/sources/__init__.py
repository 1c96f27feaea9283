from snapflow_spark.sources.io import (
    import_dataframe,
    import_records,
    read_csv,
    read_jdbc,
    read_jsonl,
    write_csv,
    write_jsonl,
)

__all__ = [
    "import_records",
    "import_dataframe",
    "read_csv",
    "write_csv",
    "read_jsonl",
    "write_jsonl",
    "read_jdbc",
]
