from snapflow_spark.sources.snapshot_sink import SnapshotStoreDataSource
from snapflow_spark.sources.datasource import (
    PagedApiDataSource,
    synthetic_pager,
)
from snapflow_spark.sources.connectors import (
    ImportResult,
    import_api_pages,
    load_cursor,
    save_cursor,
)
from snapflow_spark.sources.io import (
    import_dataframe,
    import_records,
    read_csv,
    read_jdbc,
    read_jsonl,
    read_orc,
    refresh_bucketed,
    write_bucketed,
    write_range_sorted,
    write_zorder,
    zorder_key,
    write_csv,
    write_jsonl,
    write_orc,
)

__all__ = [
    "SnapshotStoreDataSource",
    "PagedApiDataSource",
    "synthetic_pager",
    "ImportResult",
    "import_api_pages",
    "import_records",
    "import_dataframe",
    "load_cursor",
    "read_csv",
    "save_cursor",
    "write_csv",
    "read_jsonl",
    "write_jsonl",
    "read_orc",
    "write_orc",
    "read_jdbc",
    "refresh_bucketed",
    "write_bucketed",
    "write_range_sorted",
    "write_zorder",
    "zorder_key",
]
