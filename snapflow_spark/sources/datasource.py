"""Spark 4 Python DataSource for paged APIs (SURVEY.md §2.A A12).

``connectors.import_api_pages`` implements snapflow's connector loop
imperatively (page → snapshot, cursor file checkpointed per commit).
This module is the IDIOMATIC-SPARK form of the same contract: a
registered ``paged_api`` data source, so a connector is consumed like
any other format —

    spark.dataSource.register(PagedApiDataSource)
    df = (spark.read.format("paged_api")
          .schema("id bigint, v string")
          .option("pager", "my_module:make_pager").load())

    stream = (spark.readStream.format("paged_api")
              .schema("id bigint, v string")
              .option("pager", "...").load())

and — the A11 point — in the STREAMING form Spark's own offset log
replaces the connector's cursor file: each micro-batch's start/end
cursor is committed to the checkpoint by the engine, so restart
resumes exactly where the last committed batch ended with no
connector-side state at all.

The pager contract matches connectors.FetchPage: an importable
zero-arg factory (``module:callable`` — the same import-path
convention plans/yaml_config uses) returning
``fetch_page(cursor) -> (records, next_cursor)`` where records is a
list of dicts, an empty page means "caught up", and the cursor must
advance monotonically and json-serialize (it IS the offset). The
factory runs inside executors/stream-reader processes, so it must be
importable there — which is also why a callable can't be passed
directly through reader options (options are strings).

Scale note: one API = one sequential page loop (that is what a
cursor-paginated API gives you), so the batch reader is a single
input partition — A12 parallelism comes from MANY connectors/sources,
and from everything downstream being ordinary distributed scans.
"""

from __future__ import annotations

import json
from importlib import import_module
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


def resolve_pager(ref: str):
    """PUBLIC pager resolution: 'module:callable' -> fetch_page via
    the zero-arg factory (the same import-path convention
    plans/yaml_config uses — and yaml_config calls this directly)."""
    mod, _, fn = ref.partition(":")
    if not fn:
        raise ValueError(f"pager must be 'module:callable', got {ref!r}")
    return getattr(import_module(mod), fn)()


def _resolve_pager(options: dict):
    """Reader-options form: 'synthetic' -> the built-in demo pager
    (sized by the pages/page_size options), else resolve_pager."""
    spec = options.get("pager", "synthetic")
    if spec == "synthetic":
        return synthetic_pager(
            n_pages=int(options.get("pages", 3)),
            page_size=int(options.get("page_size", 5)),
        )
    return resolve_pager(spec)


def synthetic_pager(n_pages: int = 3, page_size: int = 5):
    """Deterministic in-memory pager (the test/demo double for an HTTP
    fetcher): rows are (id, v) with id = cursor offset, cursor = next
    unseen id. A real connector replaces ONLY this function."""

    total = n_pages * page_size

    def fetch_page(cursor):
        start = int(cursor or 0)
        if start >= total:
            return [], start
        end = min(start + page_size, total)
        return [{"id": i, "v": f"rec{i}"} for i in range(start, end)], end

    return fetch_page


class PagedApiBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.options = options

    def partitions(self):
        # a cursor-paginated API is inherently one sequential stream
        return [InputPartition(0)]

    def read(self, partition) -> Iterator[tuple]:
        fetch_page = _resolve_pager(self.options)
        cursor = json.loads(self.options.get("start_cursor", "null"))
        max_pages = int(self.options.get("max_pages", 1000))
        names = self.schema_.fieldNames()
        caught_up = False
        for _ in range(max_pages):
            records, next_cursor = fetch_page(cursor)
            if not records:
                caught_up = True
                break
            if next_cursor == cursor:
                raise ValueError("pager did not advance its cursor")
            for r in records:
                yield tuple(r.get(n) for n in names)
            cursor = next_cursor
        if not caught_up:
            # hitting the cap mid-stream must not look like a complete
            # read: probe one more page and fail loudly if data remains
            # (a silent partial batch load poisons every downstream
            # snapshot/dedup baseline with missing rows)
            records, _ = fetch_page(cursor)
            if records:
                raise ValueError(
                    f"paged_api batch read stopped at max_pages={max_pages} "
                    "with pages remaining; raise the max_pages option or "
                    "use the streaming reader (which has no page cap)"
                )


class PagedApiStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: ONE page per batch; the page's start cursor
    is the batch's start offset and the advanced cursor its end. Spark
    checkpoints these offsets — crash/restart replays from the last
    committed cursor (``readBetweenOffsets`` re-fetches a page by its
    start cursor, which a monotonic pager serves deterministically)."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.options = options
        self.fetch_page = _resolve_pager(options)

    def initialOffset(self) -> dict:
        return {"cursor": json.loads(self.options.get("start_cursor", "null"))}

    def _rows(self, records) -> list[tuple]:
        names = self.schema_.fieldNames()
        return [tuple(r.get(n) for n in names) for r in records]

    def read(self, start: dict):
        cursor = start["cursor"]
        records, next_cursor = self.fetch_page(cursor)
        if records and next_cursor == cursor:
            raise ValueError("pager did not advance its cursor")
        if not records:
            return iter([]), start  # caught up: offset unchanged
        return iter(self._rows(records)), {"cursor": next_cursor}

    def readBetweenOffsets(self, start: dict, end: dict):
        """Replay of a committed batch after restart: re-fetch from the
        start cursor and validate against the COMMITTED end offset —
        a live API whose tail page grew since the original fetch must
        not leak rows beyond the committed range into the replayed
        batch (they belong to the next batch, and emitting them here
        duplicates them). Positional (integer) cursors are trimmed
        back to exactly the committed count; opaque cursors that no
        longer replay to the committed end fail loudly — exactly-once
        replay requires a deterministic or positional pager."""
        records, next_cursor = self.fetch_page(start["cursor"])
        committed = end["cursor"]
        if next_cursor != committed:
            s = start["cursor"]
            if isinstance(committed, int) and isinstance(s, (int, type(None))):
                n = committed - int(s or 0)
                if not 0 <= n <= len(records):
                    raise ValueError(
                        f"paged_api replay from cursor {s!r} returned "
                        f"{len(records)} rows but the committed range is "
                        f"{n} — the pager is not replayable by cursor"
                    )
                records = records[:n]
            else:
                raise ValueError(
                    f"paged_api replay drift: re-fetch from {s!r} advanced "
                    f"to {next_cursor!r}, not the committed end "
                    f"{committed!r}; exactly-once replay requires a "
                    "deterministic (or positional-cursor) pager"
                )
        return iter(self._rows(records))


class PagedApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self):
        # API records are schemaless dicts; inference from one page is
        # unstable across pages — exactly connectors.py's rule.
        raise ValueError(
            "paged_api requires an explicit .schema(...) — API records "
            "are schemaless dicts and one-page inference is unstable"
        )

    def reader(self, schema: StructType) -> PagedApiBatchReader:
        return PagedApiBatchReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> PagedApiStreamReader:
        return PagedApiStreamReader(schema, dict(self.options))
