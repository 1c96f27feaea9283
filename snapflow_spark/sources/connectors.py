"""Generic external-connector shape (SURVEY.md §2.A A12).

Snapflow's concrete connectors (stripe, shopify, fred, ...) are all
the same loop: fetch a page of records from an API, emit it as a
block, remember a cursor so the next run resumes where this one
stopped. This module implements that LOOP on the Spark engine —
page -> DataFrame -> SnapshotStore snapshot, cursor checkpointed in
the store directory — so a concrete connector is just a
``fetch_page`` function. Two concrete fetchers ship: the JDBC cursor
pager (embedded-Derby-tested) and ``http_json_pager`` (round 10 —
stdlib urllib, cursor- and page-number styles, retry/backoff with
Retry-After; tested against a local in-process HTTP server, the
full request path minus only the WAN).

Scale note: API pagination is inherently sequential and
driver-bound — the page loop is NOT where 100 TB arrives (that is the
parquet/JDBC path). What must scale is everything downstream, which
is why pages land as SnapshotStore snapshots: the incremental
Pipeline consumes them exactly like any other source, and history
reads are distributed parquet scans.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from snapflow_spark.incremental.store import SnapshotStore

# fetch_page(cursor) -> (records, next_cursor). The cursor is the
# RESUME POINT and must advance monotonically, never to None — an
# empty records list signals "caught up" (the loop stops and the next
# run polls from the tail). A None next_cursor on a non-empty page is
# a contract violation and raises: persisting it would silently
# restart pagination from the beginning and re-import all history.
FetchPage = Callable[[object], tuple[list[Mapping], object]]


@dataclass
class ImportResult:
    snapshot_ids: list[str] = field(default_factory=list)
    n_pages: int = 0
    n_records: int = 0
    cursor: object = None  # final cursor, persisted for the next run


def _cursor_path(store: SnapshotStore) -> Path:
    return store.path / "_cursor.json"


def load_cursor(store: SnapshotStore) -> object:
    p = _cursor_path(store)
    if p.exists():
        return json.loads(p.read_text())["cursor"]
    return None


def save_cursor(store: SnapshotStore, cursor: object) -> None:
    tmp = _cursor_path(store).with_suffix(".tmp")
    tmp.write_text(json.dumps({"cursor": cursor}))
    tmp.rename(_cursor_path(store))


def import_api_pages(
    spark: SparkSession,
    fetch_page: FetchPage,
    schema: StructType | str,
    store: SnapshotStore,
    max_pages: int | None = None,
) -> ImportResult:
    """Run the connector loop: resume from the store's checkpointed
    cursor, append one snapshot per fetched page, checkpoint the
    advanced cursor AFTER each snapshot commits (a crash re-fetches at
    most one page — at-least-once, deduped downstream by the
    consumer's keys, the same contract snapflow's importers had).

    The cursor encodes the RESUME POINT (e.g. last seen id or
    timestamp) and always advances monotonically; an empty page means
    "caught up" — the loop stops and the next run polls again from the
    tail, which is how an incremental importer follows a live API.

    ``schema`` is required: API records are schemaless dicts and
    inference from one page is unstable across pages."""
    result = ImportResult(cursor=load_cursor(store))
    while max_pages is None or result.n_pages < max_pages:
        records, next_cursor = fetch_page(result.cursor)
        if not records:  # caught up; keep the tail cursor for next run
            break
        if next_cursor is None:
            raise ValueError(
                "fetch_page returned records with next_cursor=None; the "
                "cursor must advance monotonically (return the tail cursor "
                "and an empty page when caught up) — persisting None would "
                "restart pagination and duplicate all history on re-run"
            )
        if next_cursor == result.cursor:
            raise ValueError(
                f"fetch_page returned records without advancing the cursor "
                f"(still {next_cursor!r}); with max_pages=None this pager "
                f"would loop forever appending duplicate snapshots — the "
                f"cursor must advance on every non-empty page"
            )
        df = spark.createDataFrame(records, schema=schema)
        result.snapshot_ids.append(store.append(df))
        result.n_pages += 1
        result.n_records += len(records)
        result.cursor = next_cursor
        save_cursor(store, next_cursor)
    return result


def _json_path(obj, path: str):
    """Dotted-path lookup into parsed JSON; '' returns obj itself."""
    cur = obj
    for part in [p for p in (path or "").split(".") if p]:
        if not isinstance(cur, Mapping) or part not in cur:
            return None
        cur = cur[part]
    return cur


def http_json_pager(
    url: str,
    records_path: str = "",
    cursor_param: str | None = None,
    next_cursor_path: str | None = None,
    cursor_from_field: str | None = None,
    page_param: str | None = None,
    params: Mapping[str, str] | None = None,
    headers: Mapping[str, str] | None = None,
    timeout: float = 30.0,
    max_retries: int = 4,
    backoff: float = 1.0,
    _sleep=None,
) -> FetchPage:
    """CONCRETE HTTP connector — the REST twin of ``jdbc_cursor_pager``,
    covering the two pagination styles that together span most public
    JSON APIs (stdlib urllib, no dependencies):

    - **cursor style** (Stripe's ``starting_after``, generic
      ``cursor=``): pass ``cursor_param``; the next cursor comes from
      ``next_cursor_path`` (a dotted path into the response body) or,
      when the API returns none, ``cursor_from_field`` (the LAST
      record's field — the Stripe convention). The cursor the loop
      checkpoints is exactly the API's resume token.
    - **page-number style**: pass ``page_param``; the cursor is the
      last fetched page number and advances by one per non-empty
      page.

    ``records_path`` locates the record list in the body ('' when the
    body IS the list). Transient failures (HTTP 429/5xx, socket
    errors) retry up to ``max_retries`` with exponential backoff,
    honoring ``Retry-After`` when present; 4xx other than 429 raise
    immediately (a bad token must not be retried into a lockout).

    Driver-bound BY DESIGN, like every API pager (module doc): pages
    land as SnapshotStore snapshots via ``import_api_pages`` and all
    downstream processing is distributed. Plugs into the ``paged_api``
    streaming DataSource via a zero-arg factory the same way.
    ``_sleep`` is a test seam for the backoff clock."""
    import time as _time
    import urllib.error
    import urllib.parse
    import urllib.request

    modes = sum(x is not None for x in (cursor_param, page_param))
    if modes != 1:
        raise ValueError(
            "exactly one of cursor_param / page_param selects the "
            "pagination style"
        )
    if cursor_param and not (next_cursor_path or cursor_from_field):
        raise ValueError(
            "cursor style needs next_cursor_path (body field) or "
            "cursor_from_field (last record's field) to advance"
        )
    sleep = _sleep if _sleep is not None else _time.sleep

    def _get(query: Mapping[str, str]) -> object:
        q = {**(params or {}), **query}
        full = url + ("?" + urllib.parse.urlencode(q) if q else "")
        last_err: Exception | None = None
        for attempt in range(max_retries + 1):
            req = urllib.request.Request(full, headers=dict(headers or {}))
            try:
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code != 429 and e.code < 500:
                    raise  # auth/validation errors must surface, not retry
                last_err = e
                retry_after = e.headers.get("Retry-After") if e.headers else None
                wait = backoff * (2**attempt)
                if retry_after:
                    try:
                        wait = float(retry_after)
                    except ValueError:
                        # RFC 9110 also allows an HTTP-date form
                        try:
                            from email.utils import parsedate_to_datetime

                            dt = parsedate_to_datetime(retry_after)
                            wait = max(
                                0.0, dt.timestamp() - _time.time()
                            )
                        except (TypeError, ValueError):
                            pass  # unparseable header: keep backoff
                    # a server saying 'inf'/'nan'/'1e30' must not hang
                    # the pager: non-finite or negative falls back to
                    # backoff, and any wait is capped at an hour
                    import math as _math

                    if not _math.isfinite(wait) or wait < 0:
                        wait = backoff * (2**attempt)
                    wait = min(wait, 3600.0)
            except OSError as e:  # socket timeouts, conn resets
                last_err = e
                wait = backoff * (2**attempt)
            if attempt < max_retries:
                sleep(wait)
        raise RuntimeError(
            f"http_json_pager: {full} failed after {max_retries + 1} "
            f"attempts: {last_err}"
        )

    def fetch_page(cursor):
        if page_param is not None:
            next_page = (int(cursor) + 1) if cursor is not None else 1
            body = _get({page_param: str(next_page)})
            records = _json_path(body, records_path) or []
            if not records:
                return [], cursor
            return list(records), next_page
        query = {cursor_param: str(cursor)} if cursor is not None else {}
        body = _get(query)
        records = _json_path(body, records_path) or []
        if not records:
            return [], cursor
        nxt = (
            _json_path(body, next_cursor_path) if next_cursor_path else None
        )
        if nxt is None and cursor_from_field:
            nxt = records[-1].get(cursor_from_field)
        return list(records), nxt

    return fetch_page


def jdbc_cursor_pager(
    spark: SparkSession,
    url: str,
    table: str,
    cursor_col: str,
    page_size: int = 1000,
    **jdbc_options,
) -> FetchPage:
    """CONCRETE connector (the first fetch_page that ships): paged
    incremental import from a JDBC table by a monotonically-increasing
    NUMERIC cursor column (surrogate id, epoch timestamp) — the
    database twin of an HTTP pager, fully exercisable in-sandbox
    against the embedded Derby that q_scan_formats already drives.

    Each page pushes ``WHERE cursor_col > last ORDER BY cursor_col
    FETCH FIRST page_size ROWS ONLY`` down to the database as a
    dbtable subquery (ANSI FETCH FIRST: Derby/Postgres/Oracle/DB2;
    use a dialect option for LIMIT engines), so the database does the
    pagination — the driver only ever holds one page. next_cursor =
    the page's max cursor value; ties beyond the page boundary are
    NOT lost because the cursor is strictly-greater-than and the sort
    is on the cursor itself — but a non-unique cursor column can
    split a tie group across pages, so use a unique column (document
    the same caveat every CDC importer carries).

    The returned pager plugs into ``import_api_pages`` (cursor
    checkpointed per committed snapshot -> at-least-once resume) or
    the ``paged_api`` DataSource via a zero-arg factory wrapper."""
    if not str(cursor_col).replace("_", "").isalnum():
        raise ValueError(f"cursor_col must be a plain identifier: {cursor_col!r}")
    # `table` is interpolated into the pushed-down subquery below, and
    # it often arrives from config (the YAML/plan layer) — hold it to
    # the same identifier discipline as cursor_col (allowing one
    # schema.table dot) so a hostile config string cannot inject SQL.
    if not all(
        part and part.replace("_", "").isalnum()
        for part in str(table).split(".")
    ) or str(table).count(".") > 1:
        raise ValueError(
            f"table must be a plain identifier or schema.table: {table!r}"
        )

    def fetch_page(cursor):
        # ANSI-quoted identifier: Spark's JDBC writer creates quoted
        # (case-preserved) columns, so an unquoted name would fold to
        # uppercase in Derby/Postgres/Oracle and miss the column.
        # NULL cursors are excluded explicitly: a NULL can never
        # satisfy `> last` on later pages (such rows would silently
        # never import) and ASC sorts place NULLs last, so the page
        # tail would poison the checkpoint — require NOT NULL and
        # surface offenders to the caller's attention via the count
        # mismatch rather than a mid-import TypeError.
        qc = f'"{cursor_col}"'
        pred = (
            f"{qc} IS NOT NULL AND {qc} > {int(cursor)}"
            if cursor is not None
            else f"{qc} IS NOT NULL"
        )
        sub = (
            f"(SELECT * FROM {table} WHERE {pred} "
            f"ORDER BY {qc} FETCH FIRST {int(page_size)} ROWS ONLY) page"
        )
        df = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", sub)
            .options(**jdbc_options)
            .load()
        )
        rows = df.orderBy(cursor_col).collect()
        if not rows:
            return [], cursor
        records = [r.asDict() for r in rows]
        return records, int(records[-1][cursor_col])

    return fetch_page
