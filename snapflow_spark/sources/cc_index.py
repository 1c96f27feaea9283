"""Common Crawl index adapters — the public index schemas mapped onto
this engine's pruning contracts, so a user filters the index and feeds
it STRAIGHT to ``read_warc(index=...)`` (file pruning) or
``read_warc_ranges`` (record byte-range reads) without hand-renaming
columns.

Two public index forms exist and both are covered:

- **Columnar index** (``cc-index/table/...`` parquet, the schema
  published at commoncrawl.org/access-the-data): columns already
  carry this engine's contract names (``warc_filename``,
  ``warc_record_offset``, ``warc_record_length``) plus the filter
  columns (``url``, ``url_host_*``, ``fetch_status``,
  ``content_mime_type``/``content_mime_detected``,
  ``content_languages``, ``crawl``/``subset`` partitions).
  ``read_cc_index`` validates the contract columns, normalizes the
  offset/length types to long, and compiles the common filters to
  plain Catalyst predicates — every one pushes down to the parquet
  scan and the ``crawl=``/``subset=`` equality prunes partitions at
  the file listing (the index layout is partitioned by exactly those
  two keys).
- **CDXJ index** (``cc-index/collections/.../indexes/cdx-*.gz`` —
  the text form ZipNum/pywb serve): lines of
  ``<surt> <timestamp> <json>``. ``read_cc_cdxj`` parses the JSON
  tail with ``from_json`` (one codegen pass, no python) and RENAMES
  the JSON fields (``filename``/``offset``/``length``/``status``/
  ``mime``…) onto the SAME contract columns, so downstream code is
  identical whichever index form the user has.

Scale shape: both functions are scans + row-local projections — the
filters the user writes are the ones doing the 100 TB work (a crawl's
columnar index is ~300 GB; a filtered slice is MBs), and the output
feeds contracts that open only the files/byte-ranges the slice names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_cc_cdxj", "read_cc_index"]

#: Columns the pruning contracts require of any index frame.
CONTRACT_COLUMNS = (
    "warc_filename",
    "warc_record_offset",
    "warc_record_length",
)

#: The CDXJ json payload fields (public pywb/ZipNum convention) and
#: the columnar-index names they normalize to.
_CDXJ_SCHEMA = (
    "url string, filename string, offset string, length string, "
    "status string, mime string, `mime-detected` string, digest string, "
    "languages string, charset string, redirect string"
)


def read_cc_index(
    spark: SparkSession,
    path: str,
    crawl: str | None = None,
    subset: str | None = None,
    status: int | None = None,
    mime: str | None = None,
    mime_detected: str | None = None,
    url_host_suffix: str | None = None,
    languages: str | None = None,
    where: str | None = None,
) -> DataFrame:
    """The columnar (parquet) Common Crawl index, filtered and ready
    for ``read_warc(index=...)`` / ``read_warc_ranges``.

    Filter kwargs compile to pushdown predicates: ``crawl``/``subset``
    prune the partition listing (the public layout partitions by
    both), ``status`` matches ``fetch_status``, ``mime`` /
    ``mime_detected`` the two mime columns, ``url_host_suffix`` the
    registered domain or host-name tail, ``languages`` a contained
    language code, ``where`` any extra SQL boolean. Raises if the
    contract columns are missing — a wrong path should fail loudly,
    not prune nothing."""
    df = spark.read.parquet(path)
    missing = [c for c in CONTRACT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"not a cc-index table (missing {missing}); columns = "
            f"{df.columns}"
        )
    df = df.withColumns(
        {
            "warc_record_offset": F.col("warc_record_offset").cast("long"),
            "warc_record_length": F.col("warc_record_length").cast("long"),
        }
    )
    if crawl is not None:
        df = df.where(F.col("crawl") == crawl)
    if subset is not None:
        df = df.where(F.col("subset") == subset)
    if status is not None:
        df = df.where(F.col("fetch_status") == int(status))
    if mime is not None:
        df = df.where(F.col("content_mime_type") == mime)
    if mime_detected is not None:
        df = df.where(F.col("content_mime_detected") == mime_detected)
    if url_host_suffix is not None:
        host_cols = [
            c
            for c in ("url_host_registered_domain", "url_host_name")
            if c in df.columns
        ]
        if not host_cols:
            # A NULL host would silently drop every row — same
            # fail-loudly contract as the offset columns above.
            raise ValueError(
                "read_cc_index: url_host_suffix= needs "
                "url_host_registered_domain or url_host_name; "
                f"table has neither (columns: {df.columns})"
            )
        host = F.coalesce(*[F.col(c) for c in host_cols])
        suffix = url_host_suffix.lstrip(".")
        df = df.where(
            (host == suffix) | host.endswith("." + suffix)
        )
    if languages is not None:
        df = df.where(
            F.array_contains(
                F.split(F.coalesce(F.col("content_languages"), F.lit("")), ","),
                languages,
            )
        )
    if where is not None:
        df = df.where(where)
    return df


def read_cc_cdxj(
    spark: SparkSession,
    path: str,
    status: int | None = None,
    mime: str | None = None,
) -> DataFrame:
    """The CDXJ (text) Common Crawl index normalized to the columnar
    contract names: ``url_surtkey``, ``fetch_time`` (raw 14-digit
    timestamp string), ``url``, ``fetch_status``,
    ``content_mime_type``, ``content_mime_detected``,
    ``content_digest``, ``content_languages``, ``warc_filename``,
    ``warc_record_offset``, ``warc_record_length``. Gzipped files
    read transparently (``spark.read.text`` inflates ``.gz``). One
    codegen projection: substring split + ``from_json`` — no python.

    Malformed lines (no JSON object, unparseable fields) yield NULL
    contract columns; filter ``warc_filename IS NOT NULL`` to drop
    them explicitly when salvaging a damaged index."""
    lines = spark.read.text(path)
    # "<surt> <ts> {json...}" — surt/ts never contain spaces; the json
    # starts at the first '{'
    brace = F.instr(F.col("value"), "{")
    head = F.split(F.substring(F.col("value"), 1, brace - 1), " ")
    j = F.from_json(F.expr("substring(value, instr(value, '{'))"), _CDXJ_SCHEMA)
    out = lines.where(brace > 0).select(
        head.getItem(0).alias("url_surtkey"),
        head.getItem(1).alias("fetch_time"),
        j["url"].alias("url"),
        j["status"].cast("int").alias("fetch_status"),
        j["mime"].alias("content_mime_type"),
        j["mime-detected"].alias("content_mime_detected"),
        j["digest"].alias("content_digest"),
        j["languages"].alias("content_languages"),
        j["filename"].alias("warc_filename"),
        j["offset"].cast("long").alias("warc_record_offset"),
        j["length"].cast("long").alias("warc_record_length"),
    )
    if status is not None:
        out = out.where(F.col("fetch_status") == int(status))
    if mime is not None:
        out = out.where(F.col("content_mime_type") == mime)
    return out
