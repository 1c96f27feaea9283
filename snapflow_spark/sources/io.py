"""Sources & sinks (SURVEY.md §2.B.1) — snapflow's Storage/DataFormat
layer collapsed onto Spark's unified reader/writer.

Snapflow needed a cost-weighted copy graph (dcp) to move blocks
between Records/pandas/CSV/DB formats [P kvh/dcp]; Spark reads and
writes every format natively and distributes the IO, so each helper
here is a thin, typed convenience over ``spark.read``/``df.write``.
All paths may be directories of part-files — that is what makes these
the 100 TB path (parallel readers/writers, no driver funnel).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def import_records(
    spark: SparkSession, records: Iterable[Mapping], schema: StructType | str | None = None
) -> DataFrame:
    """import_records (SURVEY §2.A A5): list-of-dicts -> DataFrame."""
    return spark.createDataFrame(list(records), schema=schema)


def import_dataframe(spark: SparkSession, pdf, schema: StructType | str | None = None) -> DataFrame:
    """import_dataframe (A5): pandas DataFrame -> DataFrame (Arrow path)."""
    return spark.createDataFrame(pdf, schema=schema)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options
) -> DataFrame:
    """CSV scan (A6) with schema inference when none is declared —
    matching snapflow's infer-on-import behavior."""
    opts = {"header": "true", **options}
    reader = spark.read.options(**opts)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", "true").csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(header="true", **options).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def _with_corrupt_col(schema: StructType | str, corrupt_col: str) -> StructType:
    from pyspark.sql.types import StringType, StructField

    base = (
        schema
        if isinstance(schema, StructType)
        else StructType.fromDDL(schema)
    )
    return StructType([*base.fields, StructField(corrupt_col, StringType())])


def read_jsonl_permissive(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSONL scan that SURVIVES bad records — the 100 TB ingest
    reality (web-scraped corpora carry truncated lines, stray bytes,
    schema drift): PERMISSIVE mode parses what it can, nulls the
    fields it can't, and lands each unparseable/ill-typed raw line in
    ``corrupt_col`` for quarantine instead of failing the job
    (FAILFAST) or silently shrinking it (DROPMALFORMED). A declared
    schema is REQUIRED — corrupt-record capture plus inference would
    re-scan and can widen types around the bad rows nondeterministically.
    Split the result with ``quarantine_corrupt``."""
    full = _with_corrupt_col(schema, corrupt_col)
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_csv_permissive(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """CSV twin of ``read_jsonl_permissive`` (same contract): rows
    with the wrong column count or un-castable values keep their raw
    line in ``corrupt_col``."""
    full = _with_corrupt_col(schema, corrupt_col)
    return (
        spark.read.schema(full)
        .options(header="true", **options)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )


def quarantine_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(good, bad) split of a permissive scan: ``good`` drops the
    corrupt column; ``bad`` keeps EVERY column (Spark disallows
    queries referencing ONLY the internal corrupt-record column of a
    raw file scan, so the quarantine side deliberately carries the
    parsed-as-null fields alongside the raw line — which is also what
    you want in a quarantine table: partial parses aid triage)."""
    from pyspark.sql import functions as F

    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull())
    return good, bad


def read_orc(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """ORC scan (§2.B.1) — the other columnar warehouse format. Spark's
    native ORC reader is vectorized and pushes predicates/column pruning
    into the stripe footers exactly like parquet, so a Hive-era ORC lake
    reads at full scan speed without conversion."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(**options).orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
    max_bytes: int | None = None,
) -> DataFrame:
    """Directory-of-files ingest for the multimodal column model:
    Spark's ``binaryFile`` source yields one row per file —
    ``(path, modificationTime, length, content binary)`` — which is
    exactly the opaque-binary + typed-metadata shape the decode /
    fingerprint / dedup family consumes (rename ``content`` to your
    blob column and go).  ``glob`` pushes a pathGlobFilter into the
    FILE LISTING (e.g. ``*.jpg`` never lists the sidecars), and
    ``max_bytes`` filters on the catalog ``length`` column — a
    metadata-only predicate, so oversized blobs are skipped without
    reading a byte of them.  At 100 TB the listing parallelizes over
    the driver's InMemoryFileIndex exactly like parquet discovery;
    one file = one row = one task unit, so millions of small files
    want an upstream compaction into parquet binary columns (this
    reader is the ON-RAMP that builds those)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= int(max_bytes))
    return df


def read_text_files(
    spark: SparkSession,
    path: str,
    whole: bool = False,
    glob: str | None = None,
    recursive: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Raw-text corpus on-ramp, the two classic layouts: one document
    per LINE of the files (default — jsonl-less text shards), or one
    document per FILE (``whole=True`` — the .txt-per-doc layout).
    Emits ``(path, text)``: the source file rides along as provenance
    (``input_file_name`` is free — it comes from the scan's own file
    split, no extra read).  ``glob`` prunes the listing
    (pathGlobFilter), ``line_sep`` overrides the record delimiter for
    \0- or \x1e-delimited shards.  Compression (.gz/.bz2/.zst per
    codec availability) inflates transparently — but note a gzip file
    is ONE split, so thousands of small .gz shards parallelize and
    one giant .gz does not (the WARC reader's member-gzip lesson)."""
    reader = spark.read.format("text")
    if whole:
        reader = reader.option("wholetext", "true")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    return reader.load(path).select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )


def avro_to_spark_schema(schema) -> StructType:
    """Writer-schema JSON (record root) → Spark StructType.  Unions
    are the nullable encoding ``["null", X]`` (or ``[X, "null"]``);
    anything with two non-null branches has no Spark column type and
    raises loudly.  enum→string, fixed/bytes→binary, int→int."""
    from pyspark.sql import types as T

    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }

    def conv(s) -> tuple:
        """(sparkType, nullable)."""
        if isinstance(s, list):
            branches = [b for b in s if b != "null"]
            if len(branches) != 1:
                raise NotImplementedError(
                    f"avro union {s} has no single Spark column type"
                )
            t, _ = conv(branches[0])
            return t, True
        t = s if isinstance(s, str) else s["type"]
        if t in prim:
            return prim[t], False
        if t in ("enum",):
            return T.StringType(), False
        if t == "fixed":
            return T.BinaryType(), False
        if t == "record":
            return (
                T.StructType(
                    [_field(f["name"], f["type"]) for f in s["fields"]]
                ),
                False,
            )
        if t == "array":
            it, inull = conv(s["items"])
            return T.ArrayType(it, inull), False
        if t == "map":
            vt, vnull = conv(s["values"])
            return T.MapType(T.StringType(), vt, vnull), False
        raise NotImplementedError(f"avro type {t!r} has no Spark mapping")

    def _field(name: str, s) -> "T.StructField":
        t, nullable = conv(s)  # nullable iff the type is a null-union
        return T.StructField(name, t, nullable)

    root = schema
    if isinstance(root, str) or root.get("type") != "record":
        raise ValueError(
            "read_avro_files: the writer schema root must be a record "
            f"(got {root if isinstance(root, str) else root.get('type')!r})"
        )
    return StructType([_field(f["name"], f["type"]) for f in root["fields"]])


def read_avro_files(
    spark: SparkSession,
    path: str,
    glob: str | None = "*.avro",
    recursive: bool = False,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Distributed Avro DATA on-ramp: one task per container file —
    `binaryFile` lists (glob-pruned) and ships each file's bytes to an
    executor, where the from-scratch codec (functions/avro_codec)
    decodes blocks and `mapInPandas` rows them out under the mapped
    Spark schema.  Schema: inferred from the FIRST file's writer
    schema (ONE driver header read, no block decode) unless `schema=`
    pins it.  The scale contract matches the WARC reader: a file is
    one task unit, so thousands of small .avro shards parallelize and
    one giant file does not; compact into parquet for anything hot
    (this reader is the on-ramp).  Rows ride the Arrow boundary once,
    at ingest."""
    import pandas as pd

    from snapflow_spark.functions.avro_codec import (
        read_avro_bytes,
        read_avro_header,
    )

    files = read_binary_files(spark, path, glob=glob, recursive=recursive)
    if schema is None:
        first = files.select("path").limit(1).collect()
        if not first:
            raise ValueError(
                f"read_avro_files: no files match {glob!r} under {path} "
                "(pass schema= to read a maybe-empty directory)"
            )
        local = first[0].path
        local = local[len("file:") :] if local.startswith("file:") else local
        out_schema = avro_to_spark_schema(read_avro_header(local))
    elif isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        out_schema = _parse_datatype_string(schema)
    else:
        out_schema = schema
    names = [f.name for f in out_schema.fields]

    def decode(batches):
        for pdf in batches:
            for p, blob in zip(pdf["path"], pdf["content"]):
                _schema, recs = read_avro_bytes(bytes(blob), str(p))
                yield pd.DataFrame(
                    {n: [r.get(n) for r in recs] for n in names},
                    columns=names,
                )

    return files.select("path", "content").mapInPandas(decode, out_schema)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC scan (snapflow's database storages). Partition options
    (partitionColumn/lowerBound/upperBound/numPartitions) turn one
    database cursor into N parallel range scans — required for any
    large table. No database ships in this sandbox, so this is a thin
    passthrough verified against Spark's own API only."""
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).options(**options).load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options) -> None:
    df.write.format("jdbc").option("url", url).option("dbtable", table).options(**options).mode(mode).save()


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_ranges: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned + sorted parquet layout — the DATA-SKIPPING
    write: rows are range-split across files on ``sort_cols`` and
    sorted within each, so every file/row-group carries tight,
    non-overlapping min/max stats on those columns. A later scan with
    a predicate on them skips whole row groups at the parquet footer
    (and whole files at planning) — on a 100 TB time-keyed table this
    is the difference between reading a day and reading the decade.
    (``write_zorder`` below is the multi-column generalization —
    Morton-interleaved sort key, tight stats on BOTH keys per file;
    single-key range layout stays the right default for time-series.)"""
    writer = df.repartitionByRange(
        *([n_ranges] if n_ranges else []), *sort_cols
    ).sortWithinPartitions(*sort_cols)
    writer.write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted parquet table — the CO-LOCATED join layout:
    two tables bucketed on the same keys with the same bucket count
    sort-merge-join with ZERO exchanges (each task reads bucket i of
    both sides), and groupBy on the bucket keys skips its shuffle too.
    At 100 TB this is how a repeatedly-joined fact/fact pair stops
    paying the shuffle on every query: pay it once at write time.
    Bucket metadata lives in the table catalog, so this is
    ``saveAsTable`` (pass ``path`` to keep the files external)."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def refresh_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """write_bucketed for a MANAGED table that may have a stale
    location: each Spark session starts a fresh in-memory metastore,
    so a warehouse dir left by a previous session raises
    LOCATION_ALREADY_EXISTS on create even though the catalog has no
    such table. Drop the catalog entry AND clear the orphaned
    location, then write, then return the bucketed scan."""
    spark = df.sparkSession
    drop_table_and_location(spark, table)
    write_bucketed(df, table, bucket_cols, n_buckets, sort_cols=sort_cols)
    return spark.table(table)


def drop_table_and_location(spark, table: str) -> None:
    """Drop a managed table AND its (possibly orphaned) warehouse dir —
    required before any managed-table overwrite in a fresh-metastore
    session (see refresh_bucketed's docstring)."""
    import shutil
    from pathlib import Path
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    leftover = Path(warehouse) / table.lower()
    if leftover.exists():
        shutil.rmtree(leftover)


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Hive-partitioned parquet sink — the 100 TB table layout: readers
    with a filter on the partition columns scan only matching
    directories (partition pruning at the file listing, before any IO).
    ``max_records_per_file`` caps file sizes so a skewed partition
    value still yields splittable files."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(*partition_by).parquet(path)


def _spread_bits_32_to_64(c):
    """Interleave-spread a 32-bit non-negative int into the even bit
    positions of a 64-bit long — the classic 5-step mask ladder, pure
    Column algebra (whole-stage codegen, no UDF)."""
    from pyspark.sql import functions as F

    c = c.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    c = c.bitwiseOR(F.shiftleft(c, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x3333333333333333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return c


def zorder_key(col_a, col_b):
    """64-bit Morton (Z-order) key of two non-negative 32-bit int
    columns: bits of ``col_a`` land in even positions, ``col_b`` in
    odd. Keys must be non-negative and < 2^32 (offset/bucket upstream
    if not) — documented contract, not checked per row (a check would
    add a branch to every row of a 100 TB write).

    NOTE: the returned long is the RAW interleave — when ``col_b``
    >= 2^31 its top bit lands on bit 63, so SIGNED comparison of this
    key is NOT unsigned Morton order. Sort/partition on
    ``zorder_sort_key`` instead (write_zorder does)."""
    from pyspark.sql import functions as F

    return _spread_bits_32_to_64(col_a).bitwiseOR(
        F.shiftleft(_spread_bits_32_to_64(col_b), 1)
    )


def _spread_bits_21_to_63(c):
    """Interleave-spread a 21-bit non-negative int so its bits land at
    positions 0, 3, 6, … of a 64-bit long — the Morton-3D mask ladder
    (same pure Column algebra as the 2-key ladder; whole-stage
    codegen, no UDF)."""
    from pyspark.sql import functions as F

    c = c.cast("long").bitwiseAND(F.lit(0x1FFFFF))
    c = c.bitwiseOR(F.shiftleft(c, 32)).bitwiseAND(F.lit(0x001F00000000FFFF))
    c = c.bitwiseOR(F.shiftleft(c, 16)).bitwiseAND(F.lit(0x001F0000FF0000FF))
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x100F00F00F00F00F))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x10C30C30C30C30C3))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x1249249249249249))
    return c


def zorder_key3(col_a, col_b, col_c):
    """63-bit Morton key of THREE non-negative 21-bit int columns:
    ``col_a`` lands at bit positions ≡0 (mod 3), ``col_b`` ≡1,
    ``col_c`` ≡2. Keys must be non-negative and < 2^21 (offset/bucket
    upstream if not) — the same documented, unchecked contract as
    ``zorder_key``. Unlike the 2-key interleave, the top bit is 62,
    so SIGNED long comparison IS unsigned Morton order — no sort-key
    sign remap needed."""
    from pyspark.sql import functions as F

    return (
        _spread_bits_21_to_63(col_a)
        .bitwiseOR(F.shiftleft(_spread_bits_21_to_63(col_b), 1))
        .bitwiseOR(F.shiftleft(_spread_bits_21_to_63(col_c), 2))
    )


def zorder_sort_key(col_a, col_b):
    """``zorder_key`` remapped for SIGNED comparison: XOR with the
    sign bit makes long ordering equal unsigned Morton ordering over
    the full 32-bit key domain. Without it a second key >= 2^31 flips
    the z sign, range partitioning wraps, and the file straddling the
    wrap spans the whole domain — silently defeating data skipping."""
    from pyspark.sql import functions as F

    return zorder_key(col_a, col_b).bitwiseXOR(F.lit(-(1 << 63)))


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_ranges: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-ORDERED parquet layout — write_range_sorted's multi-column
    generalization: rows are range-split and sorted on the Morton
    interleave of TWO key columns, so every file carries tight min/max
    ranges on BOTH keys simultaneously. A scan filtering on either key
    (or a box on both — the time×tenant / lat×lon shape) skips most
    files at the footer, where a single-key sort layout only skips for
    its leading key and reads everything for the other.

    The z-value is pure codegen (bit-mask ladder, no UDF), computed
    for the shuffle and dropped before the write — the stored schema
    is unchanged.

    2 keys interleave the full 32-bit domain each (``zorder_key``,
    sign-remapped for signed sorting); 3 keys interleave 21 bits each
    (``zorder_key3`` — a 63-bit key, so no sign remap is needed).
    Beyond 3, each key's resolution (16 bits at 4 keys) skips too
    coarsely to be worth the write — bucket the extra dimensions or
    pick the 3 most-filtered columns."""
    if len(cols) not in (2, 3):
        raise ValueError(
            "write_zorder interleaves 2 or 3 key columns; for more, "
            "bucket the extra dimensions into one key or choose the 3 "
            "most-selective columns"
        )
    from pyspark.sql import functions as F

    if len(cols) == 3:
        z = zorder_key3(F.col(cols[0]), F.col(cols[1]), F.col(cols[2]))
    else:
        z = zorder_sort_key(F.col(cols[0]), F.col(cols[1]))
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_ranges, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
