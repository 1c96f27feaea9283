"""Apache Iceberg table-layout bridge — read (and export) the open
Iceberg metadata format from scratch, no iceberg-spark runtime.

The second half of the open-table-format story (sources/delta.py is
the first): Iceberg's metadata tree is JSON at the root and AVRO
below —

    metadata/v<N>.metadata.json   table metadata: schemas, partition
                                  specs, snapshot list, current id
      └─ snapshot.manifest-list   Avro: one entry per manifest file
           └─ manifest .avro      Avro: one entry per DATA FILE with
                                  status, partition values, stats

so reading needs the from-scratch Avro object-container codec
(functions/avro_codec.py).  ``read_iceberg`` resolves the current (or
``snapshot_id=``-selected) snapshot, walks manifest-list → manifests,
keeps live entries (status != DELETED), prunes the file list on
``partition_filter`` against identity-transform partition values, and
scans the surviving parquet with the schema mapped from Iceberg's
JSON types.  Unlike Delta, Iceberg DATA FILES CONTAIN every column
(partition columns included), so no literal re-attachment happens.

``write_iceberg`` exports a DataFrame as a valid format-version-1
table (unpartitioned spec — the export is an off-ramp, not a full
writer): parquet data files, a manifest per commit, a manifest list
per snapshot, ``v<N>.metadata.json`` + ``version-hint.text``.
Append keeps previous manifests in the new snapshot's list;
overwrite starts a fresh list (old snapshots stay readable — time
travel, same contract as write_delta).

**Row-level deletes read** (round 13): v2 POSITION deletes (DELETE
manifests → ``(file_path, pos)`` parquet) apply as a distributed
anti-join on the scan's ``_metadata.file_path``/``row_index``; v2
EQUALITY deletes (``equality_ids`` columns) apply null-safe, scoped
by DATA SEQUENCE NUMBER — each delete anti-joins only onto data
files with a strictly smaller sequence, so rows written after the
delete survive.

**Format-version 3 READ tier** (round 16): v3 metadata opens, and
puffin DELETION VECTORS (``deletion-vector-v1`` blobs — the same
64-bit portable RoaringBitmapArray serialization Delta DVs use,
decoded executor-side in mapInPandas) apply per referenced data
file.  v3 WRITES refuse loudly (row-lineage assignment is out of
scope).

Loud-guard scope (never silently wrong): an equality delete without
a positive sequence number (unscopable), delete records inside DATA
manifests (and vice versa), format-version > 3 (and any v3 WRITE),
and partition filters naming unknown transforms all raise with the
feature named.  Metadata is O(#files), driver-side — the same cost
Iceberg's own planner pays before scan planning.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import NamedTuple

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series'
# type hints against this module's globals (PEP 563 annotations)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from snapflow_spark.sources.delta import hadoop_file_uri
from snapflow_spark.sources.iceberg_transforms import (
    _days,
    _micros,
    apply_transform,
    parse_transform,
)
from snapflow_spark.functions.avro_codec import (
    read_avro_file,
    write_avro_file,
)

__all__ = [
    "IcebergSnapshot",
    "IcebergStreamDataSource",
    "expire_iceberg_snapshots",
    "iceberg_snapshot",
    "iceberg_stream_sink",
    "remove_orphan_iceberg_files",
    "read_iceberg",
    "snapshot_store_to_iceberg",
    "write_iceberg",
]

_STATUS_ADDED = 1
_STATUS_DELETED = 2

_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "time": T.LongType(),  # µs since midnight — no Spark TIME type
    "timestamptz": T.TimestampType(),
    "timestamp": T.TimestampNTZType(),
    # v3 nanosecond timestamps: Spark has no ns type — µs truncation
    # on read, the same documented caveat as events.ts in TESTDATA
    "timestamptz_ns": T.TimestampType(),
    "timestamp_ns": T.TimestampNTZType(),
}


def _spark_type(t) -> T.DataType:
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        m = re.fullmatch(r"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        if re.fullmatch(r"fixed\[\d+\]", t):
            return T.BinaryType()
        raise NotImplementedError(f"read_iceberg: schema type {t!r}")
    k = t["type"]
    if k == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"], _spark_type(f["type"]), not f["required"]
                )
                for f in t["fields"]
            ]
        )
    if k == "list":
        return T.ArrayType(
            _spark_type(t["element"]), not t["element-required"]
        )
    if k == "map":
        return T.MapType(
            _spark_type(t["key"]),
            _spark_type(t["value"]),
            not t["value-required"],
        )
    raise NotImplementedError(f"read_iceberg: schema type {k!r}")


@dataclass
class IcebergSnapshot:
    path: str
    snapshot_id: int | None
    schema: T.StructType
    #: default-spec partition fields: [(name, transform)]
    partition_fields: list[tuple[str, str]]
    #: live data files: (resolved path, partition values dict, rows,
    #: decoded column bounds {name: (lo, hi)})
    files: list[tuple[str, dict, int, dict]]
    metadata: dict = field(default_factory=dict)
    #: resolved paths of v2 POSITION-delete parquet files live in this
    #: snapshot (rows of (file_path, pos) naming deleted data rows)
    position_deletes: list = field(default_factory=list)
    #: resolved data-file path -> the metadata-recorded URI (what
    #: position-delete rows key their file_path column by)
    file_uris: dict = field(default_factory=dict)
    #: v2 EQUALITY deletes live in this snapshot:
    #: (resolved path, [column names], delete data-sequence-number);
    #: each applies only to data files with a SMALLER sequence number
    equality_deletes: list = field(default_factory=list)
    #: resolved data-file path -> its data sequence number (0 when
    #: the table predates sequence numbers)
    file_seqs: dict = field(default_factory=dict)
    #: v3 DELETION VECTORS live in this snapshot: (referenced data
    #: file URI as recorded, resolved puffin path, blob offset, blob
    #: size) — each names deleted row positions of exactly ONE file
    dv_deletes: list = field(default_factory=list)


#: Iceberg single-value binary serialization decoders, by schema type
#: (the manifest lower_bounds/upper_bounds value encoding).  Bounds of
#: types outside this map are ignored — absence of a bound can only
#: disable skipping, never change results.
import struct as _struct


def _decode_bound(type_str: str, raw: bytes):
    if type_str == "long" and len(raw) == 8:
        return _struct.unpack("<q", raw)[0]
    if type_str == "int" and len(raw) == 4:
        return _struct.unpack("<i", raw)[0]
    if type_str == "double" and len(raw) == 8:
        return _struct.unpack("<d", raw)[0]
    if type_str == "float" and len(raw) == 4:
        return _struct.unpack("<f", raw)[0]
    if type_str == "string":
        # spec: UTF-8; writers may TRUNCATE — a truncated lower is
        # still <= every value, a truncated-and-incremented upper is
        # still >= every value, so intersect logic stays safe
        return raw.decode("utf-8", "replace")
    return None


def _encode_bound(type_str: str, v):
    if type_str == "long":
        return _struct.pack("<q", int(v))
    if type_str == "int":
        return _struct.pack("<i", int(v))
    if type_str == "double":
        return _struct.pack("<d", float(v))
    if type_str == "string":
        return str(v).encode("utf-8")
    return None


def _bounds_entries(entries) -> dict:
    """lower/upper_bounds come off Avro as the Iceberg k/v-record
    ARRAY form (Avro maps need string keys, manifests key by field
    id); tolerate a plain dict too (hand-made fixtures)."""
    if isinstance(entries, dict):
        return {int(k): v for k, v in entries.items()}
    out = {}
    for e in entries or ():
        out[int(e["key"])] = e["value"]
    return out


def _metadata_path(table: Path) -> Path:
    md = table / "metadata"
    hint = md / "version-hint.text"
    if hint.exists():
        v = hint.read_text().strip()
        for cand in (md / f"v{v}.metadata.json", md / f"{v}.metadata.json"):
            if cand.exists():
                return cand
    best: tuple[int, Path] | None = None
    for p in md.glob("*.metadata.json") if md.is_dir() else ():
        m = re.match(r"v?(\d+)", p.name)
        n = int(m.group(1)) if m else -1
        if best is None or n > best[0] or (n == best[0] and p.name > best[1].name):
            best = (n, p)
    if best is None:
        raise FileNotFoundError(
            f"read_iceberg: no metadata/*.metadata.json under {table}"
        )
    return best[1]


def _localize(uri: str, location: str, table: Path) -> str:
    """Map a metadata-recorded absolute URI onto this checkout: paths
    under the recorded table ``location`` re-root onto ``table`` (the
    table may have been copied), file:// URIs drop the scheme, plain
    relative paths resolve against the table root."""
    if location and uri.startswith(location.rstrip("/") + "/"):
        rel = uri[len(location.rstrip("/")) + 1 :]
        return str(table / rel)
    if uri.startswith("file://"):
        return uri[len("file://") :]
    if "://" in uri:
        return uri  # a genuinely remote URI: hand it to Spark as-is
    if uri.startswith("/"):
        return uri
    return str(table / uri)


def _raw_schema_fields(meta: dict) -> list[dict]:
    """The current schema's raw field dicts (id/name/type) — the
    field-id -> (name, type) map bounds decoding needs."""
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for sc in meta["schemas"]:
            if sc.get("schema-id", 0) == sid:
                return list(sc["fields"])
        return []
    return list(meta.get("schema", {}).get("fields", []))


def _schema_from_metadata(meta: dict) -> T.StructType:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id", 0) == sid:
                return _spark_type(s)  # struct root
        raise ValueError(f"read_iceberg: current-schema-id {sid} not found")
    return _spark_type(meta["schema"])


def _default_spec_raw(meta: dict) -> list[dict]:
    """The default partition spec's raw field dicts (name, transform,
    source-id, field-id)."""
    specs = meta.get("partition-specs")
    if specs is not None:
        sid = meta.get("default-spec-id", 0)
        for s in specs:
            if s.get("spec-id", 0) == sid:
                return list(s["fields"])
        raise ValueError(f"read_iceberg: default-spec-id {sid} not found")
    return list(meta.get("partition-spec", []))


def _default_spec(meta: dict) -> list[tuple[str, str]]:
    return [(f["name"], f["transform"]) for f in _default_spec_raw(meta)]


def iceberg_snapshot(
    spark: SparkSession,
    path: str | os.PathLike,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    ref: str | None = None,
) -> IcebergSnapshot:
    if sum(x is not None for x in (snapshot_id, as_of_ms, ref)) > 1:
        raise ValueError(
            "read_iceberg: pass snapshot_id= OR as_of_ms= OR ref=, "
            "not several"
        )
    table = Path(path)
    meta = json.loads(_metadata_path(table).read_text())
    if ref is not None:
        # v2 refs: named branches/tags in metadata["refs"]
        refs = meta.get("refs") or {}
        if ref not in refs:
            raise ValueError(
                f"read_iceberg: ref {ref!r} not in the table's refs "
                f"{sorted(refs)}"
            )
        snapshot_id = int(refs[ref]["snapshot-id"])
    fv = int(meta.get("format-version", 1))
    if fv > 3:
        raise NotImplementedError(
            f"read_iceberg: format-version {fv} (v1/v2 fully + the v3 "
            "READ tier — metadata and puffin deletion vectors — are "
            "implemented)"
        )
    location = meta.get("location", "")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if as_of_ms is not None:
        # time travel by time: the newest snapshot committed at or
        # before the probe (Iceberg's own timestamp-ms lineage)
        eligible = [
            s
            for s in meta.get("snapshots", [])
            if int(s.get("timestamp-ms") or 0) <= int(as_of_ms)
        ]
        if not eligible:
            raise ValueError(
                f"read_iceberg: no snapshot at or before as_of_ms="
                f"{as_of_ms} (earliest is "
                f"{min((s.get('timestamp-ms') for s in snaps.values()), default=None)})"
            )
        snapshot_id = max(
            eligible, key=lambda s: (int(s.get("timestamp-ms") or 0),)
        )["snapshot-id"]
    want = (
        snapshot_id
        if snapshot_id is not None
        else meta.get("current-snapshot-id")
    )
    schema = _schema_from_metadata(meta)
    part_fields = _default_spec(meta)
    if want is None or want == -1 or not snaps:
        return IcebergSnapshot(
            str(table), None, schema, part_fields, [], meta
        )
    if want not in snaps:
        raise ValueError(
            f"read_iceberg: snapshot {want} not in metadata "
            f"(have {sorted(snaps)})"
        )
    snap = snaps[want]

    #: (manifest uri, its data sequence number — 0 pre-v2)
    manifest_uris: list[tuple[str, int]] = []
    delete_manifest_uris: list[tuple[str, int]] = []
    if "manifest-list" in snap:
        ml_path = _localize(snap["manifest-list"], location, table)
        _, entries = read_avro_file(ml_path)
        for e in entries:
            content = int(e.get("content") or 0)
            seq = int(e.get("sequence_number") or 0)
            if content == 0:
                manifest_uris.append((e["manifest_path"], seq))
            elif content == 1:  # v2 DELETE manifest: walked below
                delete_manifest_uris.append((e["manifest_path"], seq))
            else:
                raise NotImplementedError(
                    f"read_iceberg: manifest content {content} in the "
                    "manifest list (0=data and 1=deletes are the spec)"
                )
    else:  # ancient v1 form: manifests inlined on the snapshot
        manifest_uris = [(m, 0) for m in snap.get("manifests", [])]

    field_defs = _raw_schema_fields(meta)
    names_by_id = {
        int(f["id"]): f["name"]
        for f in field_defs
        if f.get("id") is not None
    }

    # v2 delete files.  POSITION deletes: parquet rows of (file_path,
    # pos) naming deleted data rows by the metadata-recorded URI +
    # row index — applied by exact file_path match, safe because
    # Iceberg writers never reuse data-file paths (UUID names), so
    # sequence scoping cannot change the result.  EQUALITY deletes:
    # parquet rows of the `equality_ids` columns; each applies only
    # to data files with a STRICTLY SMALLER data sequence number
    # (rows written after the delete must survive), so a delete
    # without a positive sequence number raises rather than silently
    # matching nothing or everything.
    pos_deletes: list[str] = []
    eq_deletes: list[tuple[str, list[str], int]] = []
    dv_deletes: list[tuple[str, str, int, int]] = []
    for muri, mseq in delete_manifest_uris:
        _, entries = read_avro_file(_localize(muri, location, table))
        for e in entries:
            if int(e.get("status") or 0) == _STATUS_DELETED:
                continue
            rec = e["data_file"]
            content = int(rec.get("content") or 0)
            if content not in (1, 2):
                raise ValueError(
                    "read_iceberg: non-delete entry (content="
                    f"{content}) inside a DELETE manifest"
                )
            fmt = str(rec.get("file_format", "PARQUET")).upper()
            if content == 1 and fmt == "PUFFIN":
                # v3 DELETION VECTOR: a puffin blob of deleted row
                # positions for exactly ONE referenced data file,
                # located by the manifest's offset/size (no footer
                # parse needed)
                ref = rec.get("referenced_data_file")
                if not ref:
                    raise ValueError(
                        "read_iceberg: puffin deletion vector "
                        f"{rec.get('file_path')!r} without "
                        "referenced_data_file"
                    )
                dv_deletes.append(
                    (
                        str(ref),
                        _localize(rec["file_path"], location, table),
                        int(rec.get("content_offset") or 0),
                        int(rec.get("content_size_in_bytes") or 0),
                    )
                )
                continue
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"read_iceberg: delete file format {fmt}"
                )
            if content == 1:
                pos_deletes.append(
                    _localize(rec["file_path"], location, table)
                )
                continue
            dseq = int(e.get("sequence_number") or mseq or 0)
            if dseq <= 0:
                raise ValueError(
                    "read_iceberg: equality delete file "
                    f"{rec.get('file_path')!r} carries no positive "
                    "sequence number — it cannot be scoped to the "
                    "data files it predates"
                )
            ids = rec.get("equality_ids") or []
            if not ids:
                raise ValueError(
                    "read_iceberg: equality delete file "
                    f"{rec.get('file_path')!r} without equality_ids"
                )
            cols = []
            for fid in ids:
                if int(fid) not in names_by_id:
                    raise ValueError(
                        f"read_iceberg: equality_ids field {fid} not "
                        "in the table schema"
                    )
                cols.append(names_by_id[int(fid)])
            eq_deletes.append(
                (_localize(rec["file_path"], location, table), cols, dseq)
            )
    files: list[tuple[str, dict, int, dict]] = []
    file_uris: dict[str, str] = {}
    file_seqs: dict[str, int] = {}
    for muri, mseq in manifest_uris:
        _, entries = read_avro_file(_localize(muri, location, table))
        for e in entries:
            if int(e.get("status") or 0) == _STATUS_DELETED:
                continue
            df_rec = e["data_file"]
            if int(df_rec.get("content") or 0) != 0:
                raise NotImplementedError(
                    "read_iceberg: delete file inside a DATA manifest "
                    "(the spec keys delete files by manifest "
                    "content=1 in the manifest list)"
                )
            fmt = str(df_rec.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"read_iceberg: data file format {fmt} (PARQUET is "
                    "implemented)"
                )
            bounds: dict = {}
            lo_by_id = _bounds_entries(df_rec.get("lower_bounds"))
            hi_by_id = _bounds_entries(df_rec.get("upper_bounds"))
            if lo_by_id or hi_by_id:
                for fdef in field_defs:
                    fid = fdef.get("id")
                    tstr = fdef.get("type")
                    if not isinstance(tstr, str):
                        continue
                    lo = (
                        _decode_bound(tstr, lo_by_id[fid])
                        if fid in lo_by_id
                        else None
                    )
                    hi = (
                        _decode_bound(tstr, hi_by_id[fid])
                        if fid in hi_by_id
                        else None
                    )
                    if lo is not None or hi is not None:
                        bounds[fdef["name"]] = (lo, hi)
            local = _localize(df_rec["file_path"], location, table)
            file_uris[local] = df_rec["file_path"]
            file_seqs[local] = int(e.get("sequence_number") or mseq or 0)
            files.append(
                (
                    local,
                    dict(df_rec.get("partition") or {}),
                    int(df_rec.get("record_count") or 0),
                    bounds,
                )
            )
    return IcebergSnapshot(
        str(table),
        int(want),
        schema,
        part_fields,
        sorted(files),
        meta,
        position_deletes=pos_deletes,
        file_uris=file_uris,
        equality_deletes=eq_deletes,
        file_seqs=file_seqs,
        dv_deletes=dv_deletes,
    )


def _decode_puffin_dv(path: str, offset: int, size: int) -> list[int]:
    """Decode one v3 ``deletion-vector-v1`` puffin blob into sorted
    deleted row positions.  The blob layout (Iceberg spec v3): a
    4-byte BIG-endian length of (magic + vector), the 4-byte magic
    ``D1 D3 39 64`` — which is exactly the portable
    RoaringBitmapArray magic 1681511377 little-endian, the same
    64-bit portable serialization Delta deletion vectors use — the
    vector bytes, then a 4-byte BE CRC-32 of (magic + vector).
    Decoding reuses the Delta codec verbatim."""
    import zlib

    from snapflow_spark.sources.deletion_vectors import (
        _MAGIC,
        decode_dv_data,
    )

    with open(path, "rb") as fh:
        fh.seek(int(offset))
        blob = fh.read(int(size))
    if len(blob) >= 8 and int.from_bytes(blob[4:8], "little") == _MAGIC:
        declared = int.from_bytes(blob[:4], "big")
        payload = blob[4 : 4 + declared]
        if len(payload) != declared:
            raise ValueError(
                f"puffin deletion vector {path!r}: declared length "
                f"{declared} exceeds the blob ({len(blob)} bytes)"
            )
        crc_end = 4 + declared + 4
        if len(blob) >= crc_end:
            want = int.from_bytes(blob[4 + declared : crc_end], "big")
            got = zlib.crc32(payload) & 0xFFFFFFFF
            if want != got:
                raise ValueError(
                    f"puffin deletion vector {path!r}: CRC mismatch "
                    f"(stored {want}, computed {got})"
                )
    elif int.from_bytes(blob[:4], "little") == _MAGIC:
        payload = blob  # bare vector (no length/CRC framing)
    else:
        raise ValueError(
            f"puffin deletion vector {path!r}: no portable-roaring "
            "magic at the manifest-recorded offset"
        )
    return decode_dv_data(payload)


def read_iceberg(
    spark: SparkSession,
    path: str | os.PathLike,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
    min_max_filter: dict | None = None,
    as_of_ms: int | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Read an Iceberg-layout table.  ``snapshot_id=`` time-travels;
    ``as_of_ms=`` time-travels by time (the newest snapshot whose
    ``timestamp-ms`` is at or before the probe);
    ``partition_filter={field: value}`` prunes the FILE LIST against
    the manifests' partition values.  The key may be the partition
    FIELD name (``ts_day``) or the SOURCE column name (``ts``); the
    probe value runs through the spec transform the writer used —
    identity, ``bucket[N]`` (spec Appendix B murmur3 hashing),
    ``truncate[W]``, ``year``/``month``/``day``/``hour`` — and files
    whose stored partition value differs are dropped.  For identity
    specs this is exact; for the others it is a PRUNE: kept files
    still hold other rows from the same bucket/window, so callers
    apply the real predicate on the result (the min_max_filter
    contract).  Temporal probes accept date/datetime, ISO strings, or
    the internal int forms.  Unknown transforms (``void``, future
    spec additions) raise.
    ``ref=`` time-travels by NAMED REF (v2 branches/tags in the
    metadata's ``refs`` map — see ``tag_iceberg_snapshot``).
    ``min_max_filter={col: (lo, hi)}`` prunes on the manifests'
    lower/upper_bounds (the spec's single-value binary serialization,
    decoded for int/long/float/double/string): a file is dropped only
    when its recorded range provably misses [lo, hi]; files without
    bounds are always kept — skipping is an optimization, never a
    filter (the same contract as read_delta)."""
    snap = iceberg_snapshot(
        spark, path, snapshot_id=snapshot_id, as_of_ms=as_of_ms,
        ref=ref,
    )
    expected: dict = {}  # partition-field name -> transformed probe
    if partition_filter:
        spec_fields = _default_spec_raw(snap.metadata)
        src_by_id = {
            f["id"]: f for f in _raw_schema_fields(snap.metadata)
        }
        for k, probe in partition_filter.items():
            match = [f for f in spec_fields if f["name"] == k]
            if not match:
                # fall back to the SOURCE column name (the natural
                # key when the spec field is e.g. 'ts_day' over 'ts')
                match = [
                    f
                    for f in spec_fields
                    if (src_by_id.get(f.get("source-id")) or {}).get(
                        "name"
                    )
                    == k
                ]
            if not match:
                raise ValueError(
                    f"read_iceberg: partition_filter field {k!r} not in "
                    f"the default spec "
                    f"{sorted(f['name'] for f in spec_fields)}"
                )
            if len(match) > 1:
                raise ValueError(
                    f"read_iceberg: partition_filter key {k!r} matches "
                    f"{len(match)} spec fields "
                    f"{[f['name'] for f in match]} — name the partition "
                    "field explicitly"
                )
            sf = match[0]
            transform = sf["transform"]
            src = src_by_id.get(sf.get("source-id"))
            src_type = (src or {}).get("type")
            if transform == "identity":
                expected[sf["name"]] = (probe, src_type)
                continue
            if not isinstance(src_type, str):
                raise NotImplementedError(
                    f"read_iceberg: partition_filter on {k!r}: source "
                    f"field id {sf.get('source-id')} has non-primitive "
                    f"type {src_type!r}"
                )
            expected[sf["name"]] = (
                apply_transform(transform, src_type, probe),
                None,
            )

    def _prune_eq(stored, want, src_type) -> bool | None:
        """True/False when the stored manifest value and the probe
        are comparable; None when their representations are not
        (externally written tables store e.g. identity dates as Avro
        int days, truncate[W] decimals as bytes) — the caller KEEPS
        the file then, because pruning is an optimization and must
        never drop rows on a representation mismatch."""
        if stored is None or want is None:
            return stored is None and want is None
        # identity temporal values: coerce BOTH sides onto the
        # internal int form (days / micros from epoch)
        if src_type == "date":
            try:
                return _days(stored) == _days(want)
            except (TypeError, ValueError):
                return None
        if isinstance(src_type, str) and src_type.startswith(
            "timestamp"
        ):
            try:
                return _micros(stored) == _micros(want)
            except (TypeError, ValueError):
                return None
        if isinstance(stored, bool) != isinstance(want, bool):
            return None
        if isinstance(stored, (int, float)) and isinstance(
            want, (int, float)
        ):
            return stored == want
        if type(stored) is not type(want):
            return None  # incomparable representations: keep
        return stored == want

    def keep(pv: dict) -> bool:
        for k, (want, src_type) in expected.items():
            if k not in pv:
                # a file written under an OLDER partition spec has no
                # value for this field: unprunable, keep it — pruning
                # is an optimization, never allowed to drop rows
                continue
            if _prune_eq(pv.get(k), want, src_type) is False:
                return False
        return True

    def bounds_keep(bounds: dict) -> bool:
        if not bounds or not min_max_filter:
            return True
        for c, (lo, hi) in min_max_filter.items():
            mn, mx = bounds.get(c, (None, None))
            if lo is not None and mx is not None and mx < lo:
                return False
            if hi is not None and mn is not None and mn > hi:
                return False
        return True

    paths = [
        p for p, pv, _n, bd in snap.files if keep(pv) and bounds_keep(bd)
    ]
    if not paths:
        return spark.createDataFrame([], snap.schema)
    if (
        not snap.position_deletes
        and not snap.equality_deletes
        and not snap.dv_deletes
    ):
        return spark.read.schema(snap.schema).parquet(*paths)
    # v2 delete application.  POSITION deletes: delete rows key
    # (metadata-recorded file_path URI, row position); translate the
    # URIs onto the local file URIs the scan's _metadata.file_path
    # column reports (one tiny mapping row per kept data file), then
    # anti-join on (file, pos).  EQUALITY deletes: data files group
    # by their data sequence number; each delete anti-joins
    # (null-safe, the spec's equality semantics) ONLY onto groups
    # with a strictly smaller sequence — rows written after the
    # delete survive.  All joins run distributed; AQE broadcasts
    # small delete sides (the common shape) and falls back to a
    # shuffle join for huge delete sets, which is exactly the
    # degradation a 100 TB read wants.
    out_cols = [f.name for f in snap.schema.fields]
    pd_dels = None
    pd_sources: list[DataFrame] = []
    if snap.position_deletes:
        pd_sources.append(
            spark.read.parquet(*snap.position_deletes).select(
                "file_path", "pos"
            )
        )
    if snap.dv_deletes:
        # v3 deletion vectors: O(#DVs) descriptor rows fan out and
        # each blob decodes EXECUTOR-side inside mapInPandas (the
        # Delta DV discipline — the driver never holds decoded
        # indexes), yielding the same (file_path, pos) shape the
        # parquet position deletes use
        dv_src = spark.createDataFrame(
            [
                (ref, p, int(off), int(sz))
                for ref, p, off, sz in snap.dv_deletes
            ],
            "file_path string, __puffin string, __off long, "
            "__size long",
        )

        def _expand_dvs(batches):
            from snapflow_spark.sources.iceberg import (
                _decode_puffin_dv as _dpd,
            )

            for b in batches:
                for ref, p, off, sz in zip(
                    b["file_path"], b["__puffin"], b["__off"],
                    b["__size"],
                ):
                    idx = _dpd(p, int(off), int(sz))
                    for i in range(0, len(idx), 1 << 20):
                        chunk = idx[i : i + (1 << 20)]
                        yield pd.DataFrame(
                            {
                                "file_path": ref,
                                "pos": pd.array(chunk, dtype="int64"),
                            }
                        )

        n = min(
            len(snap.dv_deletes),
            spark.sparkContext.defaultParallelism,
        )
        pd_sources.append(
            dv_src.repartition(n).mapInPandas(
                _expand_dvs, "file_path string, pos long"
            )
        )
    if pd_sources:
        all_pd = pd_sources[0]
        for extra in pd_sources[1:]:
            all_pd = all_pd.unionByName(extra)
        mapping = spark.createDataFrame(
            [
                # _metadata.file_path is the Hadoop URI form
                # (file:/path single slash, %-encoded) — go through
                # the shared helper or files with spaces drop rows
                (snap.file_uris.get(p, p), hadoop_file_uri(p))
                for p in paths
            ],
            "file_path string, __pd_file string",
        )
        pd_dels = (
            all_pd
            .join(F.broadcast(mapping), "file_path")
            .select(
                F.col("__pd_file"),
                F.col("pos").alias("__pd_pos"),
            )
        )
    groups: dict[int, list[str]] = {}
    for p in paths:
        groups.setdefault(int(snap.file_seqs.get(p, 0)), []).append(p)
    pieces: list[DataFrame] = []
    for fseq, ps in sorted(groups.items()):
        df = spark.read.schema(snap.schema).parquet(*ps)
        if pd_dels is not None:
            df = (
                df.withColumn("__pd_file", F.col("_metadata.file_path"))
                .withColumn("__pd_pos", F.col("_metadata.row_index"))
                .join(pd_dels, ["__pd_file", "__pd_pos"], "left_anti")
                .select(*out_cols)
            )
        for dpath, cols, dseq in snap.equality_deletes:
            if dseq <= fseq:
                continue  # the delete predates this file's rows
            dd = (
                spark.read.parquet(dpath)
                .select(*cols)
                .dropDuplicates()
                .alias("__eqdel")
            )
            sc = df.alias("__eqdata")
            cond = None
            for c in cols:
                term = F.col(f"__eqdata.{c}").eqNullSafe(
                    F.col(f"__eqdel.{c}")
                )
                cond = term if cond is None else (cond & term)
            df = sc.join(dd, cond, "left_anti")
        pieces.append(df.select(*out_cols))
    result = pieces[0]
    for df in pieces[1:]:
        result = result.unionByName(df)
    return result


# ------------------------------------------------------------- export
def _manifest_entry_schema(
    part_fields: list[tuple[str, str]],
    include_seq: bool = False,
) -> dict:
    """The manifest-entry Avro schema with the given partition-record
    fields injected ([(name, avro primitive type)]; empty = the
    unpartitioned constant below).  ``include_seq`` adds the v2
    per-entry ``sequence_number`` field (EXISTING entries in a
    rewritten manifest must carry their ORIGINAL data sequence
    explicitly — inheritance would re-stamp them)."""
    import copy

    schema = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
    data_file_field = next(
        f for f in schema["fields"] if f["name"] == "data_file"
    )
    rec = next(
        f for f in data_file_field["type"]["fields"]
        if f["name"] == "partition"
    )
    rec["type"]["fields"] = [
        {"name": n, "type": ["null", t], "default": None,
         "field-id": 1000 + i}
        for i, (n, t) in enumerate(part_fields)
    ]
    if include_seq:
        schema["fields"].insert(
            2,
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
        )
    return schema


_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None,
         "field-id": 1},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {
                        "name": "partition",
                        "field-id": 102,
                        "type": {"type": "record", "name": "r102",
                                 "fields": []},
                    },
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                    {"name": "block_size_in_bytes", "type": "long",
                     "field-id": 105},
                    {
                        "name": "lower_bounds",
                        "field-id": 125,
                        "default": None,
                        "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k126_v127",
                                "fields": [
                                    {"name": "key", "type": "int",
                                     "field-id": 126},
                                    {"name": "value", "type": "bytes",
                                     "field-id": 127},
                                ],
                            },
                        }],
                    },
                    {
                        "name": "upper_bounds",
                        "field-id": 128,
                        "default": None,
                        "type": ["null", {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k129_v130",
                                "fields": [
                                    {"name": "key", "type": "int",
                                     "field-id": 129},
                                    {"name": "value", "type": "bytes",
                                     "field-id": 130},
                                ],
                            },
                        }],
                    },
                ],
            },
        },
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        # content/sequence_number: v2 fields (0/null for v1 exports)
        # — carried so appends onto a table with DELETE manifests
        # (delete_from_iceberg) never degrade them into data
        # manifests
        {"name": "content", "type": "int", "default": 0,
         "field-id": 517},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 515},
        {"name": "added_snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 503},
    ],
}


_REV_PRIMITIVES = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BinaryType(): "binary",
    T.DateType(): "date",
    T.TimestampType(): "timestamptz",
    T.TimestampNTZType(): "timestamp",
}


def _iceberg_schema(schema: T.StructType) -> dict:
    """Spark → Iceberg JSON schema.  Round 16: NESTED columns export
    too — structs recurse with per-field ids, lists carry
    ``element-id``, maps ``key-id``/``value-id`` (ids assigned
    depth-first, unique across every level, the spec's never-shared
    rule); decimals map onto ``decimal(p,s)``.  The reader's
    ``_spark_type`` round-trips every shape emitted here."""
    counter = [0]

    def _next() -> int:
        counter[0] += 1
        return counter[0]

    def _conv(dt, where: str):
        if dt in _REV_PRIMITIVES:
            return _REV_PRIMITIVES[dt]
        if isinstance(dt, T.DecimalType):
            return f"decimal({dt.precision},{dt.scale})"
        if isinstance(dt, T.StructType):
            fields = []
            for f in dt.fields:
                fid = _next()
                fields.append(
                    {
                        "id": fid,
                        "name": f.name,
                        "required": not f.nullable,
                        "type": _conv(
                            f.dataType, f"{where}.{f.name}"
                        ),
                    }
                )
            return {"type": "struct", "fields": fields}
        if isinstance(dt, T.ArrayType):
            eid = _next()
            return {
                "type": "list",
                "element-id": eid,
                "element": _conv(dt.elementType, f"{where}[]"),
                "element-required": not dt.containsNull,
            }
        if isinstance(dt, T.MapType):
            kid, vid = _next(), _next()
            return {
                "type": "map",
                "key-id": kid,
                "key": _conv(dt.keyType, f"{where}<key>"),
                "value-id": vid,
                "value": _conv(dt.valueType, f"{where}<value>"),
                "value-required": not dt.valueContainsNull,
            }
        raise NotImplementedError(
            f"write_iceberg: column {where!r} type {dt} (primitive, "
            "decimal, struct, array and map columns are the export "
            "scope)"
        )

    fields = []
    for f in schema.fields:
        fid = _next()
        fields.append(
            {
                "id": fid,
                "name": f.name,
                "required": not f.nullable,
                "type": _conv(f.dataType, f.name),
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _max_field_id(fields) -> int:
    """The highest field id ANYWHERE in an Iceberg schema's field
    list (nested struct/list/map ids included) — merge_schema's
    never-reuse floor."""
    best = 0

    def _walk_type(t):
        nonlocal best
        if not isinstance(t, dict):
            return
        if t.get("type") == "struct":
            for f in t.get("fields", []):
                if f.get("id") is not None:
                    best = max(best, int(f["id"]))
                _walk_type(f.get("type"))
        elif t.get("type") == "list":
            if t.get("element-id") is not None:
                best = max(best, int(t["element-id"]))
            _walk_type(t.get("element"))
        elif t.get("type") == "map":
            for k in ("key-id", "value-id"):
                if t.get(k) is not None:
                    best = max(best, int(t[k]))
            _walk_type(t.get("key"))
            _walk_type(t.get("value"))

    _walk_type({"type": "struct", "fields": list(fields)})
    return best


_PART_AVRO_TYPES = {
    "int": "int",
    "long": "long",
    "string": "string",
    "boolean": "boolean",
}

#: source types whose bucket serialization is the 8-byte LE long of
#: their internal value (spec Appendix B: int/long widen, temporal
#: types hash days/micros from epoch, time hashes micros-of-day)
_BUCKET_LONG_SRC = {
    "int", "long", "date", "time",
    "timestamp", "timestamptz", "timestamp_ns", "timestamptz_ns",
}


class _PartField(NamedTuple):
    """One resolved partition-spec field for WRITE-side staging:
    the manifest field name, the source DataFrame column, the spec
    transform string, the source's Iceberg type, and the Avro
    primitive of the TRANSFORM RESULT (what the manifest partition
    record stores: bucket -> int, truncate -> source type,
    year/month/day/hour -> int)."""

    name: str
    source: str
    transform: str
    src_type: str
    avro: str


def _result_avro(transform: str, src_type: str) -> str:
    """The Avro primitive the manifests store for one (transform,
    source type) pair; raises NotImplementedError outside the
    stageable set (the loud-refusal contract)."""
    name, _arg = parse_transform(transform)
    if name == "identity":
        if src_type in _PART_AVRO_TYPES:
            return _PART_AVRO_TYPES[src_type]
        raise NotImplementedError(
            f"iceberg write: identity partitioning over source type "
            f"{src_type!r}; supported: {sorted(_PART_AVRO_TYPES)}"
        )
    if name == "bucket":
        if src_type in _BUCKET_LONG_SRC or src_type == "string":
            return "int"
        raise NotImplementedError(
            f"iceberg write: bucket partitioning over source type "
            f"{src_type!r}; supported: "
            f"{sorted(_BUCKET_LONG_SRC | {'string'})}"
        )
    if name == "truncate":
        if src_type in ("int", "long", "string"):
            return _PART_AVRO_TYPES[src_type]
        raise NotImplementedError(
            f"iceberg write: truncate partitioning over source type "
            f"{src_type!r}; supported: int, long, string"
        )
    if name in ("year", "month", "day", "hour"):
        if src_type == "date" and name != "hour":
            return "int"
        if src_type.startswith("timestamp"):
            return "int"
        raise NotImplementedError(
            f"iceberg write: {name!r} partitioning over source type "
            f"{src_type!r} (date/timestamp sources only; 'hour' "
            "needs a timestamp)"
        )
    raise NotImplementedError(
        f"iceberg write: partition transform {transform!r}"
    )


def _fresh_field_name(source: str, transform: str) -> str:
    """Iceberg's conventional partition-field naming for
    engine-created specs (``c_bucket``, ``c_trunc``, ``c_day``…)."""
    name, _arg = parse_transform(transform)
    if name == "identity":
        return source
    if name == "truncate":
        return f"{source}_trunc"
    return f"{source}_{name}"


def _murmur3_long_np(v):
    """Vectorized 32-bit MurmurHash3 of the spec's 8-byte LE long
    serialization (two 4-byte blocks, no tail) — numpy uint32
    wraparound arithmetic, verified value-for-value against the
    pinned scalar ``murmur3_x86_32`` in
    tests/test_iceberg_transforms.py.  Returns uint32 hashes."""
    import numpy as np

    u = np.asarray(v, dtype=np.int64).view(np.uint64)
    h = np.zeros(len(u), dtype=np.uint32)
    c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
    for blk in (u & np.uint64(0xFFFFFFFF), u >> np.uint64(32)):
        k = blk.astype(np.uint32)
        k = k * c1
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * c2
        h ^= k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h ^= np.uint32(8)  # length
    h ^= h >> np.uint32(16)
    h = h * np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h = h * np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h


def _bucket_long_udf(n: int):
    """Arrow-batched pandas UDF: spec bucket[N] of an internal-long
    column (int/long/date/timestamp sources pre-coerced JVM-side).
    The hot path is one numpy pass per batch — no per-row python."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _b(s: pd.Series) -> pd.Series:
        import numpy as np

        mask = s.isna().to_numpy()
        if s.dtype.kind == "f":
            # Defensive only — callers coalesce nulls JVM-side so the
            # batch arrives int64.  A float64 batch (nullable-long
            # promotion) is lossy above 2^53; route through pandas'
            # nullable Int64 so the payload never re-rounds.
            vals = s.astype("Int64").to_numpy(
                dtype=np.int64, na_value=0
            )
        else:
            vals = s.fillna(0).to_numpy(dtype=np.int64, copy=False)
        h = _murmur3_long_np(vals)
        out = pd.array(
            ((h & np.uint32(0x7FFFFFFF)) % np.uint32(int(n)))
            .astype("int32"),
            dtype="Int32",
        )
        out[mask] = pd.NA
        return pd.Series(out)

    return _b


def _bucket_str_udf(n: int):
    """Arrow-batched pandas UDF: spec bucket[N] over utf-8 string
    serialization (variable length — per-value murmur3 inside the
    Arrow batch)."""
    from pyspark.sql.functions import pandas_udf

    from snapflow_spark.sources.iceberg_transforms import (
        murmur3_x86_32 as _m3,
    )

    @pandas_udf("int")
    def _b(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else (_m3(str(v).encode("utf-8")) & 0x7FFFFFFF) % int(n),
            na_action="ignore",
        ).astype("Int32")

    return _b


def _internal_micros_col(col, src_type: str):
    """Epoch-micros Column for a timestamp source, matching
    ``iceberg_transforms._micros`` exactly: tz-carrying timestamps
    read their internal instant (``unix_micros``), NTZ timestamps
    decompose their wall clock as UTC (tz-independent codegen —
    pinned against the scalar reference in tests)."""
    if src_type in ("timestamptz", "timestamptz_ns"):
        return F.unix_micros(col)
    return (
        F.unix_date(F.to_date(col)).cast("long") * F.lit(86_400_000_000)
        + F.hour(col).cast("long") * F.lit(3_600_000_000)
        + F.minute(col).cast("long") * F.lit(60_000_000)
        + (F.date_part(F.lit("SECOND"), col) * F.lit(1_000_000)).cast(
            "long"
        )
    )


def _with_partition_value(df: DataFrame, pf: _PartField, out: str):
    """Attach column ``out`` = the spec transform of ``pf.source``.
    Everything except bucket is pure codegen (verified against the
    pinned scalar transforms, negatives and nulls included); bucket
    crosses to python ONCE per batch through a numpy-vectorized
    Arrow UDF — the only non-codegen partition math, paid on the
    partition column alone at write time."""
    c = F.col(pf.source)
    name, arg = parse_transform(pf.transform)
    t = pf.src_type
    if name == "identity":
        return df.withColumn(out, c)
    if name == "truncate":
        if t in ("int", "long"):
            return df.withColumn(
                out, (c - F.pmod(c, F.lit(int(arg)))).cast(t)
            )
        return df.withColumn(out, F.substring(c, 1, int(arg)))
    if name == "bucket":
        if t == "string":
            return df.withColumn(out, _bucket_str_udf(arg)(c))
        if t in ("int", "long", "time"):
            longs = c.cast("long")
        elif t == "date":
            longs = F.unix_date(c).cast("long")
        else:  # timestamp family
            longs = _internal_micros_col(c, t)
        # Null handling stays JVM-side: a nullable long batch crossing
        # Arrow->pandas is promoted to float64, which is lossy above
        # 2^53 and would silently mis-bucket (wrong manifests + rows
        # pruned away on filtered reads).  coalesce keeps the Arrow
        # batch null-free (pandas keeps int64 exactly); the null mask
        # is re-applied after the UDF.
        b = _bucket_long_udf(arg)(F.coalesce(longs, F.lit(0)))
        return df.withColumn(
            out,
            F.when(longs.isNull(), F.lit(None).cast("int")).otherwise(b),
        )
    # temporal transforms
    if t == "date":
        if name == "day":
            e = F.unix_date(c)
        elif name == "year":
            e = F.year(c) - F.lit(1970)
        else:  # month
            e = (F.year(c) - F.lit(1970)) * F.lit(12) + F.month(c) - F.lit(1)
        return df.withColumn(out, e.cast("int"))
    # timestamp sources: exact integer floor-division of epoch micros
    # (never through doubles — (m - pmod(m, d)) is exactly divisible,
    # so SQL DIV is exact floor for negatives too)
    tmp = f"__pv_micros_{uuid.uuid4().hex[:8]}"
    df = df.withColumn(tmp, _internal_micros_col(c, t))
    d = 3_600_000_000 if name == "hour" else 86_400_000_000
    days = F.expr(f"(`{tmp}` - pmod(`{tmp}`, {d})) DIV {d}")
    if name == "hour" or name == "day":
        e = days
    else:
        dt_col = F.date_add(F.lit("1970-01-01").cast("date"), days.cast("int"))
        if name == "year":
            e = F.year(dt_col) - F.lit(1970)
        else:  # month
            e = (F.year(dt_col) - F.lit(1970)) * F.lit(12) + F.month(
                dt_col
            ) - F.lit(1)
    return df.withColumn(out, e.cast("int")).drop(tmp)


def _guard_v3_write(meta: dict | None, what: str) -> None:
    """v3 commits must assign row lineage and write deletion
    vectors — out of the write tier's scope; refuse BEFORE staging
    anything."""
    if meta is not None and int(
        meta.get("format-version", 1) or 1
    ) >= 3:
        raise NotImplementedError(
            f"{what}: format-version 3 tables are READ-only in this "
            "engine (v3 commits must assign row lineage ids and "
            "write deletion vectors; the write tier targets v1/v2)"
        )


def _spec_pairs(meta: dict) -> list[tuple[str, str]]:
    """The default spec as [(source COLUMN name, transform)] — the
    shape ``write_iceberg(partition_by=)`` compares against."""
    by_id = {
        int(f["id"]): f["name"]
        for f in _raw_schema_fields(meta)
        if f.get("id") is not None
    }
    return [
        (by_id.get(int(sf["source-id"]), sf["name"]), sf["transform"])
        for sf in _default_spec_raw(meta)
    ]


def _spec_part_fields(meta: dict) -> list[_PartField]:
    """Resolve the table's default partition spec into write-stageable
    ``_PartField``s (raises NotImplementedError for transforms/types
    outside the stageable set — the loud-refusal contract).  Shared
    by upsert_iceberg / update_iceberg / rewrite_iceberg_files /
    _publish_delete_snapshot."""
    by_id = {
        int(f["id"]): f
        for f in _raw_schema_fields(meta)
        if f.get("id") is not None
    }
    out: list[_PartField] = []
    for sf in _default_spec_raw(meta):
        src = by_id.get(int(sf["source-id"]))
        if src is None or not isinstance(src.get("type"), str):
            raise NotImplementedError(
                f"iceberg write: partition field {sf.get('name')!r} "
                f"has source-id {sf.get('source-id')!r} with a "
                "missing or non-primitive source type"
            )
        t = src["type"]
        out.append(
            _PartField(
                name=sf["name"],
                source=src["name"],
                transform=sf["transform"],
                src_type=t,
                avro=_result_avro(sf["transform"], t),
            )
        )
    return out


#: Iceberg SQL transform-call names -> spec transform strings
#: (``days(ts)`` == the spec's ``day`` transform, etc.)
_SQL_TRANSFORM_NAMES = {
    "identity": "identity",
    "year": "year", "years": "year",
    "month": "month", "months": "month",
    "day": "day", "days": "day", "date": "day",
    "hour": "hour", "hours": "hour", "date_hour": "hour",
}


def _parse_partition_by(partition_by) -> list[tuple[str, str]] | None:
    """Normalize ``partition_by`` entries to [(source, transform)].
    Accepted forms: ``"col"`` (identity), ``("col", "bucket[4]")``
    pairs, and Iceberg's SQL transform-call strings —
    ``"bucket(4, col)"`` / ``"truncate(3, col)"`` / ``"days(col)"``
    / ``"years(col)"`` / ``"hours(col)"`` (plural and singular)."""
    if partition_by is None:
        return None
    out: list[tuple[str, str]] = []
    for e in partition_by:
        if isinstance(e, str):
            m = re.fullmatch(
                r"\s*(\w+)\s*\(\s*([^(),]+?)\s*\)\s*", e
            )
            m2 = re.fullmatch(
                r"\s*(bucket|truncate)\s*\(\s*(\d+)\s*,"
                r"\s*([^(),]+?)\s*\)\s*",
                e,
            )
            if m2:
                out.append(
                    (m2.group(3), f"{m2.group(1)}[{m2.group(2)}]")
                )
            elif m:
                name = m.group(1).lower()
                if name not in _SQL_TRANSFORM_NAMES:
                    raise ValueError(
                        f"write_iceberg: unknown partition transform "
                        f"call {e!r} — bucket(N, col), "
                        "truncate(W, col), years/months/days/hours"
                        "(col), identity(col)"
                    )
                out.append((m.group(2), _SQL_TRANSFORM_NAMES[name]))
            else:
                out.append((e, "identity"))
        elif isinstance(e, (tuple, list)) and len(e) == 2:
            src, transform = e
            parse_transform(str(transform))  # syntax check
            out.append((str(src), str(transform)))
        else:
            raise ValueError(
                f"write_iceberg: partition_by entry {e!r} — expected "
                "a column name, a transform call string, or a "
                "(column, transform) pair"
            )
    return out


def _entry_bounds(ice_fields: list[dict], st: dict | None) -> tuple:
    """(lower_bounds, upper_bounds) k/v-record arrays for a data-file
    manifest entry, from the file's stats (already folded across row
    groups by the staging job's footer read), for exportable bound
    types.  Shared by write_iceberg and upsert_iceberg."""
    if not st:
        return None, None
    lo_out, hi_out = [], []
    mins = st.get("minValues") or {}
    maxs = st.get("maxValues") or {}
    for f in ice_fields:
        if f["name"] not in mins or f["name"] not in maxs:
            continue
        lo_b = _encode_bound(f["type"], mins[f["name"]])
        hi_b = _encode_bound(f["type"], maxs[f["name"]])
        if lo_b is not None and hi_b is not None:
            lo_out.append({"key": f["id"], "value": lo_b})
            hi_out.append({"key": f["id"], "value": hi_b})
    return (lo_out or None), (hi_out or None)


def _stage_data_files(
    spark: SparkSession,
    df: DataFrame,
    table: Path,
    part_fields: list[_PartField],
) -> list[tuple[str, int, int, dict | None, dict]]:
    """Stage ``df`` as parquet and move the parts under ``table/
    data/`` (the write_delta shape), returning one ``(rel path,
    bytes, rows, stats dict or None, typed partition values)`` tuple
    per non-empty file.  Partitions split through SHADOW columns
    carrying the spec TRANSFORM of each source column (identity =
    the column itself; bucket/truncate/temporal via
    ``_with_partition_value``), so the real columns stay in the data
    files (Iceberg files carry every column; hive layout would drop
    them) and the manifests record the transform-result values.
    Row counts + min/max stats come from ONE executor-side Spark job
    over the staged files (shared with write_delta), not O(#files)
    serial driver footer reads.  Shared by write_iceberg and
    upsert_iceberg/update_iceberg."""
    import shutil
    from urllib.parse import unquote as _unquote

    import pyarrow.parquet as pq

    from snapflow_spark.sources.delta import _distributed_file_stats

    data = table / "data"
    data.mkdir(parents=True, exist_ok=True)
    part_by = [pf.name for pf in part_fields]
    staging = table / f".staging-{uuid.uuid4().hex}"
    if part_by:
        stage_df = df
        shadow = [f"__part_{pf.name}" for pf in part_fields]
        for pf, s in zip(part_fields, shadow):
            stage_df = _with_partition_value(stage_df, pf, s)
        stage_df.write.mode("errorifexists").partitionBy(
            *shadow
        ).parquet(str(staging))
    else:
        df.write.mode("errorifexists").parquet(str(staging))

    _HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

    def _pv_of(p: Path) -> dict:
        """Typed partition values parsed from the staged file's hive
        dir segments (__part_<field>=value), typed by the TRANSFORM
        RESULT's avro primitive."""
        if not part_by:
            return {}
        raw: dict[str, str] = {}
        for seg in p.relative_to(staging).parts[:-1]:
            k, _, v = seg.partition("=")
            if k.startswith("__part_"):
                raw[k[len("__part_"):]] = v
        out: dict = {}
        for pf in part_fields:
            v = raw.get(pf.name)
            if v is None or v == _HIVE_NULL:
                out[pf.name] = None
            elif pf.avro in ("int", "long"):
                out[pf.name] = int(v)
            elif pf.avro == "boolean":
                out[pf.name] = v.lower() == "true"
            else:
                out[pf.name] = _unquote(v)
        return out

    # (rel path, bytes, rows, stats dict or None, partition values)
    moved: list[tuple[str, int, int, dict | None, dict]] = []
    try:
        staged = sorted(staging.rglob("*.parquet"))
        stats_map = _distributed_file_stats(
            spark, [str(p) for p in staged]
        )
        for i, p in enumerate(staged):
            st = stats_map.get(str(p))
            rows = (
                int(st["numRecords"])
                if st is not None
                else pq.ParquetFile(p).metadata.num_rows
            )
            if rows == 0:
                continue  # empty task output: never a manifest entry
            # flatten into data/: a task writes the SAME part name
            # under each partition dir, so prefix with an ordinal
            name = f"{i:05d}-{p.name}" if part_by else p.name
            target = data / name
            os.rename(p, target)
            moved.append(
                (f"data/{name}", target.stat().st_size, rows, st,
                 _pv_of(p))
            )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return moved


def write_iceberg(
    df: DataFrame,
    path: str | os.PathLike,
    mode: str = "append",
    extra_summary: dict | None = None,
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
    branch: str | None = None,
) -> int:
    """Export a DataFrame as one Iceberg format-version-1 commit;
    returns the new snapshot id.  ``append`` keeps previous manifests
    in the new snapshot's manifest list; ``overwrite`` starts a fresh
    list (old snapshots stay readable by ``snapshot_id=`` — the
    write_delta time-travel contract); ``error`` refuses an existing
    table.  ``extra_summary`` adds string key/value pairs to the
    snapshot's summary map (how real Iceberg streaming sinks record
    their committed batch ids — ``iceberg_stream_sink`` keys
    exactly-once on it).

    ``partition_by`` exports a partitioned spec: entries are either
    column names (identity) or ``(column, transform)`` pairs with
    any spec transform — ``bucket[N]`` (Appendix B murmur3, staged
    through a numpy-vectorized Arrow UDF), ``truncate[W]`` and
    ``year``/``month``/``day``/``hour`` (pure codegen, pinned
    against the scalar reference transforms).  Files split per
    TRANSFORM value, the manifests record the typed transform
    results, and ``read_iceberg(partition_filter=...)`` prunes the
    file list from metadata alone.  Unlike hive layout, Iceberg data
    files CONTAIN their partition columns — staging writes through
    shadow columns so the split happens without dropping the real
    ones.  Appends must match the table's existing partition spec
    (transforms included; ``partition_by=None`` adopts it).

    ``branch=`` (round 16 — the WAP write side): the commit bases on
    and advances THAT ref only, leaving ``main`` (and
    current-snapshot-id) untouched — a branch write is invisible to
    plain reads until ``fast_forward_iceberg`` publishes it.  A
    first write to an unknown branch forks from the current
    snapshot.  Read the branch back with
    ``read_iceberg(ref=branch)``."""
    import pyarrow.parquet as pq

    if mode not in ("append", "overwrite", "error"):
        raise ValueError(f"write_iceberg: unknown mode {mode!r}")
    table = Path(path)
    md = table / "metadata"
    data = table / "data"
    spark = df.sparkSession
    prev_meta: dict | None = None
    try:
        prev_meta = json.loads(_metadata_path(table).read_text())
    except FileNotFoundError:
        pass
    if prev_meta is not None and mode == "error":
        raise FileExistsError(
            f"write_iceberg: Iceberg table already exists at {table}"
        )
    _guard_v3_write(prev_meta, "write_iceberg")
    evolving = False
    if prev_meta is not None:
        prev_schema = _schema_from_metadata(prev_meta)
        if mode == "append" and prev_schema != df.schema:
            prefix_ok = [
                (f.name, f.dataType) for f in prev_schema.fields
            ] == [
                (f.name, f.dataType)
                for f in df.schema.fields[: len(prev_schema.fields)]
            ]
            if not (merge_schema and prefix_ok):
                raise ValueError(
                    "write_iceberg: append schema differs from the "
                    "table schema; use mode='overwrite' to replace "
                    "it, or merge_schema=True to add new columns"
                    if not merge_schema
                    else "write_iceberg: merge_schema appends may "
                    "only ADD columns after the table's existing ones"
                )
            evolving = True
    pairs = _parse_partition_by(partition_by)
    adopted_raw: list[dict] | None = None
    if prev_meta is not None and mode == "append":
        existing_pairs = _spec_pairs(prev_meta)
        if pairs is None:
            pairs = existing_pairs
        if pairs != existing_pairs:
            raise ValueError(
                f"write_iceberg: append with partition_by={pairs} "
                f"onto a table with spec {existing_pairs}"
            )
        adopted_raw = _default_spec_raw(prev_meta)
    elif prev_meta is not None and pairs is not None:
        # overwrite reproducing the table's spec shape (the
        # rewrite_iceberg_files compaction path): keep the existing
        # partition-field names and field-ids so pruning filters
        # written against the old spec keep matching
        if pairs == _spec_pairs(prev_meta):
            adopted_raw = _default_spec_raw(prev_meta)
    pairs = pairs or []
    part_fields: list[_PartField] = []
    df_fields = {f.name: f for f in df.schema.fields}
    for i, (src_col, transform) in enumerate(pairs):
        if src_col not in df_fields:
            raise ValueError(
                f"write_iceberg: partition column {src_col!r} not in "
                f"the DataFrame columns {list(df_fields)}"
            )
        ice_t = _iceberg_schema(
            T.StructType([df_fields[src_col]])
        )["fields"][0]["type"]
        try:
            avro = _result_avro(transform, ice_t)
        except NotImplementedError as e:
            raise NotImplementedError(
                f"write_iceberg: partition column {src_col!r}: {e}"
            ) from None
        fname = (
            adopted_raw[i]["name"]
            if adopted_raw is not None
            else _fresh_field_name(src_col, transform)
        )
        part_fields.append(
            _PartField(fname, src_col, transform, ice_t, avro)
        )
    md.mkdir(parents=True, exist_ok=True)
    data.mkdir(parents=True, exist_ok=True)

    moved = _stage_data_files(spark, df, table, part_fields)

    now_ms = int(time.time() * 1000)
    snapshot_id = now_ms * 1000 + len(moved)
    taken = {
        s["snapshot-id"] for s in (prev_meta or {}).get("snapshots", [])
    }
    while snapshot_id in taken:  # same-ms double commit
        snapshot_id += 1
    location = str(table)

    ice_schema = _iceberg_schema(df.schema)
    last_column_id = _max_field_id(ice_schema["fields"])
    if prev_meta is not None and (
        mode == "append"
        # overwrite with an IDENTICAL schema (compaction's shape)
        # preserves ids too — only a schema-changing overwrite remaps
        or _schema_from_metadata(prev_meta) == df.schema
    ):
        # Reuse the TABLE's schema JSON verbatim: an externally
        # created table (schema evolution) can carry non-sequential
        # field ids, and prior manifests' lower/upper_bounds are keyed
        # by those ids — regenerating 1..n would remap them and make
        # min_max_filter decode bounds against the wrong columns.
        # Name/type equality of the shared prefix was checked above,
        # so the only thing this preserves is the id mapping; a
        # merge_schema append assigns FRESH ids past last-column-id
        # to its new columns (Iceberg's never-reuse-ids rule).
        prev_fields = _raw_schema_fields(prev_meta)
        last_column_id = max(
            int(prev_meta.get("last-column-id", 0) or 0),
            _max_field_id(prev_fields),  # nested ids count too
        )
        new_fields = list(prev_fields)
        if evolving:
            fresh = _iceberg_schema(
                T.StructType(df.schema.fields[len(prev_fields):])
            )["fields"]
            # shift EVERY id in the fresh subtree (nested element/
            # key/value ids included) past the table's ceiling —
            # Iceberg's never-reuse-ids rule
            offset = last_column_id

            def _shift(t):
                if not isinstance(t, dict):
                    return t
                t = dict(t)
                if t.get("type") == "struct":
                    t["fields"] = [
                        {
                            **f,
                            "id": int(f["id"]) + offset,
                            "type": _shift(f.get("type")),
                        }
                        for f in t.get("fields", [])
                    ]
                elif t.get("type") == "list":
                    t["element-id"] = int(t["element-id"]) + offset
                    t["element"] = _shift(t.get("element"))
                elif t.get("type") == "map":
                    t["key-id"] = int(t["key-id"]) + offset
                    t["value-id"] = int(t["value-id"]) + offset
                    t["key"] = _shift(t.get("key"))
                    t["value"] = _shift(t.get("value"))
                return t

            for f in fresh:
                new_fields.append(
                    {
                        **f,
                        "id": int(f["id"]) + offset,
                        "type": _shift(f.get("type")),
                        "required": False,
                    }
                )
            last_column_id = max(
                last_column_id, _max_field_id(new_fields)
            )
        ice_schema = {
            "type": "struct",
            "schema-id": 0,
            "fields": new_fields,
        }
    ice_fields = ice_schema["fields"]
    ids_by_name = {f["name"]: int(f["id"]) for f in ice_fields}
    if adopted_raw is not None:
        spec_fields = [
            {
                "name": sf["name"],
                "transform": sf["transform"],
                "source-id": int(sf["source-id"]),
                "field-id": int(sf.get("field-id", 1000 + i)),
            }
            for i, sf in enumerate(adopted_raw)
        ]
    else:
        spec_fields = [
            {
                "name": pf.name,
                "transform": pf.transform,
                "source-id": ids_by_name[pf.source],
                "field-id": 1000 + i,
            }
            for i, pf in enumerate(part_fields)
        ]
    manifest_name = f"manifest-{uuid.uuid4().hex}.avro"
    entries = []
    for rel, size, rows, st, pv in moved:
        lo_b, hi_b = _entry_bounds(ice_fields, st)
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "data_file": {
                    "file_path": f"{location}/{rel}",
                    "file_format": "PARQUET",
                    "partition": pv,
                    "record_count": rows,
                    "file_size_in_bytes": size,
                    "block_size_in_bytes": 67108864,
                    "lower_bounds": lo_b,
                    "upper_bounds": hi_b,
                },
            }
        )
    # The spec-required manifest key/value metadata — pyiceberg and
    # Spark's iceberg-runtime refuse manifests without these.
    write_avro_file(
        md / manifest_name,
        _manifest_entry_schema(
            [(pf.name, pf.avro) for pf in part_fields]
        ),
        entries,
        extra_metadata={
            "schema": json.dumps(ice_schema, separators=(",", ":")),
            "schema-id": "0",
            "partition-spec": json.dumps(
                spec_fields, separators=(",", ":")
            ),
            "partition-spec-id": "0",
            "format-version": "1",
            "content": "data",
        },
    )

    # the commit's BASE snapshot: the target branch's head when one
    # is named (falling back to current — a first branch write forks
    # from main), else the current snapshot
    base_id = (
        prev_meta.get("current-snapshot-id") if prev_meta else None
    )
    if branch and branch != "main" and prev_meta is not None:
        ref = (prev_meta.get("refs") or {}).get(branch)
        if ref is not None:
            base_id = int(ref["snapshot-id"])
    prev_manifests: list[dict] = []
    if prev_meta is not None and mode == "append":
        for s in prev_meta.get("snapshots", []):
            if s["snapshot-id"] == base_id and "manifest-list" in s:
                _, prev_manifests = read_avro_file(
                    _localize(
                        s["manifest-list"],
                        prev_meta.get("location", ""),
                        table,
                    )
                )
    parent_id = None if base_id in (None, -1) else base_id
    # v2 tables (row-level deletes present) track data sequence
    # numbers: this commit's files get the NEXT one, so earlier
    # equality deletes can never reach rows written after them
    new_seq = None
    if prev_meta is not None and prev_meta.get(
        "last-sequence-number"
    ) is not None:
        new_seq = int(prev_meta["last-sequence-number"]) + 1
    ml_name = f"snap-{snapshot_id}-manifest-list.avro"
    write_avro_file(
        md / ml_name,
        _MANIFEST_FILE_SCHEMA,
        [
            {
                "manifest_path": e["manifest_path"],
                "manifest_length": e["manifest_length"],
                "partition_spec_id": 0,
                "content": int(e.get("content") or 0),
                "sequence_number": e.get("sequence_number"),
                "added_snapshot_id": e.get("added_snapshot_id"),
            }
            for e in prev_manifests
        ]
        + [
            {
                "manifest_path": f"{location}/metadata/{manifest_name}",
                "manifest_length": (md / manifest_name).stat().st_size,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": new_seq,
                "added_snapshot_id": snapshot_id,
            }
        ],
        extra_metadata={
            "snapshot-id": str(snapshot_id),
            "parent-snapshot-id": (
                str(parent_id) if parent_id is not None else "null"
            ),
            "format-version": "1",
        },
    )

    version = 1
    if prev_meta is not None:
        hint = md / "version-hint.text"
        version = (
            int(hint.read_text().strip()) + 1 if hint.exists() else 2
        )
    snapshots = list(prev_meta.get("snapshots", [])) if prev_meta else []
    snapshots.append(
        {
            "snapshot-id": snapshot_id,
            # spec-standard field: ancestry walks (fast-forward,
            # WAP publish) read it straight from the JSON instead of
            # opening one Avro manifest-list per hop
            **(
                {"parent-snapshot-id": parent_id}
                if parent_id is not None
                else {}
            ),
            "timestamp-ms": now_ms,
            "summary": {
                "operation": (
                    "append" if mode == "append" else "overwrite"
                ),
                # the spec's standard commit metrics (what real
                # engines surface in table$snapshots)
                "added-data-files": str(len(moved)),
                "added-records": str(
                    sum(r for _p, _s, r, _st, _pv in moved)
                ),
                "added-files-size": str(
                    sum(s for _p, s, _r, _st, _pv in moved)
                ),
                **{
                    str(k): str(v)
                    for k, v in (extra_summary or {}).items()
                },
            },
            "manifest-list": f"{location}/metadata/{ml_name}",
        }
    )
    refs = dict((prev_meta or {}).get("refs") or {})
    if branch and branch != "main":
        # branch write: only the named ref advances; main and
        # current-snapshot-id stay where they were (WAP isolation).
        # On a table that does not exist yet the same isolation must
        # hold: create it with current-snapshot-id = -1 and ONLY the
        # named branch ref, so the audit write stays invisible to
        # plain reads until fast_forward_iceberg publishes main
        # (ADVICE r16 — previously the first branch write was
        # immediately current).
        refs[branch] = {"snapshot-id": snapshot_id, "type": "branch"}
        current_id = (
            prev_meta.get("current-snapshot-id")
            if prev_meta is not None
            else -1
        )
        if current_id is None:
            current_id = -1
    else:
        refs["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
        current_id = snapshot_id
    meta = {
        # a table upgraded to v2 (row-level deletes) STAYS v2 — and
        # its sequence counter advances with this commit
        "format-version": int(
            (prev_meta or {}).get("format-version") or 1
        ),
        "table-uuid": (
            prev_meta.get("table-uuid") if prev_meta else str(uuid.uuid4())
        ),
        "location": location,
        "last-updated-ms": now_ms,
        "last-column-id": last_column_id,
        "schema": ice_schema,
        "partition-spec": spec_fields,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        # table properties SURVIVE commits (a write is not an unset)
        "properties": dict((prev_meta or {}).get("properties") or {}),
        "current-snapshot-id": current_id,
        "snapshots": snapshots,
        "refs": refs,
    }
    if new_seq is not None:
        meta["last-sequence-number"] = new_seq
    tmp = md / f".v{version}.tmp"
    tmp.write_text(json.dumps(meta, indent=1))
    final = md / f"v{version}.metadata.json"
    with open(final, "x", encoding="utf-8") as fh:
        fh.write(tmp.read_text())
    tmp.unlink()
    (md / "version-hint.text").write_text(str(version))
    return snapshot_id


def snapshot_store_to_iceberg(
    store,
    spark: SparkSession,
    path: str | os.PathLike,
    mode: str = "overwrite",
    latest_only: bool = False,
) -> int | None:
    """Export a SnapshotStore's state as an Iceberg commit — the
    Iceberg twin of sources.delta.snapshot_store_to_delta, same
    contract: accumulated state by default (union of all snapshots),
    ``latest_only=True`` for the newest snapshot only; returns the
    committed snapshot id, or None when the store is empty."""
    df = store.read_latest(spark) if latest_only else store.read(spark)
    if df is None:
        return None
    return write_iceberg(df, path, mode=mode)


# ----------------------------------------------------- streaming source
class IcebergStreamDataSource(DataSource):
    """``spark.readStream.format("iceberg_snaps").option("path", t)``
    after ``spark.dataSource.register(IcebergStreamDataSource)`` — a
    STREAMING source over an Iceberg table's snapshot lineage, the
    twin of sources.delta.DeltaStreamDataSource (same option names,
    same semantics, same Arrow-batch read path):

    - the offset is the POSITION in the metadata's append-ordered
      ``snapshots`` array, pinned to the snapshot id it saw there —
      a table whose history is rewritten under a running stream
      (snapshot expiry) raises loudly instead of replaying wrong
      files;
    - each micro-batch covers snapshots ``(start, end]`` and plans
      one InputPartition per data file ADDED by those snapshots
      (manifests whose ``added_snapshot_id`` matches, entries with
      non-DELETED status) — Iceberg data files carry ALL columns,
      identity partitions included, so no value re-attach is needed;
    - a snapshot whose ``summary.operation`` is not ``append``
      raises unless ``ignore_overwrites=true`` (then its added files
      still stream — delta-spark's ignoreDeletes semantics), because
      an append stream cannot express row-level removal;
    - ``starting_snapshot`` skips history (``"latest"`` = only
      snapshots after stream start; an int = that snapshot id
      onward); ``arrow_batch_size`` bounds per-task memory.
    """

    @classmethod
    def name(cls) -> str:
        return "iceberg_snaps"

    def schema(self) -> T.StructType:
        meta = json.loads(
            _metadata_path(Path(self.options["path"])).read_text()
        )
        return _schema_from_metadata(meta)

    def streamReader(self, schema: T.StructType) -> "IcebergStreamReader":
        return IcebergStreamReader(schema, dict(self.options))


class _IcebergFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema_ = schema
        self.options = options
        self.table = Path(options["path"])
        self.ignore_overwrites = (
            str(options.get("ignore_overwrites", "false")).lower()
            == "true"
        )
        self.batch_size = int(options.get("arrow_batch_size", 65536))

    def _meta(self) -> tuple[dict, list]:
        meta = json.loads(_metadata_path(self.table).read_text())
        return meta, list(meta.get("snapshots", []))

    def _offset_at(self, snaps: list, index: int) -> dict:
        return {
            "index": index,
            "snapshot_id": (
                int(snaps[index]["snapshot-id"]) if index >= 0 else None
            ),
        }

    def initialOffset(self) -> dict:
        sv = self.options.get("starting_snapshot")
        _meta, snaps = self._meta()
        if sv is None:
            return {"index": -1, "snapshot_id": None}
        if str(sv) == "latest":
            return self._offset_at(snaps, len(snaps) - 1)
        sid = int(sv)
        for i, s in enumerate(snaps):
            if int(s["snapshot-id"]) == sid:
                return self._offset_at(snaps, i - 1)
        raise ValueError(
            f"iceberg stream: starting_snapshot {sid} not in the "
            f"snapshot lineage (have {[s['snapshot-id'] for s in snaps]})"
        )

    def latestOffset(self) -> dict:
        _meta, snaps = self._meta()
        return self._offset_at(snaps, len(snaps) - 1)

    def _check_lineage(self, snaps: list, off: dict) -> None:
        i, sid = int(off["index"]), off.get("snapshot_id")
        if i < 0:
            return
        if i >= len(snaps) or int(snaps[i]["snapshot-id"]) != int(sid):
            raise ValueError(
                f"iceberg stream: offset pinned snapshot {sid} at "
                f"position {i}, but the table's snapshot lineage has "
                "changed (snapshot expiry / history rewrite?) — "
                "restart the stream with starting_snapshot"
            )

    def partitions(self, start: dict, end: dict):
        meta, snaps = self._meta()
        self._check_lineage(snaps, start)
        self._check_lineage(snaps, end)
        location = meta.get("location", "")
        out: list[_IcebergFilePartition] = []
        for i in range(int(start["index"]) + 1, int(end["index"]) + 1):
            snap = snaps[i]
            sid = int(snap["snapshot-id"])
            op = (snap.get("summary") or {}).get("operation", "append")
            if op != "append" and not self.ignore_overwrites:
                raise ValueError(
                    f"iceberg stream: snapshot {sid} is a {op!r} "
                    "(removes data); an append stream cannot express "
                    "it — pass ignore_overwrites=true to stream the "
                    "added files anyway"
                )
            if "manifest-list" not in snap:
                raise NotImplementedError(
                    "iceberg stream: snapshot without a manifest-list "
                    "(ancient inline-manifests form)"
                )
            ml = _localize(snap["manifest-list"], location, self.table)
            _, manifests = read_avro_file(ml)
            for m in manifests:
                if (
                    m.get("added_snapshot_id") is not None
                    and int(m["added_snapshot_id"]) != sid
                ):
                    continue  # carried over from a previous snapshot
                if int(m.get("content") or 0) != 0:
                    raise NotImplementedError(
                        "iceberg stream: DELETE manifest (row-level "
                        "deletes)"
                    )
                mpath = _localize(m["manifest_path"], location, self.table)
                _, entries = read_avro_file(mpath)
                for e in entries:
                    # stream ONLY status ADDED entries: manifest
                    # compaction rewrites old files into new manifests
                    # as status EXISTING (0) with the compacting
                    # snapshot as added_snapshot_id — re-streaming
                    # those would duplicate every compacted row
                    if int(e.get("status") or 0) != _STATUS_ADDED:
                        continue
                    rec = e["data_file"]
                    if int(rec.get("content") or 0) != 0:
                        raise NotImplementedError(
                            "iceberg stream: position/equality delete "
                            "file in a data manifest"
                        )
                    fmt = str(rec.get("file_format", "PARQUET")).upper()
                    if fmt != "PARQUET":
                        raise NotImplementedError(
                            f"iceberg stream: data file format {fmt}"
                        )
                    out.append(
                        _IcebergFilePartition(
                            _localize(
                                rec["file_path"], location, self.table
                            )
                        )
                    )
        return out

    def read(self, partition: _IcebergFilePartition):
        # Arrow-batch read path (see DeltaStreamReader.read): one
        # RecordBatch of at most arrow_batch_size rows crosses the
        # boundary at a time; Iceberg data files carry every column,
        # so this is a straight cast onto the table schema's types.
        import pyarrow as pa
        import pyarrow.parquet as pq

        from snapflow_spark.sources.delta import _arrow_type

        names = [f.name for f in self.schema_.fields]
        arrow_schema = pa.schema(
            [
                pa.field(f.name, _arrow_type(f.dataType))
                for f in self.schema_.fields
            ]
        )
        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches(
            batch_size=self.batch_size, columns=names
        ):
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(n).cast(arrow_schema.field(n).type, safe=False)
                    for n in names
                ],
                schema=arrow_schema,
            )

    def commit(self, end: dict) -> None:
        pass  # Spark's offset log is the only state


def _snapshot_file_refs(
    snap: dict, location: str, table: Path
) -> tuple[set, set]:
    """(manifest-list + manifest paths, data/delete file paths)
    referenced by one snapshot — resolved local paths."""
    meta_files: set[str] = set()
    data_files: set[str] = set()
    if "manifest-list" not in snap:
        for m in snap.get("manifests", []):
            meta_files.add(_localize(m, location, table))
        manifests = [
            {"manifest_path": m} for m in snap.get("manifests", [])
        ]
    else:
        ml = _localize(snap["manifest-list"], location, table)
        meta_files.add(ml)
        if not Path(ml).exists():
            # an interrupted earlier expire may have deleted this
            # snapshot's files after publishing pruned metadata that
            # no longer lists it — nothing left to walk
            return meta_files, data_files
        _, manifests = read_avro_file(ml)
    for m in manifests:
        mpath = _localize(m["manifest_path"], location, table)
        meta_files.add(mpath)
        if not Path(mpath).exists():
            continue
        _, entries = read_avro_file(mpath)
        for e in entries:
            rec = e.get("data_file") or {}
            if rec.get("file_path"):
                data_files.add(
                    _localize(rec["file_path"], location, table)
                )
    return meta_files, data_files


def rollback_iceberg(
    path: str | os.PathLike,
    snapshot_id: int,
) -> None:
    """ROLLBACK — point the table back at an earlier snapshot
    (Iceberg's ``setCurrentSnapshot``): a new metadata version whose
    current-snapshot-id (and main branch ref) is the target; every
    snapshot stays in the lineage, so this is reversible and
    time-travel-preserving.  The snapshot must still be in the
    metadata (not expired)."""
    table = Path(path)
    md = table / "metadata"
    meta = json.loads(_metadata_path(table).read_text())
    have = {int(s["snapshot-id"]) for s in meta.get("snapshots", [])}
    if int(snapshot_id) not in have:
        raise ValueError(
            f"rollback_iceberg: snapshot {snapshot_id} not in the "
            f"table (have {sorted(have)})"
        )
    meta["current-snapshot-id"] = int(snapshot_id)
    refs = dict(meta.get("refs") or {})
    refs["main"] = {"snapshot-id": int(snapshot_id), "type": "branch"}
    meta["refs"] = refs
    meta["last-updated-ms"] = int(time.time() * 1000)
    hint = md / "version-hint.text"
    version = int(hint.read_text().strip()) + 1
    with open(
        md / f"v{version}.metadata.json", "x", encoding="utf-8"
    ) as fh:
        fh.write(json.dumps(meta, indent=1))
    hint.write_text(str(version))


def tag_iceberg_snapshot(
    path: str | os.PathLike,
    name: str,
    snapshot_id: int | None = None,
    kind: str = "tag",
) -> None:
    """Create or move a NAMED REF (v2 ``refs``): a ``tag`` pins a
    snapshot forever (until the ref is dropped), a ``branch`` names a
    movable head.  ``snapshot_id=None`` refs the current snapshot.
    Readers resolve refs with ``read_iceberg(ref=...)``;
    ``expire_iceberg_snapshots`` never expires a snapshot a ref
    names.  Publishing is a new metadata version (the same
    create-exclusive contract as commits)."""
    if kind not in ("tag", "branch"):
        raise ValueError(f"tag_iceberg_snapshot: kind {kind!r}")
    table = Path(path)
    md = table / "metadata"
    meta = json.loads(_metadata_path(table).read_text())
    sid = (
        int(snapshot_id)
        if snapshot_id is not None
        else int(meta["current-snapshot-id"])
    )
    have = {int(s["snapshot-id"]) for s in meta.get("snapshots", [])}
    if sid not in have:
        raise ValueError(
            f"tag_iceberg_snapshot: snapshot {sid} not in the table "
            f"(have {sorted(have)})"
        )
    refs = dict(meta.get("refs") or {})
    refs[str(name)] = {"snapshot-id": sid, "type": kind}
    meta["refs"] = refs
    hint = md / "version-hint.text"
    version = int(hint.read_text().strip()) + 1
    with open(
        md / f"v{version}.metadata.json", "x", encoding="utf-8"
    ) as fh:
        fh.write(json.dumps(meta, indent=1))
    hint.write_text(str(version))


def drop_iceberg_ref(path: str | os.PathLike, name: str) -> None:
    """Remove a named ref (the tag/branch retention it carried ends —
    the next expire may reclaim the snapshot)."""
    table = Path(path)
    md = table / "metadata"
    meta = json.loads(_metadata_path(table).read_text())
    refs = dict(meta.get("refs") or {})
    if name not in refs:
        raise ValueError(
            f"drop_iceberg_ref: ref {name!r} not in {sorted(refs)}"
        )
    del refs[name]
    meta["refs"] = refs
    hint = md / "version-hint.text"
    version = int(hint.read_text().strip()) + 1
    with open(
        md / f"v{version}.metadata.json", "x", encoding="utf-8"
    ) as fh:
        fh.write(json.dumps(meta, indent=1))
    hint.write_text(str(version))


def expire_iceberg_snapshots(
    spark: SparkSession,
    path: str | os.PathLike,
    keep_last: int = 1,
    older_than_ms: int | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Expire old snapshots and reclaim their storage — the Iceberg
    twin of ``vacuum_delta`` (Iceberg's own ``expireSnapshots``
    semantics): a snapshot expires when it is NOT among the newest
    ``keep_last`` (by lineage position; the current snapshot is
    always kept) AND, if ``older_than_ms`` is given, its
    ``timestamp-ms`` is at or before the cutoff.  Files referenced
    ONLY by expired snapshots — manifest lists, manifests, data AND
    delete files — are deleted; anything a kept snapshot still
    references survives.  The metadata rewrites with the pruned
    snapshot list (a new version, so readers at the old metadata
    keep working until they refresh; a RUNNING stream notices the
    lineage change and raises rather than replaying wrong files).
    Returns the deleted paths (relative to the table root where
    possible); ``dry_run=True`` lists without deleting.  Unreferenced
    files this never saw (crashed stages) are out of scope — that is
    orphan-file removal, a separate maintenance pass."""
    if keep_last < 1:
        raise ValueError(
            f"expire_iceberg_snapshots: keep_last must be >= 1, got "
            f"{keep_last}"
        )
    table = Path(path)
    mpath = _metadata_path(table)
    meta = json.loads(mpath.read_text())
    location = meta.get("location", "")
    snaps = list(meta.get("snapshots", []))
    current = meta.get("current-snapshot-id")
    ref_pinned = {
        int(r.get("snapshot-id"))
        for r in (meta.get("refs") or {}).values()
        if r.get("snapshot-id") is not None
    }
    keep: list[dict] = []
    expired: list[dict] = []
    for i, s in enumerate(snaps):
        is_tail = i >= len(snaps) - int(keep_last)
        too_old = older_than_ms is None or (
            int(s.get("timestamp-ms") or 0) <= int(older_than_ms)
        )
        pinned = int(s["snapshot-id"]) in ref_pinned  # tags/branches
        if s["snapshot-id"] == current or is_tail or not too_old or pinned:
            keep.append(s)
        else:
            expired.append(s)
    if not expired:
        return []
    keep_meta: set[str] = set()
    keep_data: set[str] = set()
    for s in keep:
        m, d = _snapshot_file_refs(s, location, table)
        keep_meta |= m
        keep_data |= d
    doomed: set[str] = set()
    for s in expired:
        m, d = _snapshot_file_refs(s, location, table)
        doomed |= m - keep_meta
        doomed |= d - keep_data
    out = sorted(
        str(Path(p).relative_to(table)) if str(p).startswith(str(table)) else str(p)
        for p in doomed
    )
    if dry_run:
        return out
    # crash-safety ordering: PUBLISH the pruned metadata (and hint)
    # FIRST, then delete the now-unreferenced files — a crash in
    # between leaves harmless orphan files, never published metadata
    # listing snapshots whose manifests are already gone (readers and
    # later maintenance passes walking all listed snapshots would
    # fail on those; _snapshot_file_refs also tolerates a half-done
    # earlier pass by skipping missing manifests)
    meta["snapshots"] = keep
    hint = int(
        (table / "metadata" / "version-hint.text").read_text().strip()
    )
    new_meta = table / "metadata" / f"v{hint + 1}.metadata.json"
    with open(new_meta, "x", encoding="utf-8") as fh:
        fh.write(json.dumps(meta, indent=1))
    (table / "metadata" / "version-hint.text").write_text(str(hint + 1))
    for p in doomed:
        Path(p).unlink(missing_ok=True)
    return out


def delete_from_iceberg(
    spark: SparkSession,
    path: str | os.PathLike,
    condition,
) -> int:
    """Row-level DELETE via v2 POSITION-DELETE files — the
    merge-on-read shape (Flink/Spark's Iceberg row-level delete
    default): matching rows are recorded as (file_path, pos) in a
    sorted delete parquet, a DELETE manifest points at it, and a new
    snapshot carries the previous manifests plus the delete manifest
    (manifest-list ``content=1``) — no data file is rewritten.
    ``condition`` is a SQL predicate string or Column over the table
    columns.  Returns the number of rows newly deleted.

    The delete file is written DISTRIBUTED: matches flow
    (recorded-URI, row-index) through one scan + one broadcast
    mapping join and land sorted by (file_path, pos) as the spec
    requires — the driver never holds the deleted row list.  Rows
    already position-deleted are excluded (repeat deletes are
    idempotent).  The table's metadata moves to format-version 2
    (delete files are a v2 feature); old snapshots stay readable by
    ``snapshot_id=``."""
    table = Path(path)
    snap = iceberg_snapshot(spark, table)
    _guard_v3_write(snap.metadata, "delete_from_iceberg")
    del_files, n_deleted = _position_delete_files(
        spark, table, snap, condition
    )
    if n_deleted == 0:
        return 0

    _publish_delete_snapshot(
        table,
        del_files,
        content=1,
        summary={"deleted-position-deletes": str(int(n_deleted))},
    )
    return int(n_deleted)


def _position_delete_files(
    spark: SparkSession,
    table: Path,
    snap: "IcebergSnapshot",
    condition,
) -> tuple[list[tuple[str, int]], int]:
    """The shared position-delete build (delete_from_iceberg /
    update_iceberg): scan the live files, find rows matching
    ``condition`` that are not already dead (prior position deletes
    AND sequence-scoped equality deletes both excluded), and write
    the spec-sorted (file_path, pos) delete parquet(s) DISTRIBUTED —
    the driver never holds the deleted row list.  Returns
    ([(name under data/, rows)], total rows)."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    from snapflow_spark.sources.delta import hadoop_file_uri as _huri

    paths = [p for p, _pv, _n, _bd in snap.files]
    if not paths:
        return [], 0
    mapping = spark.createDataFrame(
        [
            (
                _huri(p),
                snap.file_uris.get(p, p),
                int(snap.file_seqs.get(p, 0)),
            )
            for p in paths
        ],
        "__local string, file_path string, __fseq long",
    )
    scan = (
        spark.read.schema(snap.schema)
        .parquet(*paths)
        .select(
            "*",
            F.col("_metadata.file_path").alias("__local"),
            F.col("_metadata.row_index").alias("pos"),
        )
    )
    matches = scan.where(cond).join(F.broadcast(mapping), "__local")
    # rows already dead via sequence-scoped EQUALITY deletes must not
    # match again (they would inflate the returned count and write
    # redundant position-delete rows): anti-join each delete's keys
    # (null-safe, the spec's equality semantics) onto rows whose file
    # sequence the delete covers — the read path's exact rule
    for dpath, dcols, dseq in snap.equality_deletes:
        dd = (
            spark.read.parquet(dpath).select(*dcols).dropDuplicates()
        )
        matches = matches.join(
            dd,
            [matches[c].eqNullSafe(dd[c]) for c in dcols]
            + [matches["__fseq"] < F.lit(int(dseq))],
            "left_anti",
        )
    matches = matches.select(
        "file_path", F.col("pos").cast("long").alias("pos")
    )
    if snap.position_deletes:
        prior = spark.read.parquet(*snap.position_deletes).select(
            "file_path", "pos"
        )
        matches = matches.join(prior, ["file_path", "pos"], "left_anti")
    data = table / "data"
    data.mkdir(parents=True, exist_ok=True)
    staging = data / f".del-staging-{uuid.uuid4().hex}"
    # shuffle by file_path so each task emits ONE spec-sorted delete
    # file covering whole data files — a huge delete parallelizes
    # across tasks instead of funnelling through one writer (the
    # 100x shape); tiny deletes still collapse to one non-empty part
    (
        matches.repartition(F.col("file_path"))
        .sortWithinPartitions("file_path", "pos")
        .write.parquet(str(staging))
    )
    import shutil as _shutil

    import pyarrow.parquet as pq

    del_files: list[tuple[str, int]] = []  # (name under data/, rows)
    n_deleted = 0
    for part in sorted(Path(staging).glob("*.parquet")):
        n = pq.ParquetFile(part).metadata.num_rows
        if n == 0:
            continue
        name = f"{uuid.uuid4().hex}-deletes.parquet"
        part.rename(data / name)
        del_files.append((name, int(n)))
        n_deleted += int(n)
    _shutil.rmtree(staging)
    return del_files, n_deleted


def update_iceberg(
    spark: SparkSession,
    path: str | os.PathLike,
    condition,
    set_: dict,
) -> int:
    """Row-level UPDATE — Iceberg's merge-on-read shape (round 15):
    rows matching ``condition`` die via a v2 POSITION-delete file and
    their rewritten copies (``set_`` = column -> SQL expression or
    Column over the OLD row) land as new data files in the SAME
    snapshot — position deletes key exact (file_path, pos), so the
    new files are untouched by construction; no data file is
    rewritten in place.  The table's partition spec is preserved,
    transforms included (bucket/truncate/temporal re-staged through
    the pinned transform stage).  Returns the number of rows
    updated.

    The rewrite source reads through ``read_iceberg`` (all deletes
    applied), so already-dead rows never resurrect as updated
    copies; the delete side excludes them symmetrically."""
    table = Path(path)
    snap = iceberg_snapshot(spark, table)
    meta = snap.metadata
    fields = {f.name: f for f in snap.schema.fields}
    bad = set(set_) - set(fields)
    if bad:
        raise ValueError(
            f"update_iceberg: set_ names unknown columns {sorted(bad)}"
        )
    if not set_:
        raise ValueError("update_iceberg: empty set_ — nothing to update")
    _guard_v3_write(meta, "update_iceberg")
    _spec_part_fields(meta)  # loud-guard unstageable specs up front
    del_files, n = _position_delete_files(spark, table, snap, condition)
    if n == 0:
        return 0
    cond = F.expr(condition) if isinstance(condition, str) else condition
    out_cols = [f.name for f in snap.schema.fields]
    updated = read_iceberg(spark, table).where(cond).select(
        *[
            (
                (
                    F.expr(set_[c])
                    if isinstance(set_[c], str)
                    else set_[c]
                )
                .cast(fields[c].dataType)
                .alias(c)
                if c in set_
                else F.col(c)
            )
            for c in out_cols
        ]
    )
    moved = _stage_data_files(
        spark, updated, table, _spec_part_fields(meta)
    )
    _publish_delete_snapshot(
        table,
        del_files,
        content=1,
        summary={
            "updated-records": str(int(n)),
            "deleted-position-deletes": str(int(n)),
        },
        data_moved=moved,
    )
    return int(n)


def _publish_delete_snapshot(
    table: Path,
    del_files: list,
    content: int,
    summary: dict,
    equality_ids: list[int] | None = None,
    data_moved: list | None = None,
) -> int:
    """Publish a new snapshot adding delete files ([(name under
    data/, record count)]) behind ONE DELETE manifest: prior
    manifests carry forward, the new manifest-list entry gets
    content=1 and the next data sequence number, and the metadata
    moves to format-version 2 with ``last-sequence-number``.  Shared
    by the position-delete (content=1) and equality-delete
    (content=2, ``equality_ids``) writers.

    ``data_moved`` (round 15 — the upsert shape) additionally lands
    NEW DATA FILES (``_stage_data_files`` tuples) behind a DATA
    manifest at the SAME sequence number as the delete: equality
    deletes apply only to strictly-smaller sequences, so the new
    rows survive while every older matching row dies — one atomic
    snapshot, the Flink upsert-sink commit.  Returns the new
    snapshot id."""
    md = table / "metadata"
    data = table / "data"
    meta = json.loads(_metadata_path(table).read_text())
    _guard_v3_write(meta, "iceberg delete/upsert")
    location = meta.get("location", str(table))
    cur = next(
        (
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        ),
        None,
    )
    if cur is None:
        raise ValueError(
            "iceberg delete/upsert: the table has no live current "
            f"snapshot (current-snapshot-id="
            f"{meta.get('current-snapshot-id')!r}, "
            f"{len(meta.get('snapshots') or [])} snapshots recorded) "
            "— nothing to delete from; append first"
        )
    prior_entries: list[dict] = []
    if "manifest-list" in cur:
        _, prior_entries = read_avro_file(
            _localize(cur["manifest-list"], location, table)
        )
    new_seq = (
        max(
            [int(meta.get("last-sequence-number") or 0)]
            + [
                int(e.get("sequence_number") or 0)
                for e in prior_entries
            ]
        )
        + 1
    )
    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "partition",
                         "type": {"type": "record", "name": "r102",
                                  "fields": []}},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {"name": "equality_ids",
                         "type": ["null", {"type": "array",
                                           "items": "int"}],
                         "default": None},
                    ],
                },
            },
        ],
    }
    now_ms = int(time.time() * 1000)
    snapshot_id = now_ms * 1000 + 1
    taken = {s["snapshot-id"] for s in meta.get("snapshots", [])}
    while snapshot_id in taken:
        snapshot_id += 1
    del_manifest = f"manifest-del-{uuid.uuid4().hex}.avro"
    write_avro_file(
        md / del_manifest,
        entry_schema,
        [
            {
                "status": 1,
                "sequence_number": new_seq,
                "data_file": {
                    "content": content,
                    "file_path": f"{location}/data/{del_name}",
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": int(n_rows),
                    "file_size_in_bytes": (data / del_name).stat().st_size,
                    "equality_ids": equality_ids,
                },
            }
            for del_name, n_rows in del_files
        ],
        extra_metadata={
            "schema": json.dumps(
                {"type": "struct", "schema-id": 0,
                 "fields": _raw_schema_fields(meta)},
                separators=(",", ":"),
            ),
            "schema-id": "0",
            "partition-spec": "[]",
            "partition-spec-id": "0",
            "format-version": "2",
            "content": "deletes",
        },
    )
    new_entries = [
        {
            "manifest_path": f"{location}/metadata/{del_manifest}",
            "manifest_length": (md / del_manifest).stat().st_size,
            "partition_spec_id": 0,
            "content": 1,
            "sequence_number": new_seq,
            "added_snapshot_id": snapshot_id,
        }
    ]
    if data_moved:
        # the upsert's DATA manifest, SAME sequence as the delete —
        # the reader's strictly-smaller rule keeps these rows alive
        raw_fields = _raw_schema_fields(meta)
        spec_raw = _default_spec_raw(meta)
        part_types = [
            (pf.name, pf.avro) for pf in _spec_part_fields(meta)
        ]
        ice_schema_json = json.dumps(
            {"type": "struct", "schema-id": 0, "fields": raw_fields},
            separators=(",", ":"),
        )
        data_manifest = f"manifest-{uuid.uuid4().hex}.avro"
        write_avro_file(
            md / data_manifest,
            _manifest_entry_schema(part_types),
            [
                {
                    "status": 1,  # ADDED
                    "snapshot_id": snapshot_id,
                    "data_file": {
                        "file_path": f"{location}/{rel}",
                        "file_format": "PARQUET",
                        "partition": pv,
                        "record_count": rows,
                        "file_size_in_bytes": size,
                        "block_size_in_bytes": 67108864,
                        "lower_bounds": _entry_bounds(raw_fields, st)[0],
                        "upper_bounds": _entry_bounds(raw_fields, st)[1],
                    },
                }
                for rel, size, rows, st, pv in data_moved
            ],
            extra_metadata={
                "schema": ice_schema_json,
                "schema-id": "0",
                "partition-spec": json.dumps(
                    spec_raw, separators=(",", ":")
                ),
                "partition-spec-id": "0",
                "format-version": "2",
                "content": "data",
            },
        )
        new_entries.append(
            {
                "manifest_path": f"{location}/metadata/{data_manifest}",
                "manifest_length": (md / data_manifest).stat().st_size,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": new_seq,
                "added_snapshot_id": snapshot_id,
            }
        )
    ml_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "content", "type": "int"},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None},
            {"name": "added_snapshot_id", "type": ["null", "long"],
             "default": None},
        ],
    }
    ml_name = f"snap-{snapshot_id}-manifest-list.avro"
    write_avro_file(
        md / ml_name,
        ml_schema,
        [
            {
                "manifest_path": e["manifest_path"],
                "manifest_length": int(e["manifest_length"]),
                "partition_spec_id": int(e.get("partition_spec_id") or 0),
                "content": int(e.get("content") or 0),
                "sequence_number": e.get("sequence_number"),
                "added_snapshot_id": e.get("added_snapshot_id"),
            }
            for e in prior_entries
        ]
        + new_entries,
        extra_metadata={
            "snapshot-id": str(snapshot_id),
            "parent-snapshot-id": str(meta["current-snapshot-id"]),
            "format-version": "2",
        },
    )
    meta["snapshots"].append(
        {
            "snapshot-id": snapshot_id,
            **(
                {"parent-snapshot-id": int(meta["current-snapshot-id"])}
                if meta.get("current-snapshot-id") not in (None, -1)
                else {}
            ),
            "timestamp-ms": now_ms,
            # an upsert both removes and adds rows: "overwrite" (what
            # the Flink sink stamps); a pure delete stays "delete"
            "summary": {
                "operation": "overwrite" if data_moved else "delete",
                **summary,
            },
            "manifest-list": f"{location}/metadata/{ml_name}",
        }
    )
    meta["current-snapshot-id"] = snapshot_id
    refs = dict(meta.get("refs") or {})
    refs["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
    meta["refs"] = refs
    meta["format-version"] = 2  # delete files are a v2 feature
    meta["last-sequence-number"] = new_seq
    meta["last-updated-ms"] = now_ms
    hint = md / "version-hint.text"
    version = int(hint.read_text().strip()) + 1 if hint.exists() else 1
    with open(
        md / f"v{version}.metadata.json", "x", encoding="utf-8"
    ) as fh:
        fh.write(json.dumps(meta, indent=1))
    hint.write_text(str(version))
    return snapshot_id


#: above this many distinct keys, the equality-delete key set splits
#: into one sorted parquet file per range partition (the spec allows
#: MANY delete files in one DELETE manifest at the same sequence) —
#: below it, one sorted file, the micro-batch CDC shape
_EQ_DELETE_MAX_KEYS_PER_FILE = 5_000_000


def _stage_equality_delete_files(
    keys_df: DataFrame,
    data: Path,
    key_cols: list[str],
    max_keys_per_file: int = _EQ_DELETE_MAX_KEYS_PER_FILE,
) -> tuple[list[tuple[str, int]], int]:
    """Stage the deduplicated key set as 1..N sorted parquet
    equality-delete files under ``data/`` and return
    ``([(name, rows)], n_distinct_keys)``.  DISTRIBUTED above
    ``max_keys_per_file``: the keys range-partition into one sorted
    file per partition, every file registered by the caller in the
    SAME DELETE manifest at the same sequence number — no single
    executor task ever serializes the whole key set (the
    ``_dv_delete_plan`` discipline; the one pre-count aggregate runs
    over the CHANGELOG keys, never the table).  Shared by
    ``upsert_iceberg`` and ``delete_iceberg_by_key``."""
    import math
    import shutil as _shutil

    import pyarrow.parquet as pq

    distinct = keys_df.dropDuplicates()
    n_keys = int(distinct.count())
    if n_keys == 0:
        return [], 0
    parts = max(1, math.ceil(n_keys / int(max_keys_per_file)))
    staged = (
        distinct.repartitionByRange(parts, *key_cols)
        if parts > 1
        else distinct.repartition(1)
    ).sortWithinPartitions(*key_cols)
    data.mkdir(parents=True, exist_ok=True)
    staging = data / f".del-staging-{uuid.uuid4().hex}"
    staged.write.parquet(str(staging))
    del_files: list[tuple[str, int]] = []
    try:
        for part in sorted(Path(staging).glob("*.parquet")):
            rows = pq.ParquetFile(part).metadata.num_rows
            if rows == 0:
                continue
            name = f"{uuid.uuid4().hex}-eq-deletes.parquet"
            part.rename(data / name)
            del_files.append((name, int(rows)))
    finally:
        _shutil.rmtree(staging, ignore_errors=True)
    return del_files, n_keys


def delete_iceberg_by_key(
    spark: SparkSession,
    path: str | os.PathLike,
    keys: DataFrame,
    max_keys_per_file: int = _EQ_DELETE_MAX_KEYS_PER_FILE,
) -> int:
    """Row-level DELETE by KEY via a v2 EQUALITY-delete file — the
    streaming-upsert shape (what Flink's Iceberg upsert sink writes):
    ``keys`` is a DataFrame whose columns name the equality columns
    and whose rows are the values to delete.  NO data file is
    scanned: the keys land (deduplicated) in sorted delete parquet —
    ONE file for micro-batch sizes, one file PER RANGE PARTITION
    above ``max_keys_per_file`` (a wide backfill never funnels
    through a single task) — a
    DELETE manifest records their ``equality_ids``, and the new
    snapshot's sequence number scopes the delete to data written
    BEFORE it — rows appended afterwards survive even when matching,
    exactly the read side's sequence semantics.  Cost is O(keys)
    regardless of table size.  Returns the number of distinct keys
    recorded (NOT the rows that will match — equality deletes are
    resolved at read time)."""
    table = Path(path)
    meta = json.loads(_metadata_path(table).read_text())
    _guard_v3_write(meta, "delete_iceberg_by_key")
    fields_by_name = {
        f["name"]: f for f in _raw_schema_fields(meta)
    }
    eq_ids: list[int] = []
    for c in keys.columns:
        f = fields_by_name.get(c)
        if f is None or f.get("id") is None:
            raise ValueError(
                f"delete_iceberg_by_key: column {c!r} not in the "
                f"table schema {sorted(fields_by_name)}"
            )
        eq_ids.append(int(f["id"]))
    del_files, n_keys = _stage_equality_delete_files(
        keys, table / "data", list(keys.columns), max_keys_per_file
    )
    if n_keys == 0:
        return 0
    _publish_delete_snapshot(
        table,
        del_files,
        content=2,  # EQUALITY deletes
        summary={"equality-delete-keys": str(int(n_keys))},
        equality_ids=eq_ids,
    )
    return int(n_keys)


def upsert_iceberg(
    spark: SparkSession,
    path: str | os.PathLike,
    df: DataFrame,
    keys: list[str],
    extra_summary: dict | None = None,
    max_keys_per_file: int = _EQ_DELETE_MAX_KEYS_PER_FILE,
) -> dict:
    """Keyed UPSERT in ONE snapshot — the Flink Iceberg upsert-sink
    commit shape: an EQUALITY-delete file carrying ``df``'s key
    values and the new data files land together at the SAME data
    sequence number N.  The spec applies an equality delete only to
    data files with a STRICTLY smaller sequence, so every older row
    with a matching key dies while this commit's rows survive — an
    atomic replace-by-key costing O(keys + new rows), no table scan,
    no data file rewritten (the merge-on-read debt is settled later
    by ``rewrite_iceberg_files``).

    Creates the table (plain append) when absent or empty.  The
    DataFrame must match the table schema exactly and carry every
    key column; partitioned tables keep their spec, transforms
    included.  ``extra_summary``
    lands in the snapshot summary — the exactly-once hook
    ``iceberg_stream_sink`` keys on.  Returns ``{"snapshot_id": id,
    "keys": n_distinct_keys, "rows": n_new_rows}``."""
    table = Path(path)
    keys = list(keys)
    if not keys:
        raise ValueError("upsert_iceberg: empty key list")
    missing = [c for c in keys if c not in df.columns]
    if missing:
        raise ValueError(
            f"upsert_iceberg: key columns {missing} not in the "
            f"DataFrame columns {df.columns}"
        )
    meta = None
    try:
        meta = json.loads(_metadata_path(table).read_text())
    except FileNotFoundError:
        pass
    if meta is None or meta.get("current-snapshot-id") in (
        None, -1,
    ) or not meta.get("snapshots"):
        # no live rows anywhere: the upsert IS a plain append
        sid = write_iceberg(
            df, table, mode="append", extra_summary=extra_summary
        )
        snap = iceberg_snapshot(spark, table)
        return {
            "snapshot_id": sid,
            "keys": 0,
            "rows": sum(n for _p, _pv, n, _bd in snap.files),
        }
    _guard_v3_write(meta, "upsert_iceberg")
    if _schema_from_metadata(meta) != df.schema:
        raise ValueError(
            "upsert_iceberg: DataFrame schema differs from the table "
            "schema — upserts replace rows by key, they do not evolve "
            "the schema (write_iceberg(merge_schema=True) first)"
        )
    fields_by_name = {f["name"]: f for f in _raw_schema_fields(meta)}
    eq_ids = []
    for c in keys:
        f = fields_by_name.get(c)
        if f is None or f.get("id") is None:
            raise ValueError(
                f"upsert_iceberg: key column {c!r} not in the table "
                f"schema {sorted(fields_by_name)}"
            )
        eq_ids.append(int(f["id"]))
    part_fields = _spec_part_fields(meta)

    # 1. the equality-delete keys (deduplicated, sorted, split into
    # one file per range partition above max_keys_per_file)
    del_files, n_keys = _stage_equality_delete_files(
        df.select(*keys), table / "data", keys, max_keys_per_file
    )
    if not n_keys:
        return {
            "snapshot_id": int(meta["current-snapshot-id"]),
            "keys": 0,
            "rows": 0,
        }

    # 2. the new data files (the table's partition spec preserved,
    # transforms included)
    moved = _stage_data_files(spark, df, table, part_fields)
    n_rows = sum(rows for _rel, _sz, rows, _st, _pv in moved)

    # 3. ONE snapshot: delete manifest + data manifest, same sequence
    sid = _publish_delete_snapshot(
        table,
        del_files,
        content=2,  # EQUALITY deletes
        summary={
            "upsert-keys": str(n_keys),
            "added-records": str(n_rows),
            **{str(k): str(v) for k, v in (extra_summary or {}).items()},
        },
        equality_ids=eq_ids,
        data_moved=moved,
    )
    return {"snapshot_id": sid, "keys": n_keys, "rows": n_rows}


def iceberg_metadata_table(
    spark: SparkSession,
    path: str | os.PathLike,
    kind: str,
) -> DataFrame:
    """Iceberg's INSPECTION tables (round 15) — the ``table$kind``
    surface real Iceberg engines expose, from the table's own
    metadata (driver cost O(metadata), no data file opens):

    - ``snapshots``: one row per snapshot — id, timestamp,
      operation, manifest-list path, the summary map as JSON;
    - ``history``: the lineage newest-last with ``is_current``;
    - ``refs``: named branches/tags -> snapshot ids;
    - ``manifests``: the CURRENT snapshot's manifest-list entries —
      path, length, content (0=data/1=deletes), sequence number,
      added snapshot id;
    - ``files``: every file the current snapshot's manifests keep
      (status != DELETED) — content (0=data, 1=position deletes,
      2=equality deletes), path, record count, size, the partition
      record as JSON, sequence number;
    - ``entries`` (round 16): the RAW manifest entries of the
      current snapshot, DELETED rows included — status
      (0=existing/1=added/2=deleted), snapshot id, sequence number,
      content, path, record count;
    - ``partitions`` (round 16): live DATA rows grouped by partition
      record — partition JSON, file count, record sum;
    - ``all_files`` (round 16): the files of EVERY snapshot still in
      the metadata (deduplicated by path+content) with the newest
      snapshot id referencing each — what orphan audits diff
      against."""
    table = Path(path)
    meta = json.loads(_metadata_path(table).read_text())
    location = meta.get("location", str(table))
    cur_id = meta.get("current-snapshot-id")
    if kind == "snapshots":
        return spark.createDataFrame(
            [
                (
                    int(s["snapshot-id"]),
                    int(s.get("timestamp-ms") or 0),
                    (s.get("summary") or {}).get("operation"),
                    s.get("manifest-list"),
                    json.dumps(
                        s.get("summary") or {}, sort_keys=True
                    ),
                )
                for s in meta.get("snapshots", [])
            ],
            "snapshot_id bigint, timestamp_ms bigint, "
            "operation string, manifest_list string, summary string",
        )
    if kind == "history":
        return spark.createDataFrame(
            [
                (
                    int(s.get("timestamp-ms") or 0),
                    int(s["snapshot-id"]),
                    s["snapshot-id"] == cur_id,
                )
                for s in meta.get("snapshots", [])
            ],
            "made_current_at_ms bigint, snapshot_id bigint, "
            "is_current boolean",
        )
    if kind == "refs":
        return spark.createDataFrame(
            [
                (name, r.get("type"), int(r["snapshot-id"]))
                for name, r in sorted(
                    (meta.get("refs") or {}).items()
                )
            ],
            "name string, type string, snapshot_id bigint",
        )
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if cur_id is None or cur_id == -1 or cur_id not in snaps:
        raise ValueError(
            f"iceberg_metadata_table: no live current snapshot for "
            f"{kind!r} (current-snapshot-id={cur_id!r})"
        )
    _, entries = read_avro_file(
        _localize(snaps[cur_id]["manifest-list"], location, table)
    )
    if kind == "manifests":
        return spark.createDataFrame(
            [
                (
                    e["manifest_path"],
                    int(e.get("manifest_length") or 0),
                    int(e.get("content") or 0),
                    (
                        None
                        if e.get("sequence_number") is None
                        else int(e["sequence_number"])
                    ),
                    (
                        None
                        if e.get("added_snapshot_id") is None
                        else int(e["added_snapshot_id"])
                    ),
                )
                for e in entries
            ],
            "path string, length bigint, content int, "
            "sequence_number bigint, added_snapshot_id bigint",
        )
    def _manifest_rows(ml_entries, keep_deleted=False):
        """Flatten manifest-list entries into per-file tuples:
        (status, snapshot_id, sequence, content, path, rows, bytes,
        partition JSON)."""
        out = []
        for e in ml_entries:
            mseq = int(e.get("sequence_number") or 0)
            _, m_entries = read_avro_file(
                _localize(e["manifest_path"], location, table)
            )
            for me in m_entries:
                status = int(me.get("status") or 0)
                if status == _STATUS_DELETED and not keep_deleted:
                    continue
                rec = me["data_file"]
                sid = me.get("snapshot_id")
                out.append(
                    (
                        status,
                        None if sid is None else int(sid),
                        int(me.get("sequence_number") or mseq),
                        int(rec.get("content") or 0),
                        rec["file_path"],
                        int(rec.get("record_count") or 0),
                        int(rec.get("file_size_in_bytes") or 0),
                        json.dumps(
                            dict(rec.get("partition") or {}),
                            sort_keys=True,
                            default=str,
                        ),
                    )
                )
        return out

    if kind == "files":
        return spark.createDataFrame(
            [
                (c, p, n, b, pv, seq)
                for _st, _sid, seq, c, p, n, b, pv in _manifest_rows(
                    entries
                )
            ],
            "content int, file_path string, record_count bigint, "
            "file_size_in_bytes bigint, partition string, "
            "sequence_number bigint",
        )
    if kind == "entries":
        return spark.createDataFrame(
            [
                (st, sid, seq, c, p, n)
                for st, sid, seq, c, p, n, _b, _pv in _manifest_rows(
                    entries, keep_deleted=True
                )
            ],
            "status int, snapshot_id bigint, sequence_number bigint, "
            "content int, file_path string, record_count bigint",
        )
    if kind == "partitions":
        # [files, rows, position-delete files, equality-delete files]
        agg: dict[str, list[int]] = {}
        for _st, _sid, _seq, c, _p, n, _b, pv in _manifest_rows(
            entries
        ):
            a = agg.setdefault(pv, [0, 0, 0, 0])
            if c == 0:
                a[0] += 1
                a[1] += n
            elif c == 1:
                a[2] += 1
            elif c == 2:
                a[3] += 1
        return spark.createDataFrame(
            [
                (pv, f, n, pd_, ed)
                for pv, (f, n, pd_, ed) in sorted(agg.items())
            ],
            "partition string, file_count bigint, "
            "record_count bigint, position_delete_file_count bigint, "
            "equality_delete_file_count bigint",
        )
    if kind != "all_files":
        raise ValueError(
            f"iceberg_metadata_table: unknown kind {kind!r} — "
            "snapshots, history, refs, manifests, files, entries, "
            "partitions, all_files"
        )
    seen: dict[tuple, tuple] = {}
    for s in meta.get("snapshots", []):
        if "manifest-list" not in s:
            continue
        _, ml = read_avro_file(
            _localize(s["manifest-list"], location, table)
        )
        for _st, _sid, seq, c, p, n, b, pv in _manifest_rows(ml):
            key = (c, p)
            prev = seen.get(key)
            ref = int(s["snapshot-id"])
            if prev is None or ref > prev[5]:
                seen[key] = (c, p, n, b, pv, ref)
    return spark.createDataFrame(
        sorted(seen.values()),
        "content int, file_path string, record_count bigint, "
        "file_size_in_bytes bigint, partition string, "
        "snapshot_id bigint",
    )


def rewrite_iceberg_files(
    spark: SparkSession,
    path: str | os.PathLike,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Compaction — Iceberg's ``rewrite_data_files`` maintenance op:
    when the current snapshot carries row-level DELETE files, or more
    than one data file smaller than ``target_file_bytes``, the live
    rows are read back (deletes applied by the reader) and republished
    as an OVERWRITE snapshot with fresh, delete-free manifests — the
    merge-on-read debt is materialized.  Field ids are preserved (the
    same-schema overwrite rule), the partition spec is kept —
    transforms included, with output clustered by the TRANSFORM
    values so each partition dir gets contiguous files — and old
    snapshots stay time-travel readable until
    ``expire_iceberg_snapshots`` reclaims them.  Returns
    ``{"files_before": n, "files_after": m,
    "delete_files_removed": k}``; a no-op returns the current
    counts without committing."""
    table = Path(path)
    snap = iceberg_snapshot(spark, table)
    n_deletes = len(snap.position_deletes) + len(snap.equality_deletes)
    part_fields = (
        _spec_part_fields(snap.metadata) if snap.partition_fields else []
    )
    import pyarrow.parquet as pq

    sizes = [Path(p).stat().st_size for p, _pv, _n, _bd in snap.files]
    small = sum(1 for s in sizes if s < int(target_file_bytes))
    if n_deletes == 0 and small < 2:
        return {
            "files_before": len(snap.files),
            "files_after": len(snap.files),
            "delete_files_removed": 0,
        }
    df = read_iceberg(spark, table)
    if part_fields:
        # cluster by the TRANSFORM values (bucket id, day number, …)
        # so each output partition dir gets contiguous task files —
        # repartitioning by raw sources would spray every bucket
        # across every task and multiply small files
        tmp_cols = []
        for i, pf in enumerate(part_fields):
            tc = f"__rw_part_{i}"
            df = _with_partition_value(df, pf, tc)
            tmp_cols.append(tc)
        df = df.repartition(*tmp_cols).drop(*tmp_cols)
    else:
        total = sum(sizes)
        df = df.coalesce(max(1, -(-total // int(target_file_bytes))))
    write_iceberg(
        df, table, mode="overwrite",
        partition_by=[
            (pf.source, pf.transform) for pf in part_fields
        ] or None,
        extra_summary={"rewritten-data-files": str(len(snap.files))},
    )
    after = iceberg_snapshot(spark, table)
    return {
        "files_before": len(snap.files),
        "files_after": len(after.files),
        "delete_files_removed": n_deletes,
    }


def set_iceberg_properties(
    path: str | os.PathLike,
    properties: dict,
) -> dict:
    """ALTER TABLE SET/UNSET TBLPROPERTIES for the Iceberg bridge —
    one metadata version whose ``properties`` map merges the given
    entries (``None`` UNSETs); commits preserve the map from then on
    (round 16).  Returns the resulting properties map."""
    table = Path(path)
    md = table / "metadata"
    meta = json.loads(_metadata_path(table).read_text())
    props = dict(meta.get("properties") or {})
    for k, v in properties.items():
        if v is None:
            props.pop(str(k), None)
        else:
            props[str(k)] = str(v)
    meta["properties"] = props
    meta["last-updated-ms"] = int(time.time() * 1000)
    hint = md / "version-hint.text"
    version = int(hint.read_text().strip()) + 1 if hint.exists() else 1
    with open(
        md / f"v{version}.metadata.json", "x", encoding="utf-8"
    ) as fh:
        fh.write(json.dumps(meta, indent=1))
    hint.write_text(str(version))
    return props


def fast_forward_iceberg(
    path: str | os.PathLike,
    from_ref: str,
    to_ref: str = "main",
) -> int:
    """PUBLISH a branch — Iceberg's fast-forward: move ``to_ref``
    (default main, which also moves current-snapshot-id) to
    ``from_ref``'s head, refusing unless the target's current head
    is an ANCESTOR of the source head (walked via the
    manifest-lists' parent-snapshot-id chain — a fast-forward never
    rewrites history; diverged refs need a real merge).  The
    write-audit-publish loop: ``write_iceberg(branch="audit")`` →
    validate ``read_iceberg(ref="audit")`` → ``fast_forward_iceberg
    (path, "audit")``.  Returns the published snapshot id."""
    from snapflow_spark.functions.avro_codec import read_avro_metadata

    table = Path(path)
    md = table / "metadata"
    meta = json.loads(_metadata_path(table).read_text())
    refs = dict(meta.get("refs") or {})
    src = refs.get(from_ref)
    if src is None:
        raise ValueError(
            f"fast_forward_iceberg: ref {from_ref!r} not in "
            f"{sorted(refs)}"
        )
    head = int(src["snapshot-id"])
    location = meta.get("location", str(table))
    by_id = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    tgt = refs.get(to_ref)
    if tgt is not None and int(tgt["snapshot-id"]) != head:
        target = int(tgt["snapshot-id"])

        def _parent(sid: int) -> int | None:
            s = by_id.get(sid)
            if s is None:
                return None
            # prefer the spec-standard JSON field — O(1) per hop;
            # fall back to the manifest-list's Avro metadata only
            # for foreign-written snapshots that omit it
            if "parent-snapshot-id" in s:
                p = s["parent-snapshot-id"]
                return None if p in (None, -1) else int(p)
            if "manifest-list" not in s:
                return None
            raw = read_avro_metadata(
                _localize(s["manifest-list"], location, table)
            ).get("parent-snapshot-id")
            if raw is None:
                return None
            txt = raw.decode() if isinstance(raw, bytes) else str(raw)
            return None if txt in ("null", "None", "") else int(txt)

        anc, seen, ok = head, set(), False
        while anc is not None and anc not in seen:
            if anc == target:
                ok = True
                break
            seen.add(anc)
            anc = _parent(anc)
        if not ok:
            raise ValueError(
                f"fast_forward_iceberg: {to_ref!r} (at {target}) is "
                f"not an ancestor of {from_ref!r} (at {head}) — the "
                "refs have diverged; fast-forward never rewrites "
                "history"
            )
    refs[to_ref] = {"snapshot-id": head, "type": "branch"}
    meta["refs"] = refs
    if to_ref == "main":
        meta["current-snapshot-id"] = head
    meta["last-updated-ms"] = int(time.time() * 1000)
    hint = md / "version-hint.text"
    version = int(hint.read_text().strip()) + 1 if hint.exists() else 1
    with open(
        md / f"v{version}.metadata.json", "x", encoding="utf-8"
    ) as fh:
        fh.write(json.dumps(meta, indent=1))
    hint.write_text(str(version))
    return head


def rewrite_iceberg_manifests(
    spark: SparkSession,
    path: str | os.PathLike,
    target_entries_per_manifest: int = 100_000,
) -> dict:
    """Manifest compaction — Iceberg's ``rewrite_manifests``
    maintenance op: every append carries the prior manifest-list
    entries forward, so a long-lived table's PLANNING cost grows
    O(#snapshots) manifest files opened per scan.  This folds all
    live DATA entries into ⌈entries/target⌉ fresh manifests in ONE
    metadata-only commit (operation ``replace`` — zero data files
    touched): entries land as status EXISTING carrying their
    ORIGINAL snapshot id and data sequence number EXPLICITLY (the
    inherit rule would re-stamp them and break equality-delete
    scoping), partition records and column bounds pass through
    verbatim so partition/min-max pruning is unchanged, and DELETE
    manifests carry forward untouched at their sequence.  Old
    snapshots stay time-travel readable.  Returns
    ``{"manifests_before": n, "manifests_after": m, "entries": k}``;
    a table with <= 1 data manifest is a no-op without a commit."""
    table = Path(path)
    md = table / "metadata"
    meta = json.loads(_metadata_path(table).read_text())
    _guard_v3_write(meta, "rewrite_iceberg_manifests")
    cur_id = meta.get("current-snapshot-id")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if cur_id in (None, -1) or cur_id not in snaps:
        raise ValueError(
            "rewrite_iceberg_manifests: the table has no live "
            f"current snapshot (current-snapshot-id={cur_id!r})"
        )
    location = meta.get("location", str(table))
    cur = snaps[cur_id]
    _, ml_entries = read_avro_file(
        _localize(cur["manifest-list"], location, table)
    )
    data_mans = [
        e for e in ml_entries if int(e.get("content") or 0) == 0
    ]
    delete_mans = [
        e for e in ml_entries if int(e.get("content") or 0) == 1
    ]
    live: list[dict] = []
    for e in data_mans:
        mseq = int(e.get("sequence_number") or 0)
        added_sid = e.get("added_snapshot_id")
        _, m_entries = read_avro_file(
            _localize(e["manifest_path"], location, table)
        )
        for me in m_entries:
            if int(me.get("status") or 0) == _STATUS_DELETED:
                continue
            rec = me["data_file"]
            sid = me.get("snapshot_id")
            live.append(
                {
                    "status": 0,  # EXISTING
                    "snapshot_id": (
                        int(sid) if sid is not None
                        else (int(added_sid)
                              if added_sid is not None else None)
                    ),
                    "sequence_number": int(
                        me.get("sequence_number") or mseq or 0
                    ),
                    "data_file": {
                        "file_path": rec["file_path"],
                        "file_format": rec.get(
                            "file_format", "PARQUET"
                        ),
                        "partition": dict(rec.get("partition") or {}),
                        "record_count": int(
                            rec.get("record_count") or 0
                        ),
                        "file_size_in_bytes": int(
                            rec.get("file_size_in_bytes") or 0
                        ),
                        "block_size_in_bytes": int(
                            rec.get("block_size_in_bytes") or 67108864
                        ),
                        "lower_bounds": rec.get("lower_bounds"),
                        "upper_bounds": rec.get("upper_bounds"),
                    },
                }
            )
    if len(data_mans) <= 1:
        return {
            "manifests_before": len(data_mans),
            "manifests_after": len(data_mans),
            "entries": len(live),
        }
    part_fields = [
        (pf.name, pf.avro) for pf in _spec_part_fields(meta)
    ]
    spec_raw = _default_spec_raw(meta)
    schema_json = json.dumps(
        {"type": "struct", "schema-id": 0,
         "fields": _raw_schema_fields(meta)},
        separators=(",", ":"),
    )
    fv = int(meta.get("format-version", 1) or 1)
    now_ms = int(time.time() * 1000)
    snapshot_id = now_ms * 1000 + 7
    while snapshot_id in snaps:
        snapshot_id += 1
    chunk = max(1, int(target_entries_per_manifest))
    new_entries: list[dict] = []
    n_new = 0
    for i in range(0, max(len(live), 1), chunk):
        part = live[i : i + chunk]
        if not part and live:
            continue
        name = f"manifest-rw-{uuid.uuid4().hex}.avro"
        write_avro_file(
            md / name,
            _manifest_entry_schema(part_fields, include_seq=True),
            part,
            extra_metadata={
                "schema": schema_json,
                "schema-id": "0",
                "partition-spec": json.dumps(
                    spec_raw, separators=(",", ":")
                ),
                "partition-spec-id": "0",
                "format-version": str(fv),
                "content": "data",
            },
        )
        new_entries.append(
            {
                "manifest_path": f"{location}/metadata/{name}",
                "manifest_length": (md / name).stat().st_size,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": None,  # per-entry seqs are explicit
                "added_snapshot_id": snapshot_id,
            }
        )
        n_new += 1
        if not live:
            break
    ml_name = f"snap-{snapshot_id}-manifest-list.avro"
    write_avro_file(
        md / ml_name,
        _MANIFEST_FILE_SCHEMA,
        new_entries
        + [
            {
                "manifest_path": e["manifest_path"],
                "manifest_length": int(e["manifest_length"]),
                "partition_spec_id": int(
                    e.get("partition_spec_id") or 0
                ),
                "content": 1,
                "sequence_number": e.get("sequence_number"),
                "added_snapshot_id": e.get("added_snapshot_id"),
            }
            for e in delete_mans
        ],
        extra_metadata={
            "snapshot-id": str(snapshot_id),
            "parent-snapshot-id": str(cur_id),
            "format-version": str(fv),
        },
    )
    meta["snapshots"] = list(meta.get("snapshots", [])) + [
        {
            "snapshot-id": snapshot_id,
            "timestamp-ms": now_ms,
            "summary": {
                "operation": "replace",
                "manifests-replaced": str(len(data_mans)),
                "manifests-created": str(n_new),
                "entries": str(len(live)),
            },
            "manifest-list": f"{location}/metadata/{ml_name}",
        }
    ]
    meta["current-snapshot-id"] = snapshot_id
    refs = dict(meta.get("refs") or {})
    refs["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
    meta["refs"] = refs
    meta["last-updated-ms"] = now_ms
    hint = md / "version-hint.text"
    version = int(hint.read_text().strip()) + 1 if hint.exists() else 1
    with open(
        md / f"v{version}.metadata.json", "x", encoding="utf-8"
    ) as fh:
        fh.write(json.dumps(meta, indent=1))
    hint.write_text(str(version))
    return {
        "manifests_before": len(data_mans),
        "manifests_after": n_new,
        "entries": len(live),
    }


def iceberg_stream_sink(
    path: str | os.PathLike,
    app_id: str,
    keys: list[str] | None = None,
):
    """EXACTLY-ONCE streaming writes INTO an Iceberg table — the
    ``delta_stream_sink`` twin, keyed the way real Iceberg streaming
    sinks (Flink's, Spark's own) are: each micro-batch commits with a
    ``streaming.<app_id>.batch-id`` entry in the snapshot SUMMARY,
    and a replayed batch id at or below the lineage's recorded
    high-water mark is skipped.  The high-water mark is the max over
    ALL snapshots still in the metadata, so interleaved non-sink
    commits can't drop it; ``expire_iceberg_snapshots`` keeping at
    least the newest sink commit preserves it too (expiring EVERY
    sink snapshot while the stream is down would forget the mark —
    the same trade Flink documents).

    ``keys`` (round 15) switches the sink to UPSERT mode — the other
    half of CDC: each micro-batch lands through ``upsert_iceberg``
    (equality delete + data at the same sequence, one snapshot), so
    a keyed changelog stream applies replace-by-key exactly-once —
    Flink's ``upsert=true`` Iceberg sink.  The changelog must carry
    one row per key per batch (``dedupe_keep_latest`` upstream).

    Usage::

        q = (curated.writeStream
             .foreachBatch(iceberg_stream_sink(table, "my-pipeline"))
             .option("checkpointLocation", ckpt).start())
    """
    target = Path(path)
    key = f"streaming.{app_id}.batch-id"
    keys = list(keys) if keys is not None else None

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            meta = json.loads(_metadata_path(target).read_text())
        except FileNotFoundError:
            meta = {}
        high = max(
            (
                int(s["summary"][key])
                for s in meta.get("snapshots", [])
                if key in (s.get("summary") or {})
            ),
            default=-1,
        )
        if int(batch_id) <= high:
            return  # already committed: idempotent replay
        if keys is not None:
            upsert_iceberg(
                batch_df.sparkSession,
                target,
                batch_df,
                keys=keys,
                extra_summary={key: int(batch_id)},
            )
            return
        write_iceberg(
            batch_df,
            target,
            mode="append",
            extra_summary={key: int(batch_id)},
        )

    return write_batch


def remove_orphan_iceberg_files(
    spark: SparkSession,
    path: str | os.PathLike,
    retention_hours: float = 168.0,
    dry_run: bool = False,
) -> list[str]:
    """Delete files under ``data/`` that NO snapshot in the current
    metadata references — crashed staging leftovers, files orphaned
    by interrupted commits (Iceberg's removeOrphanFiles).  The
    retention window (default 7 days) protects in-flight writes: a
    file newer than ``now - retention_hours`` is never touched, since
    ``write_iceberg`` moves data files into place BEFORE publishing
    metadata.  Only ``data/`` is swept — ``metadata/`` bookkeeping
    belongs to ``expire_iceberg_snapshots``.  Returns deleted paths
    relative to the table root; ``dry_run=True`` lists only."""
    if retention_hours < 0:
        raise ValueError(
            "remove_orphan_iceberg_files: retention_hours must be "
            f">= 0, got {retention_hours}"
        )
    table = Path(path)
    meta = json.loads(_metadata_path(table).read_text())
    location = meta.get("location", "")
    referenced: set[str] = set()
    for s in meta.get("snapshots", []):
        _m, d = _snapshot_file_refs(s, location, table)
        referenced |= d
    cutoff = time.time() - retention_hours * 3600.0
    out: list[str] = []
    data = table / "data"
    for p in data.rglob("*") if data.is_dir() else ():
        if not p.is_file() or str(p) in referenced:
            continue
        try:
            if p.stat().st_mtime >= cutoff:
                continue  # inside the retention window: keep
        except FileNotFoundError:
            continue
        out.append(str(p.relative_to(table)))
    out.sort()
    if not dry_run:
        for rel in out:
            (table / rel).unlink(missing_ok=True)
    return out
