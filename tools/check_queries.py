"""Local driver-mimicking correctness harness.

Runs every declared query at a given sf dir through BOTH the Spark
implementation and the DuckDB oracle, then compares:
  - row count
  - column names (sorted)
  - order-insensitive values (exact after canonicalization)

Exact equality here is deliberately STRICTER than any plausible driver
hash: if values match exactly cell-for-cell, any order-insensitive
value hash matches too.

Usage:
  python tools/check_queries.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from snapflow_spark.catalog import TABLES, table_path  # noqa: E402
from snapflow_spark.registry import QUERIES  # noqa: E402
from snapflow_spark.session import build_session  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def canon(v):
    """Canonicalize one cell for order-insensitive exact comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    return v


def rowset(cols: list[str], rows: list[tuple]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


def compare(name: str, spark, con, sf_dir: str, verbose: bool = False) -> dict:
    spec = QUERIES[name]
    t0 = time.time()
    df = spec.fn(spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    t_spark = time.time() - t0

    if spec.oracle is None:
        return {"name": name, "status": "rows-only", "rows": len(spark_rows), "sec": round(t_spark, 2)}

    t0 = time.time()
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    t_duck = time.time() - t0

    out = {"name": name, "rows": len(spark_rows), "sec": round(t_spark, 2), "duck_sec": round(t_duck, 2)}
    if sorted(spark_cols) != sorted(duck_cols):
        out["status"] = "SCHEMA-MISMATCH"
        out["spark_cols"] = sorted(spark_cols)
        out["duck_cols"] = sorted(duck_cols)
        return out
    if len(spark_rows) != len(duck_rows):
        out["status"] = "COUNT-MISMATCH"
        out["duck_rows"] = len(duck_rows)
        return out
    a, b = rowset(spark_cols, spark_rows), rowset(duck_cols, duck_rows)
    if a == b:
        out["status"] = "ok"
        return out
    out["status"] = "VALUE-MISMATCH"
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    out["n_diff"] = len(diffs)
    if verbose and diffs:
        out["first_diff"] = [repr(diffs[0][0])[:300], repr(diffs[0][1])[:300]]
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    import snapflow_spark.queries  # noqa: F401

    names = args.names or sorted(QUERIES)
    spark = build_session("check-queries")
    con = duck_connection(args.sf)

    failed = 0
    for name in names:
        if name not in QUERIES:
            print(f"{name:28s} UNKNOWN")
            failed += 1
            continue
        try:
            r = compare(name, spark, con, args.sf, args.verbose)
        except Exception:
            r = {"name": name, "status": "ERROR"}
            if True:
                traceback.print_exc()
        status = r.pop("status")
        ok = status in ("ok", "rows-only")
        failed += 0 if ok else 1
        print(f"{r.pop('name'):28s} {status:16s} {r}")
    print(f"\n{len(names) - failed}/{len(names)} passing")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
