"""Per-query CONSTRUCTION cost profiler (round 18, guide §1).

Measures, for each declared query, the driver-side cost of just
*building* the DataFrame (no action): wall seconds and py4j round
trips (send_command calls — the direct measure of driver↔JVM chatter).
Construction is paid once per warm rep by bench.py, so it is pure
overhead at any scale factor and the first target of the round-18
chatter work (VERDICT r17 item 1).

Usage:
    python tools/profile_construction.py [query ...]   # default: all
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from snapflow_spark.registry import all_queries  # noqa: E402
from snapflow_spark.session import build_session  # noqa: E402

_COUNT = {"n": 0}


def _patch_py4j() -> None:
    import py4j.clientserver as cs
    import py4j.java_gateway as jg

    real_cs = cs.ClientServerConnection.send_command

    def counted_cs(self, *a, **k):
        _COUNT["n"] += 1
        return real_cs(self, *a, **k)

    cs.ClientServerConnection.send_command = counted_cs

    real_gc = jg.GatewayClient.send_command

    def counted_gc(self, *a, **k):
        _COUNT["n"] += 1
        return real_gc(self, *a, **k)

    jg.GatewayClient.send_command = counted_gc


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _patch_py4j()
    queries = all_queries()
    names = sys.argv[1:] or sorted(queries)
    spark = build_session("profile-construction")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the catalog/caches the same way a bench rep sees them
    for name in names:
        queries[name](spark, sf_dir)
    rows = []
    for name in names:
        best_t, best_c = float("inf"), 0
        for _ in range(3):
            c0 = _COUNT["n"]
            t0 = time.perf_counter()
            queries[name](spark, sf_dir)
            dt = time.perf_counter() - t0
            if dt < best_t:
                best_t, best_c = dt, _COUNT["n"] - c0
        rows.append((name, round(best_t, 4), best_c))
    rows.sort(key=lambda r: -r[1])
    total_t = sum(r[1] for r in rows)
    total_c = sum(r[2] for r in rows)
    for name, t, c in rows:
        print(f"{t:8.4f}s  {c:6d} rt  {name}")
    print(f"{total_t:8.4f}s  {total_c:6d} rt  TOTAL (warm construction, min of 3)")
    print(json.dumps({r[0]: {"sec": r[1], "roundtrips": r[2]} for r in rows}))


if __name__ == "__main__":
    main()
