"""Benchmark harness (driver contract).

Runs every declared query from ``snapflow_spark.registry`` at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints a compact totals-only JSON
line followed by the full per-query JSON line:

    {"metric": "...", "unit": "sec", ..., "value": N, "value_warm": N}
    {"metric": "...", "unit": "sec", "queries": {...}, ..., "value": N}

(totals are the LAST keys of the full line so a bounded tail capture
still recovers them; BENCH_r02 lost its cold total to a head cut)

Each query is fully materialized through Spark's `noop` sink so the
whole physical plan (scan -> shuffle -> agg/join) executes, without
paying driver-side collect/serialization that the driver's own
correctness pass already measures.

Usage:
    python bench.py                # all queries @ sf0.1
    python bench.py q_agg_basic    # subset
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from snapflow_spark.registry import all_queries  # noqa: E402
from snapflow_spark.session import build_session  # noqa: E402


def run(sf_dir: str, names: list[str]) -> dict:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    queries = all_queries()
    spark = build_session("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up on the smallest sf so first-query timing is not dominated
    # by one-time session costs: JVM/codegen (q_agg_basic) and python
    # worker spawn for pandas-UDF stages (q_dedup_simhash) — a
    # long-running cluster has warm workers.
    for warm in ("q_agg_basic", "q_dedup_simhash"):
        queries[warm](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    def one_pass() -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            # queries are independent; drop any persist() a query left
            # behind so later timings aren't skewed by storage-memory
            # eviction of accumulated cache segments
            spark.catalog.clearCache()
        return timings

    # Two passes: pass 1 includes residual first-touch costs (file
    # listing, codegen compiles for each query shape); pass 2 is the
    # steady state a long-running cluster sees. Headline value stays
    # the COLD pass total; `queries_warm`/`value_warm` carry the
    # honest steady-state numbers. Caveat vs BENCH_r01: r01 let
    # persisted candidate sets accumulate across queries (skewing its
    # late queries via storage eviction), while this harness clears
    # cache between queries — the r01 comparison is indicative, the
    # warm pass is the number to trend.
    timings = one_pass()
    warm = one_pass()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Key order matters for capture robustness: the driver records a
    # bounded tail of stdout (BENCH_r02's cold total was cut off the
    # FRONT of the line). Per-query dicts go first and every scalar
    # total goes LAST so the totals survive any tail cap.
    return {
        "metric": "total_wall_sec_all_declared_queries",
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "cpus": int(cpus),
        "value": round(sum(timings.values()), 3),
        "value_warm": round(sum(warm.values()), 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or sorted(all_queries())
    result = run(sf_dir, names)
    # Compact totals-only line first (survives head-capture and gives a
    # human-greppable summary), then the full per-query JSON line.
    summary = {k: result[k] for k in ("metric", "unit", "sf", "n_queries", "cpus", "value", "value_warm")}
    print(json.dumps(summary))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
