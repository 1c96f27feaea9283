"""Core-scaling probe for the LLM-operator family (round 18, VERDICT
r17 item 5): the sf0.1 warm bench is overhead-bound — 8-core and
32-core totals read identical — so a parallelism regression in an
executor-side operator would be invisible there. This harness runs the
heavy LLM queries at the gen_scale.py ~10x corpus under TWO core
counts (separate processes — ``local[n]`` is fixed per JVM) and
records the warm speedup ratio per query into SCALE_BENCH.json under
``core_scaling``.

Reading the ratios: the fixture corpus is small enough that per-job
fixed costs (python worker rounds, AQE planning, barriers) bound the
achievable speedup well below cores_high/cores_low; the claim checked
here is DIRECTION and MAGNITUDE — every executor-heavy query must get
meaningfully faster with 4x the cores (ratio >> 1), and a ratio ~1
names a serial bottleneck to fix. Wall numbers come min-of-N with the
same noop-sink protocol as bench.py.

Usage::

    python tools/bench_cores.py                 # orchestrates both runs
    python tools/bench_cores.py --worker 8      # internal: one core count
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: The LLM-operator family the verdict asks to certify (heavy
#: executor-side text/embedding work), all bound to scaled tables.
FAMILY = [
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_dedup_simhash",
    "q_fingerprint_winnow",
    "q_embed_near_dup",
    "q_text_quality",
]


def worker(cpus: int, sf_dir: str, reps: int) -> dict:
    from snapflow_spark.registry import all_queries
    from snapflow_spark.session import build_session

    spark = build_session("bench-cores", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out: dict[str, float] = {}
    for name in FAMILY:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scratch/sf1")
    ap.add_argument("--cpus-low", type=int, default=8)
    ap.add_argument("--cpus-high", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="SCALE_BENCH.json")
    ap.add_argument("--worker", type=int, default=None, help="internal")
    args = ap.parse_args()

    if args.worker is not None:
        print(json.dumps(worker(args.worker, args.sf, args.reps)))
        return

    results: dict[int, dict[str, float]] = {}
    for cpus in (args.cpus_low, args.cpus_high):
        cmd = [
            sys.executable, __file__, "--worker", str(cpus),
            "--sf", args.sf, "--reps", str(args.reps),
        ]
        env = dict(os.environ)
        proc = subprocess.run(
            cmd, capture_output=True, text=True, env=env, check=True
        )
        results[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(f"cpus={cpus}: {results[cpus]}", flush=True)

    lo, hi = args.cpus_low, args.cpus_high
    block = {
        "sf": args.sf,
        "cpus_low": lo,
        "cpus_high": hi,
        "protocol": f"warm min-of-{args.reps}, noop sink, separate process per core count",
        "queries": {
            name: {
                "low_sec": results[lo][name],
                "high_sec": results[hi][name],
                "speedup": round(results[lo][name] / results[hi][name], 2)
                if results[hi][name]
                else None,
            }
            for name in FAMILY
        },
    }
    out_path = Path(args.out)
    doc = json.loads(out_path.read_text()) if out_path.exists() else {}
    doc["core_scaling"] = block
    out_path.write_text(json.dumps(doc, indent=2) + "\n")
    print(f"wrote core_scaling into {args.out}")


if __name__ == "__main__":
    main()
