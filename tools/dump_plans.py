"""Dump .explain("formatted") for named declared queries to files.

Round-17 deliverable helper: the judge checks plan claims against
committed `plans/r17/<query>_{before,after}.txt` files.

Usage:
    python tools/dump_plans.py --out plans/r17 --suffix _after q_a q_b
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="plans/r17")
    ap.add_argument("--suffix", default="_after")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from snapflow_spark.registry import all_queries
    from snapflow_spark.session import build_session

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    spark = build_session("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in args.names:
        df = queries[name](spark, args.sf)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out / f"{name}{args.suffix}.txt"
        path.write_text(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
