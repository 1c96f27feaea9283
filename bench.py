"""Benchmark harness (driver contract).

Runs every declared query from ``snapflow_spark.registry`` at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints the full per-query JSON line
followed by a compact bounded-size summary line:

    {"metric": "...", "unit": "sec", "queries": {...}, ..., "value": N}
    {"metric": "...", ..., "slowest_warm": {...}, "value_cold": N, "value": N}

``value`` (the driver headline) is the min-of-3 WARM total — the
contention-proof steady-state number; the single-shot cold pass is
reported as ``value_cold`` (round-7 change, see run()).

(the driver records a bounded 2000-byte tail of stdout and parses
the LAST line — r02/r03 both lost the head of a too-long last line,
so the last line is a byte-budgeted summary that always survives the
cap; since round 18 it carries the full warm per-query dict under
"queries" — ~1.7 KB for 50 queries, trimmed fastest-first in the
rare case it would exceed the budget — so the driver's per-query
PERF comparison works; totals remain the last keys of both lines)

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


def _cpu_spin_ms() -> float:
    """Fixed single-core python spin, reported in ms — a DIRECT host
    steal/contention stamp. Loadavg conflates our own local[32] work
    with external steal; this spin is a constant amount of work, so
    the ratio between two rounds' readings multiplies every
    single-threaded section of the bench. Measured at start AND end
    of the run; the idle-window reference reading for this box is
    recorded in SCALE.md (§host-noise) — a reading 2x that means the
    round's wall numbers are inflated by the host, not the code."""
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i
    return round((time.perf_counter() - t0) * 1000, 1)


_MEM_BUFS = []


def _mem_copy_ms() -> float:
    """64 MB numpy copyto, min of 3, in ms — the MEMORY-BANDWIDTH
    steal stamp. This box's decisive noise source turned out to be
    bandwidth, not cycles: the single-core ALU spin read a calm
    65-80 ms while the same 64 MB copy swung 13 ms ↔ 590 ms and
    memory-bound queries (the Gopher folds) swung 5x in lockstep.
    Buffers are preallocated and first-touched once so page faults
    never pollute the reading; healthy reference ~13 ms (≈10 GB/s),
    a contended window reads 10-40x that."""
    import numpy as np

    if not _MEM_BUFS:
        a = np.ones(64 * 1024 * 1024 // 8)
        b = np.empty_like(a)
        np.copyto(b, a)  # first-touch b's pages outside the clock
        _MEM_BUFS.extend((a, b))
    a, b = _MEM_BUFS
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.copyto(b, a)
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


_GEMM_BUFS = []


def _gemm_ms() -> float:
    """Fixed 1200^3 float64 matmul, min of 3, in ms — the AGGREGATE
    multi-core throughput stamp. The single-core spin misses N-way
    steal: a co-tenant can leave one core fast (spin reads calm) while
    stealing half the chip, which slows every 32-way Spark stage
    uniformly (observed: spins 61-96 ms calm, mem copy healthy, yet
    the warm total +11% with per-query spreads ~1.1 — sustained
    wide contention is invisible to both existing stamps). BLAS gemm
    uses all cores, so its ratio to the calm reference multiplies the
    parallel sections the way the spin multiplies serial ones.
    Buffers preallocated + first-touched outside the clock."""
    import numpy as np

    if not _GEMM_BUFS:
        rng = np.random.default_rng(7)
        a = rng.standard_normal((1200, 1200))
        b = rng.standard_normal((1200, 1200))
        a @ b  # warm BLAS thread pool outside the clock
        _GEMM_BUFS.extend((a, b))
    a, b = _GEMM_BUFS
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        a @ b
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


def run(sf_dir: str, names: list[str]) -> dict:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spin_start_ms = _cpu_spin_ms()
    mem_start_ms = _mem_copy_ms()
    gemm_start_ms = _gemm_ms()
    queries = all_queries()
    spark = build_session("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up on the smallest sf so first-query timing is not dominated
    # by one-time session costs: JVM/codegen (q_agg_basic), python
    # worker spawn for pandas-UDF stages (q_dedup_simhash), and the
    # parquet write committer classloading (the tiny write below, which
    # otherwise lands on whichever snapshot-writing query runs first) —
    # a long-running cluster has all three warm.
    for warm in ("q_agg_basic", "q_dedup_simhash"):
        queries[warm](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.range(2).write.mode("overwrite").parquet(f"{td}/warm")

    mid_spins: list[float] = []
    mid_mems: list[float] = []
    # per-query self-adjudication (round 10): each warm delta carries
    # its own noise verdict — the spin/mem stamps sampled around ITS
    # rep block plus the rep spread (max/min of its samples). A +50%
    # like r9's q_dedup_minhash then reads directly: spread ~1 + calm
    # stamps = real; spread >2 or a hot stamp = the host, rerun.
    query_stamps: dict[str, dict[str, float]] = {}
    query_spread: dict[str, float] = {}

    def one_pass(repeats: int = 1) -> dict[str, float]:
        # repeats>1 takes the MIN of `repeats` back-to-back runs per
        # query: this box has external CPU steal (BENCH_r05's warm
        # total read 91 s vs a 45 s idle reproduction of the same
        # code), and a single-shot sample under contention corrupts
        # the driver's cross-round trend signal. Min-of-N is the same
        # protocol tools/bench_scale.py already uses for that reason.
        timings: dict[str, float] = {}
        for name in names:
            # per-query steal sample: the endpoint spins miss mid-run
            # bursts (observed: one run's endpoints read 63/75 ms
            # while q_similarity_ann sat at 10x its usual warm time —
            # the burst hit in the middle); ~65 ms per query is noise
            # next to any query's runtime
            spin_before = _cpu_spin_ms()
            mem_before = _mem_copy_ms()
            mid_spins.append(spin_before)
            mid_mems.append(mem_before)
            samples: list[float] = []
            # ADAPTIVE reps (round 9): a steal burst during one
            # query's rep block can inflate all `repeats` samples at
            # once — min-of-3 then reports a number that is pure host
            # noise. When the samples disagree by >2x, take up to two
            # extra reps: either the burst has passed (the min
            # recovers) or the extra minutes were genuinely not
            # available and the spread stays on record via the spin
            # samples. Bounded: worst case 5 reps per query.
            max_reps = repeats + 2 if repeats > 1 else repeats
            while len(samples) < repeats or (
                len(samples) < max_reps
                and max(samples) > 2 * min(samples)
            ):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
                # queries are independent; drop any persist() a query
                # left behind so later timings aren't skewed by
                # storage-memory eviction of accumulated cache segments
                spark.catalog.clearCache()
            timings[name] = round(min(samples), 3)
            if repeats > 1:  # warm pass: the trended number
                query_spread[name] = round(max(samples) / min(samples), 2)
                query_stamps[name] = {
                    "spin_ms": spin_before,
                    "mem_ms": mem_before,
                }
        return timings

    # Two passes: pass 1 includes residual first-touch costs (file
    # listing, codegen compiles for each query shape); pass 2 is the
    # steady state a long-running cluster sees. HEADLINE `value` is
    # the WARM min-of-3 total (round-7 change, per the round-6
    # verdict): the single-shot cold pass absorbs host steal directly
    # — BENCH_r06's cold read +28% over r05 purely from loadavg 9.4
    # while the warm total IMPROVED in the same run — so trending cold
    # lets a contended box fake a 2x regression. Cold stays reported
    # as `value_cold`/`queries_cold` (first-touch costs are real, they
    # just happen once and shouldn't headline). Cold stays single-shot:
    # a min-of-N cold pass would just be a second warm pass.
    cold_loadavg = round(os.getloadavg()[0], 2)
    cold = one_pass()
    warm = one_pass(repeats=3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Key order matters for capture robustness: the driver records a
    # bounded tail of stdout (BENCH_r02's cold total was cut off the
    # FRONT of the line). Per-query dicts go first and every scalar
    # total goes LAST so the totals survive any tail cap.
    return {
        "metric": "total_wall_sec_all_declared_queries",
        "unit": "sec",
        "queries": warm,
        "queries_cold": cold,
        # per-query adjudication (round 10): rep spread (max/min of
        # the query's own warm samples) + the spin/mem stamps sampled
        # right before its rep block — a warm delta is real only if
        # its spread is ~1 AND its stamps read calm (see SCALE.md
        # §host-noise for this box's reference values)
        "warm_spread": query_spread,
        "warm_stamps": query_stamps,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(warm),
        "cpus": int(cpus),
        # 1-minute loadavg before the cold pass / at end of run: >~4
        # means external steal was present and the single-shot cold
        # numbers are inflated; the min-of-3 warm headline resists it.
        "loadavg_cold_1m": cold_loadavg,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        # fixed-work single-core spin at start/end (ms): the direct
        # steal stamp — idle reference ~170 ms; 2x that means host
        # contention inflated this round's wall numbers (see
        # _cpu_spin_ms)
        "cpu_spin_start_ms": spin_start_ms,
        "cpu_spin_end_ms": _cpu_spin_ms(),
        # mid-run coverage: one spin sample before every query's rep
        # block (cold + warm passes) — median = the run's typical
        # steal level, max = the worst burst any query may have eaten
        "cpu_spin_mid_med_ms": round(
            sorted(mid_spins)[len(mid_spins) // 2], 1
        )
        if mid_spins
        else None,
        "cpu_spin_mid_max_ms": max(mid_spins) if mid_spins else None,
        # memory-bandwidth stamps (the stronger signal on this box —
        # see _mem_copy_ms): healthy ~13 ms, contended 10-40x that
        "mem_copy_start_ms": mem_start_ms,
        "mem_copy_end_ms": _mem_copy_ms(),
        # aggregate multi-core throughput stamp (round 10 — the signal
        # the single-core spin cannot see; _gemm_ms): record the calm
        # reference on first use, then compare ratios
        "gemm_start_ms": gemm_start_ms,
        "gemm_end_ms": _gemm_ms(),
        "mem_copy_mid_med_ms": round(
            sorted(mid_mems)[len(mid_mems) // 2], 1
        )
        if mid_mems
        else None,
        "mem_copy_mid_max_ms": max(mid_mems) if mid_mems else None,
        "value_cold": round(sum(cold.values()), 3),
        # value == value_warm: `value` is what the driver headlines,
        # `value_warm` is kept so r04-r06 cross-round warm trends keep
        # a stable key to read.
        "value_warm": round(sum(warm.values()), 3),
        "value": round(sum(warm.values()), 3),
    }


def write_history(result: dict, here: Path) -> None:
    """BENCH_HISTORY.json: the cross-round per-query record, built
    MECHANICALLY from the driver-recorded BENCH_r*.json files plus
    this live run — so adjudications like r9's q_dedup_minhash
    ("+50% but spread 2.1 and a hot stamp → host, not code") are a
    table lookup instead of prose archaeology in SCALE.md.

    Shape: ``rounds`` = run-level stamps per round (spin/mem/gemm +
    totals — the calm-or-contended verdict inputs), ``queries`` =
    per query, per round: warm min-of-3 (the trended number), rep
    spread, and the spin/mem stamps sampled before its rep block.

    SELF-ACCUMULATING: the driver's recorded BENCH_r*.json keeps only
    the bounded summary line (totals + the 8 slowest queries), so
    full per-query rows for a past round survive only through the
    history file each live run committed.  Merge order: previous
    BENCH_HISTORY.json first (full live data), BENCH_r*.json
    summaries fill gaps only, this run overwrites its own round —
    tagged r<max recorded + 1>, matching the BENCH_r{N}.json the
    driver is about to record for it."""
    rounds: dict[str, dict] = {}
    queries: dict[str, dict[str, dict]] = {}

    def add(tag: str, rec: dict, overwrite: bool) -> None:
        meta = {
            k: rec.get(k)
            for k in (
                "value_warm",
                "value_cold",
                "loadavg_1m",
                "cpu_spin_start_ms",
                "cpu_spin_end_ms",
                "cpu_spin_mid_med_ms",
                "cpu_spin_mid_max_ms",
                "mem_copy_mid_med_ms",
                "mem_copy_mid_max_ms",
                "gemm_start_ms",
                "gemm_end_ms",
                "sf",
                "n_queries",
            )
            if rec.get(k) is not None
        }
        if overwrite and tag in rounds:
            # same-round rerun: fold by MIN — this box's external CPU
            # steal swings identical code >1.2x between same-day
            # windows even when every endpoint stamp reads calm
            # (observed round 11: 56.2 s then 70.4 s, spreads ~1.1,
            # spin/mem/gemm all healthy on the slow run), so the
            # cross-round record keeps the least-contended window
            prev = rounds[tag]
            if prev.get("value_warm", 1e18) < meta.get("value_warm", 1e18):
                meta = prev
        if overwrite or tag not in rounds:
            rounds[tag] = meta
        # full shape keys, else the bounded summary-line keys
        warm = rec.get("queries") or rec.get("slowest_warm") or {}
        spread = rec.get("warm_spread") or rec.get("slowest_spread") or {}
        stamps = rec.get("warm_stamps") or {}
        for q, sec in warm.items():
            per_round = queries.setdefault(q, {})
            if tag in per_round:
                if not overwrite:
                    continue
                if per_round[tag].get("warm", 1e18) <= sec:
                    continue  # keep the less-contended window's row
            row: dict = {"warm": sec}
            if spread.get(q) is not None:
                row["spread"] = spread[q]
            if q in stamps:
                row.update(stamps[q])
            per_round[tag] = row

    hist_path = here / "BENCH_HISTORY.json"
    try:
        prev = json.loads(hist_path.read_text())
        rounds.update(prev.get("rounds") or {})
        for q, per_round in (prev.get("queries") or {}).items():
            queries.setdefault(q, {}).update(per_round)
    except (OSError, json.JSONDecodeError, AttributeError):
        pass
    last = 0
    for f in sorted(here.glob("BENCH_r*.json")):
        tag = f.stem.split("_", 1)[1]  # r01..rNN
        # `last` derives from the filename tag alone, so an
        # unreadable round still claims its number and the live run
        # can't min-fold into a round it didn't run in
        try:
            last = max(last, int(tag.lstrip("r")))
        except ValueError:
            continue
        try:
            rec = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        # driver capture shape: {"parsed": {...}} or the raw dict
        rec = rec.get("parsed", rec) if isinstance(rec, dict) else {}
        if isinstance(rec, dict) and (
            rec.get("queries") or rec.get("value_warm") or rec.get("value")
        ):
            add(tag, rec, overwrite=False)
    add(f"r{last + 1:02d}", result, overwrite=True)
    for q in queries:
        queries[q] = dict(sorted(queries[q].items()))
    hist_path.write_text(
        json.dumps(
            {"rounds": dict(sorted(rounds.items())), "queries": queries},
            indent=1,
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or sorted(all_queries())
    result = run(sf_dir, names)
    if not sys.argv[1:]:  # full roster only: subsets would pollute
        try:
            write_history(result, Path(__file__).resolve().parent)
        except OSError:
            pass  # history is best-effort; never break the stdout contract
    # Line order matters: the driver records a bounded TAIL of stdout
    # (measured from BENCH_r17's recorded capture: exactly 2000 bytes)
    # and parses the last line (BENCH_r02 and _r03 both came back
    # parsed:null because the ~2.6 KB full per-query line sat last and
    # lost its head to the cap). So: full detail line FIRST, then a
    # byte-budgeted summary line LAST that always parses.
    #
    # Round 18 (VERDICT r17 item 2): the summary line now carries the
    # FULL warm per-query dict under the contract key "queries"
    # (name -> min-of-3 seconds) so the driver's PERF comparison
    # (n_common / geomean / scaling.per_query) works again — PERF_r17
    # had per_query:{} because the per-query data only ever appeared
    # on the first (capped-away) line. To pay for it inside the 2000 B
    # cap, the redundant slowest_warm/slowest_spread blocks (derivable
    # from "queries" / the full first line) became two scalar spread
    # stats, and a trim loop drops the FASTEST queries if the line
    # ever exceeds the budget (50 queries ≈ 1.7 KB, so normally none).
    print(json.dumps(result))
    spreads = sorted(result["warm_spread"].values())
    summary = {
        "metric": result["metric"],
        "unit": result["unit"],
        "sf": result["sf"],
        "n_queries": result["n_queries"],
        "cpus": result["cpus"],
        "loadavg_1m": result["loadavg_1m"],
        "cpu_spin_start_ms": result["cpu_spin_start_ms"],
        "cpu_spin_end_ms": result["cpu_spin_end_ms"],
        "cpu_spin_mid_med_ms": result["cpu_spin_mid_med_ms"],
        "cpu_spin_mid_max_ms": result["cpu_spin_mid_max_ms"],
        "mem_copy_mid_med_ms": result["mem_copy_mid_med_ms"],
        "mem_copy_mid_max_ms": result["mem_copy_mid_max_ms"],
        "gemm_start_ms": result["gemm_start_ms"],
        "gemm_end_ms": result["gemm_end_ms"],
        "headline_protocol": "warm_min_of_3",
        # rep-spread adjudication, compact: median + worst (per-query
        # spreads/stamps stay on the full first line + BENCH_HISTORY)
        "spread_med": spreads[len(spreads) // 2] if spreads else None,
        "spread_max": spreads[-1] if spreads else None,
        "queries": dict(result["queries"]),
        "value_cold": result["value_cold"],
        "value_warm": result["value_warm"],
        "value": result["value"],
    }
    # keep the line safely under the driver's 2000 B tail cap: drop
    # the fastest queries first (the slow ones carry the signal) and
    # record how many were dropped so a trimmed dict is self-evident
    budget = 1900
    while len(json.dumps(summary)) > budget and summary["queries"]:
        fastest = min(summary["queries"], key=summary["queries"].get)
        del summary["queries"][fastest]
        summary["queries_trimmed"] = (
            summary.get("queries_trimmed", 0) + 1
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
