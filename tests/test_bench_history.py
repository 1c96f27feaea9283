"""BENCH_HISTORY.json emission (bench.py write_history): mechanical
cross-round per-query records — merged from driver-recorded summary
files, self-accumulating through the previous history, live run
tagged with the inferred next round."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import write_history  # noqa: E402


def _capture(parsed: dict) -> str:
    return json.dumps({"n": 1, "rc": 0, "parsed": parsed})


def test_history_merges_rounds_and_tags_live(tmp_path):
    # r01-style: full per-query dict, no spreads
    (tmp_path / "BENCH_r01.json").write_text(
        _capture({"queries": {"q_a": 1.0, "q_b": 2.0}, "value_warm": 3.0})
    )
    # r07-style: bounded summary line — slowest only, totals last
    (tmp_path / "BENCH_r07.json").write_text(
        _capture(
            {
                "slowest_warm": {"q_b": 1.5},
                "slowest_spread": {"q_b": 1.2},
                "value_warm": 2.5,
                "cpu_spin_start_ms": 70.0,
            }
        )
    )
    # unparseable round must be skipped, not crash
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({"parsed": None}))
    live = {
        "queries": {"q_a": 0.9, "q_b": 1.4, "q_new": 0.2},
        "warm_spread": {"q_a": 1.1},
        "warm_stamps": {"q_a": {"spin_ms": 65.0, "mem_ms": 12.0}},
        "value_warm": 2.5,
        "sf": 0.1,
    }
    write_history(live, tmp_path)
    h = json.loads((tmp_path / "BENCH_HISTORY.json").read_text())
    # live run tagged max recorded (r07) + 1
    assert "r08" in h["rounds"] and h["rounds"]["r08"]["value_warm"] == 2.5
    assert h["queries"]["q_b"]["r01"] == {"warm": 2.0}
    assert h["queries"]["q_b"]["r07"] == {"warm": 1.5, "spread": 1.2}
    assert h["queries"]["q_a"]["r08"] == {
        "warm": 0.9,
        "spread": 1.1,
        "spin_ms": 65.0,
        "mem_ms": 12.0,
    }
    assert h["queries"]["q_new"] == {"r08": {"warm": 0.2}}


def test_history_self_accumulates_full_rows_over_summaries(tmp_path):
    """A later regeneration must keep the FULL per-query rows a past
    live run wrote, even though that round's driver capture retains
    only the 8-slowest summary."""
    (tmp_path / "BENCH_r09.json").write_text(
        _capture({"slowest_warm": {"q_b": 9.9}, "value_warm": 9.9})
    )
    # previous history: r09 had full data from its own live run
    (tmp_path / "BENCH_HISTORY.json").write_text(
        json.dumps(
            {
                "rounds": {"r09": {"value_warm": 5.0}},
                "queries": {
                    "q_a": {"r09": {"warm": 0.5}},
                    "q_b": {"r09": {"warm": 4.5, "spread": 1.0}},
                },
            }
        )
    )
    write_history({"queries": {"q_a": 0.4}, "value_warm": 0.4}, tmp_path)
    h = json.loads((tmp_path / "BENCH_HISTORY.json").read_text())
    # the summary's 9.9 did NOT clobber the full live row
    assert h["queries"]["q_b"]["r09"] == {"warm": 4.5, "spread": 1.0}
    assert h["rounds"]["r09"] == {"value_warm": 5.0}
    assert h["queries"]["q_a"]["r10"] == {"warm": 0.4}


def test_same_round_reruns_fold_by_min(tmp_path):
    """This box's external steal swings identical code between
    same-day windows even with calm stamps, so a same-round rerun
    keeps the least-contended window: per query AND for the run
    totals, the lower warm wins (with its spread/stamps)."""
    fast = {
        "queries": {"q_a": 1.0, "q_b": 5.0},
        "warm_spread": {"q_a": 1.1, "q_b": 1.2},
        "value_warm": 6.0,
        "cpu_spin_start_ms": 90.0,
    }
    write_history(fast, tmp_path)
    slow = {
        "queries": {"q_a": 1.4, "q_b": 4.0},  # q_b got a better window
        "warm_spread": {"q_a": 1.0, "q_b": 1.0},
        "value_warm": 5.4,
        "cpu_spin_start_ms": 60.0,
    }
    write_history(slow, tmp_path)
    h = json.loads((tmp_path / "BENCH_HISTORY.json").read_text())
    tag = next(iter(h["rounds"]))
    assert h["rounds"][tag]["value_warm"] == 5.4  # lower total wins
    assert h["queries"]["q_a"][tag] == {"warm": 1.0, "spread": 1.1}
    assert h["queries"]["q_b"][tag] == {"warm": 4.0, "spread": 1.0}
