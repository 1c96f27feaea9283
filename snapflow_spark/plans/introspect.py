"""Physical-plan introspection — assertable plan facts (SURVEY §4).

The engine's optimizer story is "declare the plan, let Catalyst pick
the physical strategy" — so plan QUALITY (pushdown reached the scan,
the dim join broadcast, no accidental cartesian) is a first-class,
testable property. tools/explain_audit.py renders these facts for
every declared query into PLANS.md.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanFacts:
    n_scans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    joins: list[str] = field(default_factory=list)
    exchanges: int = 0
    codegen_stages: int = 0
    cached_scans: int = 0
    nodes: int = 0
    text: str = ""

    @property
    def broadcast_joins(self) -> int:
        return sum(1 for j in self.joins if j.startswith("Broadcast"))

    @property
    def has_cartesian(self) -> bool:
        return "CartesianProduct" in self.joins


def _distinct_exchanges(text: str) -> int:
    """Count DISTINCT shuffle exchanges. The formatted explain
    re-renders a cached (InMemoryRelation) subtree once per reference,
    so a raw occurrence count triple-counts the upstream of a
    persisted DataFrame referenced three times — node ids are stable
    across those renders, so unique ids = exchanges that actually
    execute. (BroadcastExchange is excluded: it is a broadcast, not a
    shuffle.)"""
    ids = set(re.findall(r"(?<![A-Za-z])Exchange \((\d+)\)", text))
    if ids:
        return len(ids)
    return len(re.findall(r"\bExchange\b", text))


def plan_facts(df: DataFrame) -> PlanFacts:
    text = plan_text(df)
    return PlanFacts(
        n_scans=len(re.findall(r"Scan parquet[^\n]*", text)),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: ([^\n]*)", text),
        joins=re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
            r"|BroadcastNestedLoopJoin|CartesianProduct)",
            text,
        ),
        exchanges=_distinct_exchanges(text),
        # formatted mode labels codegen membership as "[codegen id : N]"
        codegen_stages=len(set(re.findall(r"\[codegen id : (\d+)\]", text))),
        cached_scans=len(re.findall(r"InMemoryTableScan", text)),
        nodes=len(re.findall(r"^\s*\(\d+\)", text, re.M)),
        text=text,
    )
