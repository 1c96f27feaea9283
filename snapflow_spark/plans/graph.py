"""Declarative graph API — snapflow's ``graph()`` / ``create_node``
surface [P snapflow/core/graph.py, node.py] on the Spark engine.

Sugar over incremental.Pipeline: upstream declarations accept

    upstream="orders"                       # single consumable input
    upstream={"left": "orders",             # named consumable inputs
              "dims": ("nation", REFERENCE)}  # explicit mode

and node functions are ``fn(spark, **inputs) -> DataFrame | None``,
the python-snap shape (SURVEY §2.A A1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snapflow_spark.incremental.pipeline import CONSUMABLE, Node, Pipeline
from snapflow_spark.incremental.store import SnapshotStore


def _normalize_upstream(
    upstream: str | dict | None,
) -> dict[str, tuple[str, str]]:
    if upstream is None:
        return {}
    if isinstance(upstream, str):
        return {"input": (upstream, CONSUMABLE)}
    out: dict[str, tuple[str, str]] = {}
    for input_name, spec in upstream.items():
        if isinstance(spec, str):
            out[input_name] = (spec, CONSUMABLE)
        else:
            src, mode = spec
            out[input_name] = (src, mode)
    return out


class GraphBuilder:
    """Fluent wrapper over a Pipeline; ``produce`` runs importers (if
    any), then the reactive fixed point (only unconsumed upstream
    snapshots are processed)."""

    def __init__(self, pipeline: Pipeline):
        self.pipeline = pipeline
        # importers run at the START of each produce() — the EP3 form
        # of snapflow's importer nodes: pull new external data into a
        # source store, then let the reactive loop consume it
        self.importers: list[Callable[[SparkSession], None]] = []

    def source(self, name: str) -> SnapshotStore:
        return self.pipeline.add_source(name)

    def add_importer(self, fn: Callable[[SparkSession], None]) -> None:
        self.importers.append(fn)

    def create_node(
        self,
        name: str,
        function: Callable[..., DataFrame | None],
        upstream: str | dict | None = None,
        overwrite: bool = False,
    ) -> Node:
        node = Node(
            name=name,
            fn=function,
            upstream=_normalize_upstream(upstream),
            overwrite=overwrite,
        )
        return self.pipeline.add_node(node)

    def produce(
        self, spark: SparkSession, auto_compact_after: int | None = None
    ) -> int:
        for imp in self.importers:
            imp(spark)
        return self.pipeline.produce(spark, auto_compact_after=auto_compact_after)

    def read(self, spark: SparkSession, name: str) -> DataFrame | None:
        return self.pipeline.store(name).read(spark)


def graph(warehouse: str) -> GraphBuilder:
    """Create a graph over a warehouse directory (state + run-ledger
    live under it, so repeated ``produce`` calls are incremental)."""
    return GraphBuilder(Pipeline(warehouse))
