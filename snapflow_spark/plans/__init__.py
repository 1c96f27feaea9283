"""Plan layer: declarative graph building + physical-plan introspection.

- ``graph()`` is the snapflow-shaped declarative API
  [P snapflow/core/graph.py: graph(), g.create_node(function=...,
  upstream=...)] compiled onto the incremental Pipeline/Node layer;
  Spark's Catalyst plan is the real dataflow IR underneath (SURVEY §3.2).
- ``plan_facts`` extracts the scale-relevant physical-plan facts
  (pushdown, pruning, join strategies, shuffles, codegen) so tests and
  tools can assert plan QUALITY, not just result correctness.
"""

from snapflow_spark.plans.graph import GraphBuilder, graph
from snapflow_spark.plans.introspect import plan_facts, plan_text
from snapflow_spark.plans.yaml_config import load_graph, produce_file

__all__ = [
    "GraphBuilder",
    "graph",
    "load_graph",
    "plan_facts",
    "plan_text",
    "produce_file",
]
