"""Plan-layer tests: the declarative graph API (snapflow graph()
parity) and plan-quality assertions via plans.introspect —
SURVEY §3.2/§4.
"""

import pyspark.sql.functions as F

from snapflow_spark.incremental.pipeline import REFERENCE
from snapflow_spark.plans import graph, plan_facts


def test_graph_builder_reactive_fixed_point(spark, tmp_path):
    g = graph(str(tmp_path / "wh"))
    src = g.source("events_in")

    def enrich(spark, input):  # noqa: A002 — snapflow input-name shape
        return input.withColumn("double_v", F.col("v") * 2)

    def total(spark, input):
        return input.groupBy().agg(F.sum("double_v").alias("total"))

    g.create_node("enriched", enrich, upstream="events_in")
    g.create_node("latest_total", total, upstream="enriched", overwrite=True)

    src.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"))
    assert g.produce(spark) == 2
    assert g.read(spark, "latest_total").first()["total"] == 60.0

    # no new input -> fixed point immediately, zero node runs
    assert g.produce(spark) == 0

    # incremental: only the delta is consumed, state accumulates
    src.append(spark.createDataFrame([(3, 5.0)], "id long, v double"))
    assert g.produce(spark) == 2
    assert g.read(spark, "enriched").count() == 3
    assert g.read(spark, "latest_total").first()["total"] == 10.0  # delta-only agg


def test_graph_reference_input_sees_full_state(spark, tmp_path):
    g = graph(str(tmp_path / "wh2"))
    src = g.source("facts")

    def count_all(spark, full):
        return full.groupBy().agg(F.count(F.lit(1)).alias("n"))

    g.create_node("n_rows", count_all, upstream={"full": ("facts", REFERENCE)}, overwrite=True)

    src.append(spark.createDataFrame([(1,), (2,)], "id long"))
    g.produce(spark)
    assert g.read(spark, "n_rows").first()["n"] == 2
    src.append(spark.createDataFrame([(3,)], "id long"))
    g.produce(spark)
    # reference input re-fires on upstream change and sees ALL rows
    assert g.read(spark, "n_rows").first()["n"] == 3


def test_plan_facts_broadcast_and_pushdown(spark):
    from snapflow_spark.registry import all_queries

    queries = all_queries()
    facts = plan_facts(queries["q_join_broadcast"](spark, "/root/testdata/sf0.001"))
    assert facts.broadcast_joins >= 1  # dim joins must broadcast
    assert not facts.has_cartesian

    facts = plan_facts(queries["q_agg_basic"](spark, "/root/testdata/sf0.001"))
    # the shipdate filter must reach the parquet scan...
    assert any("l_shipdate" in p for p in facts.pushed_filters)
    # ...and the scan must prune to the 7 needed columns
    assert all("l_orderkey" not in s for s in facts.read_schemas)
