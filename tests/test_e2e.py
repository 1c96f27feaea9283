"""End-to-end engine composition (SURVEY §3 lifecycle): a paged API
feeds a snapshot store; an incremental pipeline dedups, quality-gates
and aggregates it across ticks; the final state equals the one-shot
batch computation — the full connector -> store -> reactive loop ->
north-star-operator story in one test.
"""

import pyspark.sql.functions as F

from snapflow_spark.functions.text import token_count_expr
from snapflow_spark.incremental.pipeline import REFERENCE
from snapflow_spark.operators import exact_dedup
from snapflow_spark.plans import graph
from snapflow_spark.sources import import_api_pages

DOCS = [
    # (doc_id, text, lang) — doc 3 duplicates doc 0's text, doc 7
    # duplicates doc 4's; the quality gate drops the one-word doc 5
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "der schnelle braune fuchs springt", "de"),
    (2, "one two three four five six seven", "en"),
    (3, "the quick brown fox jumps over the lazy dog", "en"),
    (4, "pack my box with five dozen liquor jugs", "en"),
    (5, "tiny", "en"),
    (6, "sphinx of black quartz judge my vow", "en"),
    (7, "pack my box with five dozen liquor jugs", "en"),
]
SCHEMA = "doc_id bigint, text string, lang string"
MIN_TOKENS = 3


def _expected(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    keep = exact_dedup(df, "text", "doc_id").select("doc_id")
    kept = df.join(keep, "doc_id", "left_semi").where(
        token_count_expr("text") >= MIN_TOKENS
    )
    return {
        r.lang: (r.n_docs, r.total_tokens)
        for r in kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_expr("text").cast("bigint")).alias("total_tokens"),
        )
        .collect()
    }


def test_api_to_curated_stats_incremental_equals_batch(spark, tmp_path):
    g = graph(str(tmp_path / "wh"))
    src = g.source("api_docs")

    def curate(spark, history):
        keep = exact_dedup(history, "text", "doc_id").select("doc_id")
        return history.join(keep, "doc_id", "left_semi").where(
            token_count_expr("text") >= MIN_TOKENS
        )

    def stats(spark, curated):
        return curated.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_expr("text").cast("bigint")).alias("total_tokens"),
        )

    g.create_node(
        "curated", curate, upstream={"history": ("api_docs", REFERENCE)},
        overwrite=True,
    )
    g.create_node(
        "corpus_stats", stats, upstream={"curated": ("curated", REFERENCE)},
        overwrite=True,
    )

    def pager(cursor, page_size=3):
        start = int(cursor or 0)
        page = DOCS[start : start + page_size]
        return (
            [{"doc_id": i, "text": t, "lang": lg} for i, t, lg in page],
            start + len(page),
        )

    # tick 1: first two pages arrive; pipeline reaches a fixed point
    import_api_pages(spark, pager, SCHEMA, src, max_pages=2)
    assert g.produce(spark) == 2

    # tick 2: the rest arrives (including the duplicates); only the
    # delta is imported, the reference nodes re-fire
    import_api_pages(spark, pager, SCHEMA, src)
    assert g.produce(spark) == 2

    got = {
        r.lang: (r.n_docs, r.total_tokens)
        for r in g.read(spark, "corpus_stats").collect()
    }
    assert got == _expected(spark)
    # dedup really dropped the two copies and the gate dropped 'tiny'
    assert got["en"] == (4, 31)  # docs 0,2,4,6 = 9+7+8+7 tokens
    # nothing new -> fixed point, no node runs
    assert g.produce(spark) == 0
