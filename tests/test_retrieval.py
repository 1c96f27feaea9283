"""Lexical retrieval + round-4 curation operators: BM25 scoring
(pinned to a from-scratch python reference AND a DuckDB replay),
vocabulary building, cross-document line dedup, per-domain caps.
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from snapflow_spark.operators import (
    bm25_topk,
    build_vocab,
    cap_per_domain,
    dedup_lines_global,
    doc_terms,
)
from snapflow_spark.operators.retrieval import bm25_oracle_sql

DOCS = [
    (0, "spark shuffle join join hash", "src0"),
    (1, "broadcast join for small tables", "src0"),
    (2, "hash aggregation with partial combine", "src1"),
    (3, "spark spark spark tuning guide", "src1"),
    (4, "the empty doc problem", "src2"),
    (5, "...", "src2"),  # zero letter tokens — counts toward N only
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, s) for i, t, s in DOCS], "doc_id bigint, text string, source string"
    )


def _py_bm25(query: str, k1=1.2, b=0.75):
    """From-scratch reference implementation over DOCS."""
    tok = lambda t: re.findall(r"[^\W\d_]+", t.lower())
    corpus = {i: tok(t) for i, t, _ in DOCS}
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    df = {}
    for toks in corpus.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for i, toks in corpus.items():
        s = 0.0
        for t in set(tok(query)):
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            scores[i] = round(s, 6)
    return scores


def test_doc_terms_shape(docs):
    rows = doc_terms(docs).collect()
    got = {(r.doc_id, r.term): (r.tf, r.dl) for r in rows}
    assert got[(0, "join")] == (2, 5)
    assert got[(3, "spark")] == (3, 5)
    assert not any(d == 5 for d, _ in got)  # zero-token doc absent


def test_bm25_matches_python_reference(spark, docs):
    queries = spark.createDataFrame(
        [(1, "spark join"), (2, "hash")], "query_id bigint, query_text string"
    )
    out = bm25_topk(docs, queries, k=10).collect()
    got = {(r.query_id, r.doc_id): r.score for r in out}
    for qid, qtext in [(1, "spark join"), (2, "hash")]:
        expect = _py_bm25(qtext)
        mine = {d: s for (q, d), s in got.items() if q == qid}
        assert mine == expect, (qid, mine, expect)


def test_bm25_topk_rank_and_duckdb_replay(spark, docs, tmp_path):
    import duckdb

    queries = [(1, "spark join"), (2, "hash aggregation")]
    qdf = spark.createDataFrame(queries, "query_id bigint, query_text string")
    out = bm25_topk(docs, qdf, k=2)
    got = {(r.query_id, r.doc_id): r.score for r in out.collect()}
    assert len(got) == 4  # k=2 per query

    pq = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    duck = {
        (q, d): s
        for q, d, s in con.execute(bm25_oracle_sql(queries, k=2)).fetchall()
    }
    assert got == duck


def test_build_vocab_global_and_grouped(spark, docs):
    got = build_vocab(docs, top_k=2).collect()
    assert [(r.term, r.term_count, r.term_rank) for r in got] == [
        ("spark", 4, 1),
        ("join", 3, 2),
    ]
    by_src = {
        (r.source, r.term_rank): (r.term, r.term_count)
        for r in build_vocab(docs, top_k=1, by="source").collect()
    }
    assert by_src[("src0", 1)] == ("join", 3)
    assert by_src[("src1", 1)] == ("spark", 3)
    # count ties break on term asc: src2 has all-distinct tokens
    assert by_src[("src2", 1)] == ("doc", 1)


def test_dedup_lines_global(spark):
    docs = spark.createDataFrame(
        [
            (1, "cookie banner\nreal content one\nfooter"),
            (2, "cookie banner\nreal content two\nfooter"),
            (3, "cookie banner\nfooter"),
            (4, "   \n\t"),  # whitespace-only lines -> empty doc
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in dedup_lines_global(docs).collect()}
    # first occurrence of each boilerplate line lives in doc 1
    assert got[1].text == "cookie banner\nreal content one\nfooter"
    assert got[2].text == "real content two"
    assert got[3].text == ""
    assert got[4].text == ""
    assert (got[2].n_lines, got[2].n_kept) == (3, 1)
    assert (got[3].n_lines, got[3].n_kept) == (2, 0)
    assert (got[4].n_lines, got[4].n_kept) == (0, 0)
    assert len(got) == 4  # every input doc comes back


def test_dedup_lines_keeper_is_partial_agg_not_window(spark):
    """Round 8 (same fix as the excise keeper): the first-occurrence
    choice must come from a partial-aggregable groupBy + join, not a
    window over raw line occurrences — a nav-bar line held by every
    doc must not land its whole bucket on one task. Plan is
    Window-free; semantics identical on a planted hot line."""
    hot = "home | about | contact"
    docs = spark.createDataFrame(
        [(i, f"{hot}\nbody line {i}") for i in range(1, 40)],
        "doc_id bigint, text string",
    )
    out = dedup_lines_global(docs)
    assert "Window" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].text == f"{hot}\nbody line 1"  # first occurrence keeps
    for i in range(2, 40):
        assert got[i].text == f"body line {i}", i
        assert (got[i].n_lines, got[i].n_kept) == (2, 1)


def test_cap_per_domain(spark, docs):
    capped = cap_per_domain(docs, cap=1, domain_col="source")
    rows = capped.collect()
    assert len(rows) == 3  # one per domain
    assert {r.source for r in rows} == {"src0", "src1", "src2"}
    # deterministic: same survivors on a reshuffled input
    again = {
        r.doc_id for r in cap_per_domain(docs.repartition(5), cap=1).collect()
    }
    assert {r.doc_id for r in rows} == again
    # cap >= domain size keeps everything
    assert cap_per_domain(docs, cap=10).count() == len(DOCS)


def test_bm25_oracle_sql_escapes_quotes():
    import duckdb

    from snapflow_spark.operators.retrieval import bm25_oracle_sql

    sql = bm25_oracle_sql([(1, "what's a join")], k=3)
    assert "what''s" in sql
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, 'a join is a join'), (2, 'nothing here')")
    got = con.execute(sql).fetchall()
    assert [r[1] for r in got] == [1]  # only the matching doc scores


def test_bm25_standing_index_parity_and_plan(spark, docs):
    """build_postings_index + bm25_topk_indexed: identical results to
    the ad-hoc bm25_topk, and the search plan runs ZERO exchanges over
    the postings — the bucketed-by-term scan directly satisfies the
    document-frequency aggregate's distribution (the standing-index
    promise: searches never shuffle or re-tokenize the corpus)."""
    from snapflow_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
        build_postings_index,
    )

    qdf = spark.createDataFrame(
        [(1, "spark join"), (2, "hash aggregation")],
        "query_id bigint, query_text string",
    )
    adhoc = {
        (r.query_id, r.doc_id, r.score)
        for r in bm25_topk(docs, qdf, k=3).collect()
    }
    build_postings_index(docs, "bm25_postings_t", n_buckets=4)
    indexed_df = bm25_topk_indexed(spark, "bm25_postings_t", qdf, k=3)
    indexed = {(r.query_id, r.doc_id, r.score) for r in indexed_df.collect()}
    assert indexed == adhoc and indexed

    # plan hygiene: the candidate+df window over the bucketed postings
    # needs no shuffle (scan output partitioning satisfies the window's
    # partitionBy(term) demand)
    from snapflow_spark.operators.retrieval import (
        _candidates_with_df,
        _query_terms,
    )

    terms = spark.table("bm25_postings_t")
    q_terms = _query_terms(qdf, "query_id", "query_text")
    cand = _candidates_with_df(terms, q_terms)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    # the tiny query-term list may shuffle/broadcast (it is rows, not
    # the corpus); what must NOT appear is any shuffle on the POSTINGS
    # side — everything printed before the BroadcastExchange branch is
    # the streamed postings subtree
    postings_side = plan.split("BroadcastExchange")[0]
    assert "FileScan" in postings_side and "Bucketed: true" in postings_side, plan
    assert "Window" in postings_side, plan
    assert "Exchange hashpartitioning" not in postings_side, plan
    assert "Exchange rangepartitioning" not in postings_side, plan
    # and no tokenization anywhere in the full indexed search plan
    full = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "regexp_extract_all(lower(text" not in full


def test_word_tokens_py_matches_spark_expr(spark):
    """word_tokens_py (driver-side query tokenizer) must agree with
    word_tokens_expr (the corpus-side Java regex [\\p{L}]+) on
    multilingual, mark-bearing, digit-mixed and empty input — the
    BM25 oracle contract depends on both sides tokenizing alike."""
    from snapflow_spark.operators.retrieval import (
        word_tokens_expr,
        word_tokens_py,
    )

    samples = [
        "Hash JOIN scan",
        "наïve café построение план",   # latin+cyrillic+diacritics
        "日本語のトークン化 テスト",        # CJK + katakana, no spaces
        "mixed42numbers and_under_scores",
        "étude",                  # combining acute: mark splits the run
        "ΐ ϊ Ϊ",                        # greek with diacritics
        "½ ² ℓ №",                      # number-letters & symbols
        "",
        "...!!!",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i bigint, t string")
    got = {
        r.i: list(r.toks)
        for r in df.select("i", word_tokens_expr("t").alias("toks")).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == word_tokens_py(s), (s, got[i], word_tokens_py(s))


def test_cap_per_domain_observability(spark, docs):
    """cap_per_domain drops rows by design; with an Observation the
    drop is measured during the caller's own action: rows in/kept/
    dropped plus the number of domains that actually hit the cap."""
    from pyspark.sql import Observation

    obs = Observation("cap")
    capped = cap_per_domain(docs, cap=1, domain_col="source", observation=obs)
    assert capped.count() == 3
    m = obs.get
    assert m["rows_in"] == len(DOCS)
    assert m["rows_kept"] == 3
    assert m["rows_dropped"] == len(DOCS) - 3
    assert m["capped_domains"] == 3  # every source has 2 docs, cap=1

    obs2 = Observation("cap2")
    cap_per_domain(docs, cap=10, domain_col="source", observation=obs2).count()
    m2 = obs2.get
    assert m2["rows_dropped"] == 0 and m2["capped_domains"] == 0
