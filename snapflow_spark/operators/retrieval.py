"""Lexical retrieval over a document corpus (SURVEY.md §2.B.11):
inverted-index BM25 scoring and tokenizer-vocabulary building — the
search/inspection ops a training-data pipeline runs to audit what a
corpus contains (benchmark leakage probes, topical composition, vocab
coverage for tokenizer training).

Design for 100 TB:

- The inverted index is plain DataFrame algebra: ``explode`` tokens →
  ``groupBy(doc, term)`` for term frequencies (ONE shuffle, map-side
  combined). Document/term statistics are aggregates over it.
- Query sets are small by nature (a probe list, a benchmark suite), so
  the query terms BROADCAST and the postings join is a broadcast-hash
  join: the corpus-sized posting list never shuffles for a search.
- Scoring is exact integer/`ln` arithmetic over (tf, df, dl, N) —
  deterministic and replayable in any SQL engine, which is what makes
  BM25 a hash-matchable driver query while embedding ANN is not.
- Everything is whole-stage codegen: no UDF anywhere in the path.

Determinism contract (the cross-engine hash depends on it): ranking
orders by the score ROUNDED to 6 decimals with ``doc_id`` as the full
tie-break, so a last-ulp FP difference between engines can only
reorder docs whose rounded scores tie — and those tie-break on id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from snapflow_spark.operators.topk import grouped_topk

# Word tokens = maximal letter runs of the lowercased text. The same
# `[\p{L}]+` class is RE2/Java-identical and already cross-engine
# proven by q_text_quality's oracle.
WORD_RE = r"[\p{L}]+"


def word_tokens_expr(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(WORD_RE), 0)


def doc_terms(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, dl, term, tf) — inverted-index rows with the document
    length DENORMALIZED in: tokenize once, explode, group. ``dl`` is
    constant per doc so it rides through the groupBy as a key; the
    whole index is one explode + one shuffle (map-side combined), and
    scoring later needs no corpus-side join to fetch lengths."""
    toks = docs.select(
        F.col(id_col), word_tokens_expr(text_col).alias("__toks")
    ).withColumn("dl", F.size("__toks").cast("bigint"))
    return (
        toks.select(id_col, "dl", F.explode("__toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Okapi BM25 top-k documents per query.

    ``score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    over the DISTINCT terms of the query, with the standard
    ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`` (always positive).

    Exactness: tf/df/dl/N are integers, ``avgdl = Σdl / N`` is one
    exact int64 sum divided once, and the final score is rounded to 6
    decimals BEFORE ranking — the determinism contract above.

    Scale shape: postings (corpus-sized) are built with one shuffle
    and then joined to the BROADCAST query-term list, so the search
    itself never shuffles the corpus; the per-(query, doc) sum and the
    top-k window run on the candidate set only (docs containing at
    least one query term). For a standing index, persist ``doc_terms``
    bucketed by term and this plan reads only matching buckets.
    """
    terms = doc_terms(docs, text_col, id_col)
    # N and avgdl from the docs scan itself (zero-token docs count
    # toward N but never appear in postings), folded in as a BROADCAST
    # one-row join so the whole query stays one lazy plan — an eager
    # .first() here would cost a separate job per invocation.
    # avgdl = exact int64 sum / exact count — deterministic.
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(F.size(word_tokens_expr(text_col)).cast("bigint")).alias("__sum_dl"),
    )

    q_terms = queries.select(
        F.col(query_id_col), F.explode(word_tokens_expr(query_text_col)).alias("term")
    ).distinct()
    # document frequencies only for the (broadcast) query terms — the
    # full corpus vocabulary is never broadcast
    df_q = (
        terms.join(F.broadcast(q_terms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    avgdl = F.col("__sum_dl").cast("double") / F.col("__n")
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (1.0 + k1)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)
    )
    # ONE broadcast side: per-term df × the one-row corpus stats —
    # broadcasting them separately costs an extra broadcast-exchange
    # job per query run for no benefit (both are tiny)
    df_q_stats = df_q.crossJoin(stats)
    scored = (
        terms.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(df_q_stats), "term")
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
    )
    return grouped_topk(
        scored, [query_id_col], [F.col("score").desc(), F.col(id_col).asc()], k
    ).select(query_id_col, id_col, "score")


def bm25_oracle_sql(
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay of ``bm25_topk`` for a literal query list — the
    oracle twin (same tokenization, same idf/tf arithmetic, same
    round-then-rank determinism contract)."""
    # SQL string literals: double any quote so a probe query like
    # "what's a join" stays one literal instead of malformed SQL
    qvals = ", ".join(
        f"({int(qid)}, '{str(qtext).replace(chr(39), chr(39) * 2)}')"
        for qid, qtext in queries
    )
    return rf"""
    WITH q(query_id, query_text) AS (VALUES {qvals}),
    qt AS (
      SELECT DISTINCT query_id, unnest(regexp_extract_all(lower(query_text), '[\p{{L}}]+')) AS term
      FROM q
    ), toks AS (
      SELECT {id_col}, unnest(regexp_extract_all(lower({text_col}), '[\p{{L}}]+')) AS term
      FROM {table}
    ), terms AS (
      SELECT {id_col}, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
      SELECT {id_col}, len(regexp_extract_all(lower({text_col}), '[\p{{L}}]+')) AS dl
      FROM {table}
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM terms GROUP BY 1
    ), scored AS (
      SELECT qt.query_id, t.{id_col},
             round(SUM(
               ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
               * (t.tf * (1 + {k1})) / (t.tf + {k1} * (1 - {b} + {b} * d.dl / s.avgdl))
             ), 6) AS score
      FROM terms t
      JOIN qt ON t.term = qt.term
      JOIN dfreq f ON t.term = f.term
      JOIN dl d ON t.{id_col} = d.{id_col}
      CROSS JOIN stats s
      GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, {id_col}) AS rn
      FROM scored
    )
    SELECT query_id, {id_col}, score FROM ranked WHERE rn <= {k}
    """


def build_vocab(
    docs: DataFrame,
    top_k: int,
    text_col: str = "text",
    by: str | None = None,
) -> DataFrame:
    """Tokenizer-vocabulary building: the ``top_k`` most frequent word
    tokens (optionally per ``by`` group, e.g. per language — how
    multilingual tokenizer budgets are allocated). Deterministic
    ranking: count desc, then term asc.

    Scale shape: explode + groupBy(term) with map-side combine is the
    whole job — the aggregated vocab is tiny (≤ distinct-token count),
    so the ranking window runs over a small intermediate, not the
    corpus. Returns (``by``?, term, term_count, term_rank)."""
    keys = [by] if by else []
    counts = (
        docs.select(*keys, F.explode(word_tokens_expr(text_col)).alias("term"))
        .groupBy(*keys, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("term_count"))
    )
    ranked = grouped_topk(
        counts, keys, [F.col("term_count").desc(), F.col("term").asc()], top_k
    )
    # re-derive the rank column for consumers (grouped_topk drops it)
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col("term_count").desc(), F.col("term").asc()
    )
    return ranked.withColumn("term_rank", F.row_number().over(w).cast("bigint"))
