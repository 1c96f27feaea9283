"""DSIR importance resampling (operators/selection.py): log-weights
pinned to a from-scratch python reference AND a DuckDB replay of the
oracle spec; planted topic signal recovered; deterministic Gumbel
selection stable under repartition."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from snapflow_spark.operators.retrieval import word_tokens_py
from snapflow_spark.operators.selection import (
    dsir_log_weights,
    dsir_select,
)

# topic A = spark/data words, topic B = cooking words; target = A-ish
RAW = [
    (0, "spark shuffle partitions and broadcast joins", "en"),
    (1, "catalyst optimizer rewrites the logical plan", "en"),
    (2, "simmer the garlic butter sauce slowly", "en"),
    (3, "whisk eggs and fold in the flour", "en"),
    (4, "spark broadcast joins avoid the shuffle", "en"),
    (5, "the optimizer prunes partitions for the scan", "en"),
    (6, "roast the vegetables with olive oil", "en"),
    (7, "...", "en"),  # zero letter tokens — no features, never selected
    (8, "shuffle partitions tune the spark plan", "de"),
]
TARGET = [
    (100, "spark partitions shuffle broadcast plan optimizer"),
    (101, "scan pruning and shuffle partitions in spark"),
]


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(RAW, "doc_id bigint, text string, lang string")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(TARGET, "doc_id bigint, text string")


def _grams(text):
    t = word_tokens_py(text)  # lowercases internally
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(s, salt, B=10_000):
    return int(hashlib.sha256((salt + s).encode()).hexdigest()[:8], 16) % B


def _py_log_weights(raw_rows, target_rows, B=10_000, alpha=1.0, salt="dsir-v1"):
    rc, tc = {}, {}
    R = T = 0
    doc_buckets = {}
    for i, text, *_ in raw_rows:
        bs = [_bucket(g, salt, B) for g in _grams(text)]
        doc_buckets[i] = bs
        for b in bs:
            rc[b] = rc.get(b, 0) + 1
        R += len(bs)
    for i, text in target_rows:
        for b in (_bucket(g, salt, B) for g in _grams(text)):
            tc[b] = tc.get(b, 0) + 1
            T += 1
    out = {}
    for i, bs in doc_buckets.items():
        if not bs:
            continue
        s = sum(
            math.log((tc.get(b, 0) + alpha) / (T + alpha * B))
            - math.log((rc[b] + alpha) / (R + alpha * B))
            for b in bs
        )
        out[i] = round(s, 6)
    return out


def test_log_weights_match_python_reference(raw, target):
    got = {r["doc_id"]: r["log_w"] for r in dsir_log_weights(raw, target).collect()}
    exp = _py_log_weights(RAW, TARGET)
    assert set(got) == set(exp)
    for i in exp:
        assert abs(got[i] - exp[i]) <= 2e-6, (i, got[i], exp[i])


def test_zero_token_doc_has_no_row(raw, target):
    ids = {r["doc_id"] for r in dsir_log_weights(raw, target).collect()}
    assert 7 not in ids


def test_planted_topic_signal(raw, target):
    w = {r["doc_id"]: r["log_w"] for r in dsir_log_weights(raw, target).collect()}
    topic_a = [0, 1, 4, 5, 8]
    topic_b = [2, 3, 6]
    # importance weights are per-document sums (unnormalized, as in
    # the paper) so length skews individual docs; the topic-level
    # signal and the top ranks are what selection consumes
    avg = lambda ids: sum(w[i] for i in ids) / len(ids)
    assert avg(topic_a) > avg(topic_b)
    best2 = sorted(w, key=lambda i: -w[i])[:2]
    assert set(best2) <= set(topic_a)


def test_topk_selection_and_rank(raw, target):
    sel = dsir_select(raw, target, 3, gumbel=False).collect()
    assert [r["rank"] for r in sel] == [1, 2, 3]
    w = _py_log_weights(RAW, TARGET)
    exp_order = sorted(w, key=lambda i: (-w[i], i))[:3]
    assert [r["doc_id"] for r in sel] == exp_order


def test_gumbel_selection_deterministic_and_stable(raw, target):
    a = dsir_select(raw, target, 4).collect()
    b = dsir_select(raw.repartition(7), target, 4).collect()
    assert [(r["doc_id"], r["key"]) for r in a] == [
        (r["doc_id"], r["key"]) for r in b
    ]
    # gumbel keys differ from raw weights (noise applied) but remain
    # reproducible: a fresh invocation gives identical keys
    c = dsir_select(raw, target, 4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in c]


def test_duckdb_replay_of_log_weights(raw, target, spark):
    """The oracle-spec SQL (the q_text_quality 'dsir' branch's core)
    reproduces Spark's log weights digit-for-digit at round-6."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE raw AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t, _ in RAW)
        + ") v(doc_id, text)"
    )
    con.execute(
        "CREATE TABLE tgt AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in TARGET)
        + ") v(doc_id, text)"
    )
    sql = r"""
    WITH toks AS (
      SELECT doc_id, FALSE AS is_t, regexp_extract_all(lower(text), '[\p{L}]+') AS t FROM raw
      UNION ALL
      SELECT doc_id, TRUE AS is_t, regexp_extract_all(lower(text), '[\p{L}]+') AS t FROM tgt
    ), grams AS (
      SELECT doc_id, is_t, unnest(t) AS g FROM toks
      UNION ALL
      SELECT doc_id, is_t,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
      FROM toks
    ), gb AS (
      SELECT g, CAST(list_sum(list_transform(range(0, 8), j ->
          (CAST(instr('0123456789abcdef', substr(sha256('dsir-v1' || g), j + 1, 1)) AS BIGINT) - 1)
          << (4 * (7 - CAST(j AS INT))))) AS BIGINT) % 10000 AS b
      FROM (SELECT DISTINCT g FROM grams)
    ), occ AS (
      SELECT doc_id, is_t, b FROM grams JOIN gb USING (g)
    ), tot AS (
      SELECT CAST(COUNT(*) FILTER (WHERE NOT is_t) AS DOUBLE) AS R,
             CAST(COUNT(*) FILTER (WHERE is_t) AS DOUBLE) AS T
      FROM occ
    ), bc AS (
      SELECT b, CAST(COUNT(*) FILTER (WHERE NOT is_t) AS DOUBLE) AS rc,
             CAST(COUNT(*) FILTER (WHERE is_t) AS DOUBLE) AS tc
      FROM occ GROUP BY b
    )
    SELECT doc_id, round(SUM(ln((tc + 1.0) / (T + 10000.0))
                             - ln((rc + 1.0) / (R + 10000.0))), 6) AS log_w
    FROM occ JOIN bc USING (b) CROSS JOIN tot
    WHERE NOT is_t
    GROUP BY doc_id
    """
    duck = {i: w for i, w in con.execute(sql).fetchall()}
    got = {r["doc_id"]: r["log_w"] for r in dsir_log_weights(raw, target).collect()}
    assert duck == got


def test_target_pred_path_equals_union_path(raw, target, spark):
    """The single-scan target_pred form computes identical weights to
    the two-corpus union form when target == raw.filter(pred)."""
    en = raw.where(F.col("lang") == "en").select("doc_id", "text")
    a = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(raw, en).collect()
    }
    b = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(
            raw, target_pred=F.col("lang") == "en"
        ).collect()
    }
    assert a == b
    with pytest.raises(ValueError, match="exactly one"):
        dsir_log_weights(raw, en, target_pred=F.col("lang") == "en").collect()
    with pytest.raises(ValueError, match="exactly one"):
        dsir_log_weights(raw).collect()


def test_lm_cross_entropy_reference_and_replay(raw, target, spark):
    """CCNet-style perplexity scoring: matches a from-scratch python
    reference; reference-like docs score lower; single-scan ref_pred
    path == two-corpus path."""
    from snapflow_spark.operators.selection import lm_cross_entropy

    got = {
        r["doc_id"]: (r["n_grams"], r["cross_entropy"], r["ppl"])
        for r in lm_cross_entropy(raw, target).collect()
    }
    # python reference
    tc, T = {}, 0
    for _, text in TARGET:
        for g in _grams(text):
            b = _bucket(g, "dsir-v1")
            tc[b] = tc.get(b, 0) + 1
            T += 1
    for i, text, _ in RAW:
        gs = _grams(text)
        if not gs:
            assert i not in got
            continue
        lps = [
            math.log((tc.get(_bucket(g, "dsir-v1"), 0) + 1.0) / (T + 10000.0))
            for g in gs
        ]
        ce = round(-sum(lps) / len(lps), 6)
        n, gce, ppl = got[i]
        assert n == len(gs)
        assert abs(gce - ce) <= 2e-6, (i, gce, ce)
        assert abs(ppl - round(math.exp(gce), 6)) <= 1e-6
    # topical signal: spark-topic docs are closer to the target LM
    assert got[0][1] < got[2][1]  # doc 0 (spark) beats doc 2 (cooking)
    # predicate path parity
    en = raw.where(F.col("lang") == "en").select("doc_id", "text")
    a = {r["doc_id"]: r["cross_entropy"] for r in lm_cross_entropy(raw, en).collect()}
    b = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_cross_entropy(raw, ref_pred=F.col("lang") == "en").collect()
    }
    assert a == b


def test_perplexity_buckets_match_numpy_quantiles(raw, spark):
    """head/middle/tail assignment matches numpy linear-interpolation
    quantiles over the exact scored ppl values, per-lang and global;
    exact mode is repartition-stable; keep-join composition works via
    the YAML builtin."""
    import numpy as np

    from snapflow_spark.operators.selection import (
        lm_cross_entropy,
        perplexity_buckets,
    )

    ref_pred = F.col("lang") == "en"
    scored = {
        r["doc_id"]: r["ppl"]
        for r in lm_cross_entropy(raw, ref_pred=ref_pred).collect()
    }

    def want_buckets(ppls):
        lo, hi = np.quantile(list(ppls.values()), [1 / 3, 2 / 3])
        return {
            i: ("head" if p <= lo else "middle" if p <= hi else "tail")
            for i, p in ppls.items()
        }

    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(raw, ref_pred=ref_pred, exact=True).collect()
    }
    assert got == want_buckets(scored)

    # per-lang thresholds: each group gets its own quantiles
    lang_of = {r[0]: r[2] for r in RAW}
    by_lang = {
        r["doc_id"]: (r["lang"], r["ppl_bucket"])
        for r in perplexity_buckets(
            raw, ref_pred=ref_pred, by="lang", exact=True
        ).collect()
    }
    for lang in {lang_of[i] for i in scored}:
        group = {i: p for i, p in scored.items() if lang_of[i] == lang}
        want = want_buckets(group)
        got_g = {i: b for i, (lg, b) in by_lang.items() if lg == lang}
        assert got_g == want, lang

    # exact mode repartition determinism
    again = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(
            raw.repartition(5), ref_pred=ref_pred, exact=True
        ).collect()
    }
    assert again == got


def test_ppl_buckets_yaml_keep(spark, tmp_path):
    from snapflow_spark.plans import load_graph

    cfg = {
        "warehouse": str(tmp_path / "wh_ppl"),
        "sources": ["docs_src"],
        "nodes": [
            {
                "name": "head_docs",
                "function": "core.ppl_buckets",
                "upstream": {"input": "docs_src"},
                "params": {
                    "ref_where": "lang = 'en'",
                    "keep": "head",
                    "exact": True,
                },
                "overwrite": True,
            },
        ],
    }
    g = load_graph(cfg)
    g.source("docs_src").append(
        spark.createDataFrame(RAW, "doc_id bigint, text string, lang string")
    )
    assert g.produce(spark) == 1
    rows = g.read(spark, "head_docs").collect()
    assert rows and all(r.ppl_bucket == "head" for r in rows)
    assert {"doc_id", "text", "lang", "ppl", "ppl_bucket"} <= set(rows[0].asDict())


def test_perplexity_buckets_keep_thresholds(raw, spark):
    """keep_thresholds=True exposes each group's exact cut points as
    ppl_q_lo/ppl_q_hi (numpy linear-interpolation parity) and the
    bucket tag derives from THOSE columns; the default still drops
    the internal threshold columns."""
    import numpy as np

    from snapflow_spark.operators.selection import perplexity_buckets

    ref_pred = F.col("lang") == "en"
    rows = perplexity_buckets(
        raw, ref_pred=ref_pred, by="lang", exact=True, keep_thresholds=True
    ).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, grp in by_lang.items():
        lo, hi = np.quantile([r.ppl for r in grp], [1 / 3, 2 / 3])
        for r in grp:
            assert r.ppl_q_lo == pytest.approx(lo, abs=1e-9), lang
            assert r.ppl_q_hi == pytest.approx(hi, abs=1e-9), lang
            want = (
                "head"
                if r.ppl <= r.ppl_q_lo
                else "middle" if r.ppl <= r.ppl_q_hi else "tail"
            )
            assert r.ppl_bucket == want

    cols = perplexity_buckets(raw, ref_pred=ref_pred, exact=True).columns
    assert "ppl_q_lo" not in cols and "__q_lo" not in cols
