"""Frequent-items (Misra-Gries) + Count-Min sketches
(functions/heavyhitters.py): exact interval guarantees, merge
contracts, Spark == local parity."""

from __future__ import annotations

import collections

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from snapflow_spark.functions.heavyhitters import (
    CountMinSketch,
    build_cms,
    frequent_items,
    mg_merge,
    misra_gries,
)


def _zipfish(n_heavy=5, heavy=400, tail_kinds=200, tail=3, seed=0):
    rng = np.random.default_rng(seed)
    items = [f"hh{i}" for i in range(n_heavy) for _ in range(heavy + 10 * i)]
    items += [f"t{i}" for i in range(tail_kinds) for _ in range(tail)]
    rng.shuffle(items)
    return items


# ------------------------------------------------------------------ #
# Misra-Gries
# ------------------------------------------------------------------ #
def test_mg_intervals_contain_truth_and_heavies_survive():
    items = _zipfish()
    true = collections.Counter(items)
    s = misra_gries(items, k=16)
    assert s.n == len(items)
    for item, lo, hi in s.intervals():
        assert lo <= true[item] <= hi, item
    # every item with true count > err is guaranteed present
    for item, c in true.items():
        if c > s.err:
            assert item in s.counts, (item, c, s.err)
    assert set(s.guaranteed(300)) == {f"hh{i}" for i in range(5)}


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=7),
)
def test_mg_chunked_merge_bounds_hold(vals, k, n_chunks):
    items = [str(v) for v in vals]
    true = collections.Counter(items)
    chunks = np.array_split(np.array(items, dtype=object), n_chunks)
    merged = mg_merge([misra_gries(c, k) for c in chunks], k)
    assert merged.n == len(items)
    assert len(merged.counts) <= k
    for item, lo, hi in merged.intervals():
        assert lo <= true[item] <= hi
    for item, c in true.items():
        if c > merged.err:
            assert item in merged.counts


def test_mg_merge_order_insensitive():
    items = _zipfish(seed=7)
    chunks = [items[i::4] for i in range(4)]
    parts = [misra_gries(c, 8) for c in chunks]
    a = mg_merge(parts, 8)
    b = mg_merge(list(reversed(parts)), 8)
    assert a.counts == b.counts and a.err == b.err and a.n == b.n


def test_frequent_items_spark(spark):
    items = _zipfish(seed=3)
    true = collections.Counter(items)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(items)], "i long, item string"
    ).repartition(6)
    s = frequent_items(df, "item", k=16)
    assert s.n == len(items)
    for item, lo, hi in s.intervals():
        assert lo <= true[item] <= hi, item
    for item, c in true.items():
        if c > s.err:
            assert item in s.counts
    assert set(s.guaranteed(300)) == {f"hh{i}" for i in range(5)}


# ------------------------------------------------------------------ #
# Count-Min
# ------------------------------------------------------------------ #
def test_cms_never_undercounts_and_bounded_overcount():
    items = _zipfish(seed=1)
    true = collections.Counter(items)
    cms = CountMinSketch(depth=5, width=4096)
    for it in items:
        cms.add(it)
    eps_n = int(np.e / 4096 * len(items)) + 1
    for item, c in true.items():
        est = cms.estimate(item)
        assert est >= c
        assert est <= c + 50 * eps_n  # generous: width >> distincts here


def test_cms_merge_equals_whole_and_serialize():
    items = _zipfish(seed=2)
    half = len(items) // 2
    a = CountMinSketch(4, 512)
    b = CountMinSketch(4, 512)
    whole = CountMinSketch(4, 512)
    for it in items[:half]:
        a.add(it)
    for it in items[half:]:
        b.add(it)
    for it in items:
        whole.add(it)
    merged = a.merge(b)
    assert np.array_equal(merged.counts, whole.counts)
    rt = CountMinSketch.deserialize(merged.serialize())
    assert np.array_equal(rt.counts, merged.counts)
    with pytest.raises(ValueError, match="different shapes"):
        a.merge(CountMinSketch(5, 512))


def test_build_cms_spark_bit_identical_to_local(spark):
    items = _zipfish(seed=5)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(items)], "i long, item string"
    ).repartition(5)
    got = build_cms(df, "item", depth=4, width=1024)
    local = CountMinSketch(4, 1024)
    for it in items:
        local.add(it)
    assert np.array_equal(got.counts, local.counts)
    assert got.n == local.n == len(items)


def test_final_frequent_intervals_empty_final_summary(spark):
    """Regression: when a group's FINAL micro-batch legally prunes to
    an empty summary (all counts tie at the (k+1)-th largest), the
    NULL-item marker row must erase the group's earlier, now-stale
    estimates from the assembled answer."""
    from snapflow_spark.streaming.stateful import final_frequent_intervals

    rows = [
        # group 0, batch 1: item X reported (n=5), marker
        (0, "X", 5, 0, 5), (0, None, 0, 0, 5),
        # group 0, batch 2: prune emptied the summary (n=9), marker only
        (0, None, 0, 9, 9),
        # group 1: normal final state
        (1, "Y", 7, 1, 8), (1, None, 0, 1, 8),
    ]
    df = spark.createDataFrame(
        rows, "grp int, item string, est long, err long, n long"
    )
    out = final_frequent_intervals(df)
    # X's stale batch-1 row must NOT appear; Y's final state must
    assert out == [("Y", 7, 8)]


def test_frequent_items_on_corpus_tokens(spark):
    """Composition against the real fixture corpus: heavy hitters
    over the exploded token stream carry certain intervals that
    agree with exact token counts — the bounded-state vocabulary
    audit for corpora too wide to groupBy exactly."""
    import pyspark.sql.functions as F

    from snapflow_spark.catalog import load_table
    from snapflow_spark.operators.retrieval import word_tokens_expr

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = docs.select(F.explode(word_tokens_expr("text")).alias("tok"))
    s = frequent_items(toks, "tok", k=32)
    exact = {
        r.tok: r.cnt
        for r in toks.groupBy("tok").agg(F.count("*").alias("cnt")).collect()
    }
    assert s.n == sum(exact.values())
    for item, lo, hi in s.intervals():
        assert lo <= exact[item] <= hi, item
    # the corpus's true top token is reported and certainly ranked
    top_tok, top_cnt = max(exact.items(), key=lambda kv: (kv[1], kv[0]))
    assert top_tok in s.counts
    assert top_cnt > s.err  # guaranteed-present regime
