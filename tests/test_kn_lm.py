"""Interpolated Kneser-Ney bigram LM (functions/kn_lm.py): parity
against a FROM-SCRATCH python implementation of the published
formulas, exact normalization at both levels, persistence, vocab
pruning, and the bucket-divergence property — the conditional model
orders documents differently from the hashed-gram bag model exactly
where word order / continuation diversity carries the signal."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from snapflow_spark.functions.kn_lm import (
    _SEP,
    KNBigramLM,
    train_kn_bigram,
)

REF_DOCS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat ate the fish",
    "a dog ran in the park",
    "san francisco is foggy",
    "san francisco is hilly",
    "san francisco is pricey",
]


def _py_kn(docs):
    """Independent from-scratch interpolated KN (Chen & Goodman
    1998): returns (D, tables) built with plain dict arithmetic —
    shares no code with the module under test."""
    big = {}
    for d in docs:
        toks = ["<s>"] + d.split()
        for u, w in zip(toks, toks[1:]):
            big[(u, w)] = big.get((u, w), 0) + 1
    n1 = sum(1 for c in big.values() if c == 1)
    n2 = sum(1 for c in big.values() if c == 2)
    D = n1 / (n1 + 2 * n2)
    c_u, n1p_u, cont = {}, {}, {}
    for (u, w), c in big.items():
        c_u[u] = c_u.get(u, 0) + c
        n1p_u[u] = n1p_u.get(u, 0) + 1
        cont[w] = cont.get(w, 0) + 1
    N = len(big)
    V = len(cont)

    def p(u, w):
        t = len(cont)
        pc = (max(cont.get(w, 0) - D, 0) + D * t / (V + 1)) / N
        if c_u.get(u, 0) <= 0:
            return pc
        return max(big.get((u, w), 0) - D, 0) / c_u[u] + D * n1p_u[u] / c_u[u] * pc

    def ce(doc):
        toks = doc.split()
        if not toks:
            return 0, 0.0
        tot, prev = 0.0, "<s>"
        for w in toks:
            tot -= math.log(p(prev, w))
            prev = w
        return len(toks), tot / len(toks)

    return D, p, ce, (c_u, cont, V, N)


def test_training_parity_with_from_scratch_python(spark):
    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_bigram(ref)
    D, p, ce, (c_u, cont, V, N) = _py_kn(REF_DOCS)
    assert lm.d == pytest.approx(D, rel=1e-12)
    assert lm.v == V and lm.n_cont == N
    assert lm.c_u == c_u and lm.cont == cont
    # pointwise probability parity, incl. unseen bigram and OOV word
    for u, w in [
        ("the", "cat"), ("san", "francisco"), ("cat", "francisco"),
        ("the", "zebra"), ("neverseen", "cat"),
    ]:
        assert math.exp(lm.logp(u, w)) == pytest.approx(p(u, w), rel=1e-12)


def test_both_levels_normalize_to_one(spark):
    """Σ_w P(w|u) over seen types + (V+1-T)·P(unseen) == 1 exactly —
    the interpolated-KN telescoping property, for every context and
    for the continuation distribution itself."""
    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_bigram(ref)
    words = sorted(lm.cont)
    # continuation level: seen types + (V+1 - T) unseen slots
    t = len(lm.cont)
    unseen_pc = (lm.d * t / (lm.v + 1)) / lm.n_cont
    pc_sum = sum(
        (max(lm.cont[w] - lm.d, 0) + lm.d * t / (lm.v + 1)) / lm.n_cont
        for w in words
    ) + (lm.v + 1 - t) * unseen_pc
    assert pc_sum == pytest.approx(1.0, abs=1e-12)
    for u in list(lm.c_u)[:8]:
        s = sum(math.exp(lm.logp(u, w)) for w in words)
        # plus the single aggregated unseen-word event
        s += (lm.v + 1 - t) * math.exp(lm.logp(u, "§never§"))
        assert s == pytest.approx(1.0, abs=1e-10), u


def test_spark_scoring_matches_python_ce(spark):
    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_bigram(ref)
    _, _, ce, _ = _py_kn(REF_DOCS)
    raw = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog ate the fish"),
            (2, "zebra quark blimp"),  # all OOV
            (3, ""),  # token-less
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in lm.score(raw).collect()}
    for i, txt in [(0, "the cat sat on the mat"), (1, "the dog ate the fish"),
                   (2, "zebra quark blimp")]:
        n, c = ce(txt)
        assert got[i].n_grams == n
        assert got[i].cross_entropy == pytest.approx(round(c, 6), abs=1e-6)
        assert got[i].ppl == pytest.approx(round(math.exp(round(c, 6)), 6), abs=1e-4)
    assert got[3].n_grams == 0 and got[3].cross_entropy == 0.0


def test_save_load_round_trip(spark, tmp_path):
    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_bigram(ref)
    p = str(tmp_path / "kn.json")
    lm.save(p)
    lm2 = KNBigramLM.load(p)
    assert lm2.d == lm.d and lm2.c_uw == lm.c_uw and lm2.cont == lm.cont
    assert lm2.logp("the", "cat") == lm.logp("the", "cat")
    with pytest.raises(ValueError, match="not a kn_bigram"):
        bad = str(tmp_path / "bad.json")
        open(bad, "w").write("{}")
        KNBigramLM.load(bad)


def test_vocab_pruning_collapses_to_unk(spark):
    """min_word_count prunes BEFORE bigram formation (KenLM-style):
    rare words become <unk> in the model, and scoring maps OOV and
    pruned words onto the same event."""
    ref = spark.createDataFrame(
        [(t,) for t in ["a a a b b rare", "a b a b unique"]], "text string"
    )
    lm = train_kn_bigram(ref, min_word_count=2)
    assert "<unk>" in lm.cont
    assert "rare" not in lm.c_u and "rare" not in lm.cont
    # scoring treats a pruned word and a never-seen word identically
    raw = spark.createDataFrame(
        [(0, "a rare b"), (1, "a zebra b")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r.cross_entropy for r in lm.score(raw).collect()}
    assert got[0] == got[1]


def test_kn_orders_differently_than_hashed_gram_where_it_should(spark):
    """The published reason to prefer KN: 'francisco' is FREQUENT in
    the reference but only ever continues 'san', so a document using
    it after a novel context must score poorly — the conditional
    model penalizes it below a document whose words have diverse
    continuations, while the bag-of-grams model (which rewards raw
    gram frequency mass) ranks the pair the other way."""
    from snapflow_spark.operators.selection import (
        lm_cross_entropy,
        perplexity_buckets,
    )

    ref_docs = REF_DOCS + ["san francisco is big"] * 20
    ref = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(ref_docs)],
        "doc_id bigint, text string",
    )
    lm = train_kn_bigram(ref)
    raw = spark.createDataFrame(
        [
            (0, "park francisco francisco francisco"),  # frequent word, novel context
            (1, "the dog ran in the park"),  # modest words, seen transitions
        ],
        "doc_id bigint, text string",
    )
    kn = {r.doc_id: r.ppl for r in lm.score(raw).collect()}
    hashed = {
        r.doc_id: r.ppl
        for r in lm_cross_entropy(raw, ref=ref).collect()
    }
    # KN: doc 1 (seen transitions) beats doc 0 (novel-context use of a
    # frequent word). The bag model ranks doc 0 at or above doc 1 on
    # raw gram-frequency mass — the orderings DISAGREE on this pair.
    assert kn[1] < kn[0]
    assert hashed[0] < hashed[1]
    # and the lm= hook drives the same scorer through the CCNet bucketer
    buckets = perplexity_buckets(
        raw, lm=lm, fractions=(0.5, 0.75), exact=True
    )
    got = {r.doc_id: r.ppl_bucket for r in buckets.collect()}
    assert got[1] == "head" and got[0] == "tail"
    with pytest.raises(ValueError, match="not both"):
        perplexity_buckets(raw, ref=ref, lm=lm)


def test_from_counts_guards():
    with pytest.raises(ValueError, match="no bigrams"):
        KNBigramLM.from_counts({})
    lm = KNBigramLM.from_counts({f"a{_SEP}b": 3, f"b{_SEP}a": 1})
    assert lm.v == 2 and lm.n_cont == 2


def _py_modified_kn(docs):
    """Independent from-scratch MODIFIED KN (Chen & Goodman 1998
    §5.2.2 eq. 26) — three discounts per level, both levels."""
    big = {}
    for d in docs:
        toks = ["<s>"] + d.split()
        for u, w in zip(toks, toks[1:]):
            big[(u, w)] = big.get((u, w), 0) + 1
    nc = {}
    for c in big.values():
        if c <= 4:
            nc[c] = nc.get(c, 0) + 1
    n1, n2, n3, n4 = (nc.get(i, 0) for i in (1, 2, 3, 4))
    single = n1 / (n1 + 2 * n2)
    y = n1 / (n1 + 2 * n2)
    ok = lambda v, hi: v if 0.0 < v <= hi else min(single, hi)  # noqa: E731
    D = (
        ok(1 - 2 * y * n2 / n1, 1.0),
        ok(2 - 3 * y * n3 / n2 if n2 else single, 2.0),
        ok(3 - 4 * y * n4 / n3 if n3 else single, 3.0),
    )
    disc = lambda ds, c: 0.0 if c <= 0 else ds[min(c, 3) - 1]  # noqa: E731
    c_u, cont, lam = {}, {}, {}
    for (u, w), c in big.items():
        c_u[u] = c_u.get(u, 0) + c
        cont[w] = cont.get(w, 0) + 1
        lam[u] = lam.get(u, 0.0) + disc(D, c)
    N, V = len(big), len(cont)
    mc = {}
    for cw in cont.values():
        if cw <= 4:
            mc[cw] = mc.get(cw, 0) + 1
    m1, m2, m3, m4 = (mc.get(i, 0) for i in (1, 2, 3, 4))
    cs = m1 / (m1 + 2 * m2) if m1 > 0 else 0.5
    yc = cs
    okc = lambda v, hi: v if 0.0 < v <= hi else min(cs, hi)  # noqa: E731
    Dc = (
        okc(1 - 2 * yc * m2 / m1 if m1 else cs, 1.0),
        okc(2 - 3 * yc * m3 / m2 if m2 else cs, 2.0),
        okc(3 - 4 * yc * m4 / m3 if m3 else cs, 3.0),
    )
    mass = sum(disc(Dc, cw) for cw in cont.values())

    def p1(w):
        cw = cont.get(w, 0)
        return (max(cw - disc(Dc, cw), 0.0) + mass / (V + 1)) / N

    def p(u, w):
        if c_u.get(u, 0) <= 0:
            return p1(w)
        c = big.get((u, w), 0)
        return max(c - disc(D, c), 0.0) / c_u[u] + lam[u] / c_u[u] * p1(w)

    return D, Dc, p


def test_modified_kn_parity_with_from_scratch_python(spark):
    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_bigram(ref, modified=True)
    D, Dc, p = _py_modified_kn(REF_DOCS)
    assert lm.modified and lm.ds == pytest.approx(D, rel=1e-12)
    assert lm.cont_ds == pytest.approx(Dc, rel=1e-12)
    for u, w in [
        ("the", "cat"), ("san", "francisco"), ("cat", "francisco"),
        ("the", "zebra"), ("neverseen", "cat"), ("is", "foggy"),
    ]:
        assert math.exp(lm.logp(u, w)) == pytest.approx(p(u, w), rel=1e-12)


def test_modified_kn_normalizes_to_one(spark):
    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_bigram(ref, modified=True)
    words = sorted(lm.cont)
    t_seen = len(lm.cont)
    unseen = math.exp(lm.logp("neverseen-context", "§never§"))
    pc_sum = sum(
        math.exp(lm.logp("neverseen-context", w)) for w in words
    ) + (lm.v + 1 - t_seen) * unseen
    assert pc_sum == pytest.approx(1.0, abs=1e-10)
    for u in list(lm.c_u)[:8]:
        s = sum(math.exp(lm.logp(u, w)) for w in words)
        s += (lm.v + 1 - t_seen) * math.exp(lm.logp(u, "§never§"))
        assert s == pytest.approx(1.0, abs=1e-10), u


def test_modified_kn_save_load_and_degenerate_fallback(spark, tmp_path):
    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_bigram(ref, modified=True)
    path = str(tmp_path / "mkn.json")
    lm.save(path)
    lm2 = KNBigramLM.load(path)
    assert lm2.modified and lm2.ds == lm.ds and lm2.cont_ds == lm.cont_ds
    assert lm2.logp("the", "cat") == lm.logp("the", "cat")
    # degenerate counts-of-counts: all bigrams count 1 -> D2/D3 fall
    # back to the single-D estimate instead of dividing by zero
    tiny = KNBigramLM.from_counts(
        {f"a{_SEP}b": 1, f"b{_SEP}c": 1}, modified=True
    )
    assert tiny.ds[1] == tiny.d and tiny.ds[2] == tiny.d
    # scoring stays total
    n, ce = tiny.cross_entropy(["a", "b", "zzz"])
    assert n == 3 and math.isfinite(ce)


def test_yaml_ppl_buckets_with_trained_artifact(spark, tmp_path):
    """core.ppl_buckets lm=: a trained KN artifact drives the CCNet
    bucketer from YAML (the core.tokenize trained-artifact pattern);
    ref_where and lm are mutually exclusive."""
    from snapflow_spark.plans import load_graph
    from snapflow_spark.plans.yaml_config import _ppl_buckets

    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    path = str(tmp_path / "lm.json")
    train_kn_bigram(ref, modified=True).save(path)
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "park francisco francisco"),
         (2, "a dog ran in the park")],
        "doc_id bigint, text string",
    )
    cfg = {
        "warehouse": str(tmp_path / "wh_ppl"),
        "sources": [{"name": "docs"}],
        "nodes": [
            {
                "name": "bucketed",
                "function": "core.ppl_buckets",
                "upstream": {"input": {"node": "docs", "mode": "reference"}},
                "params": {
                    "lm": path,
                    "fractions": [0.4, 0.7],
                    "exact": True,
                },
            }
        ],
    }
    g = load_graph(cfg)
    g.pipeline.sources["docs"].append(docs)
    assert g.produce(spark) == 1
    got = {r.doc_id: r.ppl_bucket for r in g.read(spark, "bucketed").collect()}
    assert set(got) == {0, 1, 2}
    assert got[1] == "tail"  # novel-context francisco scores worst
    with pytest.raises(ValueError, match="not both"):
        _ppl_buckets(spark, docs, ref_where="1=1", lm=path)
    with pytest.raises(ValueError, match="needs ref_where"):
        _ppl_buckets(spark, docs)


# --- general order-n KN (round 11) ----------------------------------


def test_kngram_order2_reproduces_bigram_model_exactly(spark):
    """The general construction at order 2 must equal KNBigramLM
    (modified) table-for-table and probability-for-probability —
    cross-validating both implementations."""
    from snapflow_spark.functions.kn_lm import train_kn_ngram

    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    big = train_kn_bigram(ref, modified=True)
    gen = train_kn_ngram(ref, order=2, modified=True)
    assert gen.counts[2] == big.c_uw
    assert gen.counts[1] == big.cont
    assert gen.ds[2] == big.ds and gen.ds[1] == big.cont_ds
    assert gen.mass1 == pytest.approx(big.cont_mass, rel=1e-12)
    assert gen.v == big.v and gen.tot1 == big.n_cont
    for u, w in [
        ("the", "cat"), ("san", "francisco"), ("cat", "francisco"),
        ("the", "zebra"), ("neverseen", "cat"), ("is", "foggy"),
    ]:
        assert gen.logp((u,), w) == pytest.approx(
            big.logp(u, w), rel=1e-12
        )
    # document-level CE identical too
    toks = "the cat ate the fish near san francisco".split()
    assert gen.cross_entropy(toks)[1] == pytest.approx(
        big.cross_entropy(toks)[1], rel=1e-12
    )


def _py_kn3(docs):
    """Independent from-scratch modified-KN TRIGRAM (continuation
    counts downward, per-level discounts, uniform V+1 floor)."""
    tri = {}
    for d in docs:
        toks = ["<s>", "<s>"] + d.split()
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
    # continuation levels
    bi = {}
    for (a, b, c) in tri:
        bi[(b, c)] = bi.get((b, c), 0) + 1
    uni = {}
    for (b, c) in bi:
        uni[c] = uni.get(c, 0) + 1

    def discounts(values):
        nc = {}
        for c in values:
            if c <= 4:
                nc[c] = nc.get(c, 0) + 1
        n1, n2, n3, n4 = (nc.get(i, 0) for i in (1, 2, 3, 4))
        single = n1 / (n1 + 2 * n2) if n1 > 0 else 0.5
        if n1 == 0 or (n1 + 2 * n2) == 0:
            return (single,) * 3
        y = n1 / (n1 + 2 * n2)
        raw = (
            1 - 2 * y * n2 / n1,
            2 - 3 * y * n3 / n2 if n2 else single,
            3 - 4 * y * n4 / n3 if n3 else single,
        )
        return tuple(
            v if 0.0 < v <= hi else min(single, hi)
            for v, hi in zip(raw, (1.0, 2.0, 3.0))
        )

    D3, D2, D1 = discounts(tri.values()), discounts(bi.values()), discounts(uni.values())
    dsc = lambda ds, c: 0.0 if c <= 0 else ds[min(c, 3) - 1]  # noqa: E731
    tot3, lam3 = {}, {}
    for (a, b, c), n in tri.items():
        tot3[(a, b)] = tot3.get((a, b), 0) + n
        lam3[(a, b)] = lam3.get((a, b), 0.0) + dsc(D3, n)
    tot2, lam2 = {}, {}
    for (b, c), n in bi.items():
        tot2[b] = tot2.get(b, 0) + n
        lam2[b] = lam2.get(b, 0.0) + dsc(D2, n)
    N1 = sum(uni.values())
    V = len(uni)
    mass1 = sum(dsc(D1, c) for c in uni.values())

    def p1(w):
        c = uni.get(w, 0)
        return (max(c - dsc(D1, c), 0.0) + mass1 / (V + 1)) / N1

    def p2(b, w):
        if tot2.get(b, 0) <= 0:
            return p1(w)
        c = bi.get((b, w), 0)
        return max(c - dsc(D2, c), 0.0) / tot2[b] + lam2[b] / tot2[b] * p1(w)

    def p3(a, b, w):
        if tot3.get((a, b), 0) <= 0:
            return p2(b, w)
        c = tri.get((a, b, w), 0)
        return (
            max(c - dsc(D3, c), 0.0) / tot3[(a, b)]
            + lam3[(a, b)] / tot3[(a, b)] * p2(b, w)
        )

    return p3, (D3, D2, D1), uni


def test_kngram_trigram_parity_with_from_scratch_python(spark):
    from snapflow_spark.functions.kn_lm import train_kn_ngram

    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_ngram(ref, order=3)
    p3, (D3, D2, D1), uni = _py_kn3(REF_DOCS)
    assert lm.ds[3] == pytest.approx(D3, rel=1e-12)
    assert lm.ds[2] == pytest.approx(D2, rel=1e-12)
    assert lm.ds[1] == pytest.approx(D1, rel=1e-12)
    assert lm.counts[1] == uni
    cases = [
        ("san", "francisco", "is"),     # seen trigram
        ("<s>", "the", "cat"),          # BOS context
        ("the", "cat", "ran"),          # unseen trigram, seen bigram
        ("cat", "dog", "the"),          # unseen context -> backoff
        ("a", "dog", "zebra"),          # OOV word
        ("qq", "ww", "ee"),             # everything unseen
    ]
    for a, b, w in cases:
        assert math.exp(lm.logp((a, b), w)) == pytest.approx(
            p3(a, b, w), rel=1e-12
        ), (a, b, w)


def test_kngram_all_levels_normalize(spark):
    from snapflow_spark.functions.kn_lm import train_kn_ngram

    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_ngram(ref, order=3)
    words = sorted(lm.counts[1])
    t_seen = len(words)
    # several contexts: seen (a,b), BOS, half-seen, fully unseen
    for ctx in [("san", "francisco"), ("<s>", "<s>"), ("zz", "the"),
                ("zz", "qq")]:
        s = sum(math.exp(lm.logp(ctx, w)) for w in words)
        s += (lm.v + 1 - t_seen) * math.exp(lm.logp(ctx, "§never§"))
        assert s == pytest.approx(1.0, abs=1e-10), ctx


def test_kngram_scoring_persistence_and_dispatch(spark, tmp_path):
    from snapflow_spark.functions.kn_lm import (
        load_lm,
        train_kn_ngram,
    )

    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_ngram(ref, order=3)
    raw = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "mat the on sat cat the"),
         (2, "")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in lm.score(raw).collect()}
    # Spark CE == driver CE
    n, c = lm.cross_entropy("the cat sat on the mat".split())
    assert got[0].n_grams == n
    assert got[0].cross_entropy == pytest.approx(round(c, 6), abs=1e-6)
    # word order matters MORE at order 3: the scrambled twin is worse
    assert got[0].ppl < got[1].ppl
    assert got[2].n_grams == 0
    # persistence + kind dispatch
    p = str(tmp_path / "kn3.json")
    lm.save(p)
    lm2 = load_lm(p)
    assert lm2.order == 3 and lm2.logp(("san", "francisco"), "is") == (
        lm.logp(("san", "francisco"), "is")
    )
    big_p = str(tmp_path / "kn2.json")
    train_kn_bigram(ref).save(big_p)
    assert load_lm(big_p).__class__.__name__ == "KNBigramLM"
    bad = str(tmp_path / "junk.json")
    open(bad, "w").write('{"kind": "nope"}')
    with pytest.raises(ValueError, match="not a known LM"):
        load_lm(bad)


def test_new_map_only_ops_plan_shape(spark):
    """Plan gates (round 11): KN scoring and embed_with_model are
    MAP-ONLY — no Exchange anywhere; the python boundary is exactly
    one Arrow-batched node each (the honest model-call cost)."""
    from snapflow_spark.functions.embed import embed_with_model
    from snapflow_spark.functions.kn_lm import train_kn_ngram

    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_ngram(ref, order=3)
    docs = spark.createDataFrame(
        [(0, "the cat sat")], "doc_id bigint, text string"
    )
    kn_plan = (
        lm.score(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in kn_plan
    assert kn_plan.count("ArrowEvalPython") == 1

    emb_plan = (
        embed_with_model(docs, lambda ts: [[1.0, 2.0]] * len(ts))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in emb_plan
    assert "MapInArrow" in emb_plan or "ArrowEvalPython" in emb_plan


def test_kngram_trainer_driver_bound_is_a_contract(spark):
    """The n-gram type collect is bounded BY CODE: min_gram_count
    prunes first, and exceeding max_gram_types raises with the knobs
    to turn instead of OOMing the driver."""
    from snapflow_spark.functions.kn_lm import train_kn_ngram

    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    with pytest.raises(ValueError, match="max_gram_types"):
        train_kn_ngram(ref, order=3, max_gram_types=5)
    # pruning rare grams shrinks the dict but keeps the model total
    lm = train_kn_ngram(ref, order=3, min_gram_count=2)
    full = train_kn_ngram(ref, order=3)
    assert len(lm.counts[3]) < len(full.counts[3])
    n, ce = lm.cross_entropy("the cat sat on the mat".split())
    assert n == 6 and math.isfinite(ce)


def test_kn_bucketer_per_group_thresholds(spark):
    """perplexity_buckets(lm=, by=): thresholds computed PER GROUP —
    each language's head/tail split uses its own quantiles, so a
    group whose ppls are uniformly higher still gets heads."""
    from snapflow_spark.operators.selection import perplexity_buckets

    ref = spark.createDataFrame([(t,) for t in REF_DOCS], "text string")
    lm = train_kn_bigram(ref)
    raw = spark.createDataFrame(
        [
            (0, "en", "the cat sat on the mat"),
            (1, "en", "the dog ran in the park"),
            (2, "en", "zz qq ww"),
            (3, "xx", "mat the on sat"),
            (4, "xx", "park cat dog a"),
            (5, "xx", "zz zz zz zz"),
        ],
        "doc_id bigint, lang string, text string",
    )
    out = perplexity_buckets(
        raw, lm=lm, by="lang", fractions=(0.4, 0.8), exact=True
    )
    rows = {r.doc_id: (r.lang, r.ppl_bucket) for r in out.collect()}
    assert len(rows) == 6
    # every group has a head (per-group thresholds) even though all
    # 'xx' ppls exceed every 'en' ppl
    for g in ("en", "xx"):
        assert any(v == (g, "head") for v in rows.values()), g
