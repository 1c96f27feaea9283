"""Aho-Corasick phrase matching (functions/phrases.py): brute-force
parity (incl. hypothesis fuzz), overlap/nesting/output-chain cases,
casefolding, word boundaries, and the Spark surface with counters."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from snapflow_spark.functions.phrases import (
    PhraseMatcher,
    phrase_filter,
    phrase_hits,
)


def brute_find(text, phrases, ci=True, wb=False):
    hay = text.casefold() if ci else text
    hits = []
    for p in sorted({(q.casefold() if ci else q) for q in phrases if q}):
        first = None
        for m in re.finditer(re.escape(p), hay):
            if wb:
                s, e = m.start(), m.end()
                if s > 0 and (hay[s - 1].isalnum() or hay[s - 1] == "_"):
                    continue
                if e < len(hay) and (hay[e].isalnum() or hay[e] == "_"):
                    continue
            first = m.start()
            break
        if first is not None:
            # the automaton reports at match END; ties longest-first
            hits.append((first + len(p), -len(p), p))
    return [p for _, _, p in sorted(hits)]


def test_overlap_nesting_and_output_chain():
    m = PhraseMatcher(["he", "she", "his", "hers", "her"])
    assert set(m.find("ushers")) == {"she", "he", "her", "hers"}
    m2 = PhraseMatcher(["abcd", "bc", "c"])
    assert set(m2.find("xabcdx")) == {"abcd", "bc", "c"}
    assert m2.find("") == [] and m2.find(None) == []
    assert PhraseMatcher([]).find("anything") == []


def test_casefold_and_boundaries():
    m = PhraseMatcher(["STRASSE"], case_insensitive=True)
    assert m.find("die straße ist lang") == ["strasse"]
    m = PhraseMatcher(["class"], word_boundaries=True)
    assert m.find("the class starts") == ["class"]
    assert m.find("subclass classes class_name") == []
    m = PhraseMatcher(["ass"], word_boundaries=False)
    assert m.find("subclass") == ["ass"]


@given(
    st.lists(st.text(alphabet="abcß ", min_size=1, max_size=5), min_size=1, max_size=8),
    st.text(alphabet="abcß _ABC", max_size=60),
    st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_fuzz_parity_with_bruteforce(phrases, text, wb):
    m = PhraseMatcher(phrases, word_boundaries=wb)
    got = m.find(text)
    want = brute_find(text, phrases, wb=wb)
    assert sorted(got) == sorted(want), (phrases, text, wb)
    assert got == want  # first-hit order too


def test_spark_surface_and_counters(spark):
    from pyspark.sql import Observation

    rows = [
        (0, "a perfectly clean document about data"),
        (1, "contains the casino-bonus spam phrase"),
        (2, "mentions TERMS OF USE in caps"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    phrases = ["casino-bonus", "terms of use"]
    tagged = phrase_hits(df, phrases)
    got = {r.doc_id: list(r.phrase_hits) for r in tagged.collect()}
    assert got == {0: [], 1: ["casino-bonus"], 2: ["terms of use"], 3: []}

    obs = Observation()
    kept = phrase_filter(df, phrases, observation=obs)
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {0, 3}
    assert obs.get == {"rows_in": 4, "rows_dropped": 2, "rows_kept": 2}
    assert kept.columns == df.columns

    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
