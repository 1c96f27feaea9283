"""Multi-phrase matching at blocklist scale — Aho-Corasick (1975) in
an Arrow-batched UDF.

Real curation pipelines match THOUSANDS of phrases (UT1 category
blocklists, bad-word lists, policy boilerplate): the codegen
``contains()`` chain used for handfuls of phrases
(functions/urls.py's blocklist, the C4 policy rules) evaluates every
phrase against every text — O(phrases × text). The classic automaton
matches all phrases in ONE pass over the text — O(text + hits) —
which is the only shape that survives both a big list and a big
corpus. Keep the codegen ``contains`` chain for handfuls of phrases
(JVM-side beats a python worker round-trip there); switch to this
once the list stops being a handful.

Pinned semantics:
- SUBSTRING matches by default; ``word_boundaries=True`` keeps only
  hits whose neighbors are not word characters (letter/digit/_ —
  python ``str.isalnum`` semantics, unicode-aware), which is what
  bad-word lists want ("class" must not hit "*ss" entries' cousins).
- ``case_insensitive=True`` (default) casefolds both sides — the
  aggressive fold ("ß" == "ss"), matching what a reviewer means by
  case-insensitive more closely than lower().
- Overlapping and nested phrases all report (the failure-link output
  chain), deduplicated per document to the DISTINCT phrase list, ordered by
  first match END (the automaton's natural order; ties longest
  phrase first).

Scale shape: the phrase list broadcasts once per executor; the
automaton builds lazily per python worker (cached by broadcast id)
and each Arrow batch streams through it — map-only, no shuffle, no
driver work.
"""

from __future__ import annotations

from collections import deque

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PhraseMatcher", "phrase_hits", "phrase_filter"]


class PhraseMatcher:
    """Aho-Corasick automaton over a phrase list."""

    def __init__(
        self,
        phrases: list[str] | tuple[str, ...],
        case_insensitive: bool = True,
        word_boundaries: bool = False,
    ):
        self.case_insensitive = bool(case_insensitive)
        self.word_boundaries = bool(word_boundaries)
        norm = []
        for p in phrases:
            q = p.casefold() if self.case_insensitive else p
            if q:
                norm.append(q)
        # trie: list of dicts char -> state; out: phrase indexes ending
        # at each state; fail: failure links
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[list[str]] = [[]]
        for q in sorted(set(norm)):
            s = 0
            for ch in q:
                nxt = self._goto[s].get(ch)
                if nxt is None:
                    self._goto.append({})
                    self._out.append([])
                    nxt = len(self._goto) - 1
                    self._goto[s][ch] = nxt
                s = nxt
            self._out[s].append(q)
        self._fail = [0] * len(self._goto)
        queue = deque()
        for s in self._goto[0].values():
            queue.append(s)
        while queue:
            s = queue.popleft()
            for ch, t in self._goto[s].items():
                queue.append(t)
                f = self._fail[s]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                # goto[f][ch] can never be t itself: t is reachable
                # only through s, and fail[s] is strictly shallower
                self._fail[t] = self._goto[f].get(ch, 0)
                # output chain: suffix phrases also end here
                self._out[t] = self._out[t] + self._out[self._fail[t]]

    @staticmethod
    def _is_word(ch: str) -> bool:
        return ch.isalnum() or ch == "_"

    def find(self, text: str | None) -> list[str]:
        """Distinct matched phrases, ordered by first match end."""
        if not text:
            return []
        hay = text.casefold() if self.case_insensitive else text
        s = 0
        seen: dict[str, None] = {}
        goto, fail, out = self._goto, self._fail, self._out
        for i, ch in enumerate(hay):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                for q in out[s]:
                    if self.word_boundaries:
                        start = i - len(q) + 1
                        if start > 0 and self._is_word(hay[start - 1]):
                            continue
                        if i + 1 < len(hay) and self._is_word(hay[i + 1]):
                            continue
                    if q not in seen:
                        seen[q] = None
        return list(seen)

    def any(self, text: str | None) -> bool:
        return bool(self.find(text))


def phrase_hits(
    df: DataFrame,
    phrases: list[str] | tuple[str, ...],
    text_col: str = "text",
    output_col: str = "phrase_hits",
    case_insensitive: bool = True,
    word_boundaries: bool = False,
) -> DataFrame:
    """Add ``output_col``: the distinct matched phrases per row
    (array<string>, first-match-end order, empty when clean). One automaton
    per executor via broadcast; map-only."""
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (tuple(phrases), bool(case_insensitive), bool(word_boundaries))
    )

    @pandas_udf("array<string>")
    def hits(texts: pd.Series) -> pd.Series:
        ph, ci, wb = bc.value
        m = PhraseMatcher(list(ph), case_insensitive=ci, word_boundaries=wb)
        return texts.map(m.find)

    return df.withColumn(output_col, hits(F.col(text_col)))


def phrase_filter(
    df: DataFrame,
    phrases: list[str] | tuple[str, ...],
    text_col: str = "text",
    case_insensitive: bool = True,
    word_boundaries: bool = False,
    keep_hits: bool = False,
    observation=None,
) -> DataFrame:
    """Drop rows containing ANY phrase. ``keep_hits`` leaves the
    matched-phrase column on the survivors (always empty then — it's
    for auditing the kept side of a routed split). ``observation``
    accumulates rows_in/rows_kept/rows_dropped on the caller's own
    action (the blocklist-counter convention: a filter silently eating
    40% of a crawl is an incident)."""
    tagged = phrase_hits(
        df,
        phrases,
        text_col=text_col,
        output_col="__ph",
        case_insensitive=case_insensitive,
        word_boundaries=word_boundaries,
    )
    if observation is not None:
        drop = (F.size("__ph") > 0).cast("long")
        tagged = tagged.observe(
            observation,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(drop).alias("rows_dropped"),
            (F.count(F.lit(1)) - F.sum(drop)).alias("rows_kept"),
        )
    kept = tagged.where(F.size("__ph") == 0)
    if keep_hits:
        return kept.withColumnRenamed("__ph", "phrase_hits")
    return kept.drop("__ph")
