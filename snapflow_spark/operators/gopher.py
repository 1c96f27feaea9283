"""Gopher quality rules (Rae et al. 2021, Appendix A) — the
published heuristic document-filter battery that MassiveText, and
after it RefinedWeb / Dolma / FineWeb, apply between URL hygiene and
model-based scoring. Completes the engine's quality-signal family:
heuristic score (functions/text.py), trained classifier
(operators/classifier.py), LM perplexity + DSIR (operators/
selection.py), trained lang-id (operators/langid.py) — and now the
named rule set reviewers actually cite, with every signal exposed per
document so thresholds stay auditable.

Two signal tiers, two plan shapes:

- PER-ROW RULES — word count bounds, mean word length, '#'/'...'
  symbol-to-word ratios, bullet-start and ellipsis-end line
  fractions, alphabetic-word fraction, required-stopword hits — are
  pure codegen string/array algebra: one projection, no shuffle, no
  python.
- REPETITION RULES — duplicate line/paragraph fractions (by count
  and by character mass) and top/duplicated word-n-gram character
  fractions for n = 2..10 — are PER-DOCUMENT statistics, so they need
  NO shuffle at all: each kind's unit array is ``array_sort``-ed and
  folded once with ``F.aggregate`` (duplicates are adjacent after the
  sort; the accumulator carries the current run and the four dup/top
  tallies), making the whole operator ONE map-only projection chain.
  Two alternatives were measured and rejected (sf0.1, warm min-of-3,
  same session): (a) exploding units into a groupBy(id, kind, unit)
  count — at 100 TB that shuffles ~11× the corpus's token bytes to
  compute numbers every row can compute locally (the explode→count
  shape is the right tool only for CROSS-document stats: line dedup,
  winnowing); (b) splitting the fold into many light zip_with/
  aggregate passes over shifted slices — 3.47 s vs 2.94 s for the
  single fold: ten interpreted lambda passes per kind cost more than
  one fold's per-element struct, so the one-fold form stands. Fold
  inputs are staged through named columns (winnowing's
  materialization lesson) so each unit array is built once, not once
  per reference.

Definitional choices (implementations differ; these are pinned here
and replayed verbatim by the DuckDB oracle): duplicate line/paragraph
fractions count occurrences BEYOND the first (what a dedup pass would
remove — (cnt-1)/total by count, (cnt-1)·len/total by chars);
duplicate-n-gram character fractions count ALL occurrences of any
duplicated gram (the de-facto convention in public reimplementations);
top-n-gram character fraction is max(cnt·len)/total gram chars.
N-grams join words with single spaces; docs with fewer than n words
contribute their whole text as one degenerate gram (never duplicated,
so the rule passes — matching ngram_expr's documented degradation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from snapflow_spark.functions.text import tokens_expr

__all__ = [
    "GOPHER_DEFAULTS",
    "gopher_quality_filter",
    "gopher_signals",
]

#: Rae et al. 2021 Appendix A1 thresholds, keyed by signal column.
GOPHER_DEFAULTS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_hash_word_ratio": 0.1,
    "max_ellipsis_word_ratio": 0.1,
    "max_bullet_line_frac": 0.90,
    "max_ellipsis_line_frac": 0.30,
    "min_alpha_word_frac": 0.80,
    "min_stop_hits": 2,
    "max_dup_line_frac": 0.30,
    "max_dup_para_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_dup_para_char_frac": 0.20,
    "max_top2_char_frac": 0.20,
    "max_top3_char_frac": 0.18,
    "max_top4_char_frac": 0.16,
    "max_dup5_char_frac": 0.15,
    "max_dup6_char_frac": 0.14,
    "max_dup7_char_frac": 0.13,
    "max_dup8_char_frac": 0.12,
    "max_dup9_char_frac": 0.11,
    "max_dup10_char_frac": 0.10,
}

#: The paper's required-stopword list ("must contain at least two").
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_TOP_NS = (2, 3, 4)
_DUP_NS = (5, 6, 7, 8, 9, 10)

#: Every signal gopher_signals emits, in the canonical order the
#: roster branch fingerprints them (and the DuckDB oracle replays).
SIGNAL_COLUMNS = (
    "n_words", "mean_word_len", "hash_word_ratio", "ellipsis_word_ratio",
    "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac", "stop_hits",
    "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
    "dup_para_char_frac",
    *(f"top{n}_char_frac" for n in _TOP_NS),
    *(f"dup{n}_char_frac" for n in _DUP_NS),
)

#: (signal, operator, threshold-key) triples defining the keep rule —
#: shared by gopher_pass_expr and the oracle SQL generator so the two
#: can never drift.
PASS_RULES = (
    ("n_words", ">=", "min_words"),
    ("n_words", "<=", "max_words"),
    ("mean_word_len", ">=", "min_mean_word_len"),
    ("mean_word_len", "<=", "max_mean_word_len"),
    ("hash_word_ratio", "<=", "max_hash_word_ratio"),
    ("ellipsis_word_ratio", "<=", "max_ellipsis_word_ratio"),
    ("bullet_line_frac", "<=", "max_bullet_line_frac"),
    ("ellipsis_line_frac", "<=", "max_ellipsis_line_frac"),
    ("alpha_word_frac", ">=", "min_alpha_word_frac"),
    ("stop_hits", ">=", "min_stop_hits"),
    ("dup_line_frac", "<=", "max_dup_line_frac"),
    ("dup_para_frac", "<=", "max_dup_para_frac"),
    ("dup_line_char_frac", "<=", "max_dup_line_char_frac"),
    ("dup_para_char_frac", "<=", "max_dup_para_char_frac"),
    *((f"top{n}_char_frac", "<=", f"max_top{n}_char_frac") for n in _TOP_NS),
    *((f"dup{n}_char_frac", "<=", f"max_dup{n}_char_frac") for n in _DUP_NS),
)


def _nz(x: Column) -> Column:
    """NULL-safe fraction: missing kind rows (doc had no units) and
    0-denominator divisions read as 0.0 — the rule then passes, and
    the word-count floor rejects genuinely empty docs."""
    return F.coalesce(x, F.lit(0.0))


def _L(x) -> Column:
    return x.cast("long") if isinstance(x, Column) else F.lit(x).cast("long")


def _rep_stats(arr: Column) -> Column:
    """struct(extra_units, extra_chars, dupall_chars, top_chars,
    total_chars) for one unit array of ``struct<h: long, l: long>``
    (unit hash + unit char length) — sort, then ONE F.aggregate fold
    (duplicates are adjacent after the sort; the accumulator carries
    the open run). All codegen, no shuffle: per-document repetition
    stats are row-local by definition.

    Units are HASHES, not strings (round 9): the stats only need
    equality (any total order makes equal units adjacent) and each
    unit's char length, so sorting 16-byte structs replaces sorting —
    and for n-grams even MATERIALIZING — the unit strings; xxhash64
    collisions within one document are the usual negligible tier
    (same convention as dedup_text's production tier, and the
    string-unit parity is pinned by test).

    extra_* = occurrences beyond the first of each duplicated unit;
    dupall_chars = chars of ALL occurrences of duplicated units;
    top_chars = max over distinct units of count·len (the definitions
    pinned in the module doc). An empty array yields all zeros."""
    s = F.array_sort(arr)
    zero = F.struct(
        _L(0).alias("prev_h"),
        _L(0).alias("prev_l"),
        _L(0).alias("run"),
        _L(0).alias("extra_u"),
        _L(0).alias("extra_c"),
        _L(0).alias("dupall_c"),
        _L(0).alias("top_c"),
        _L(0).alias("total_c"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = (acc["run"] > 0) & (x["h"] == acc["prev_h"])
        closing = (~same) & (acc["run"] > 1)
        run_chars = acc["run"] * acc["prev_l"]
        return F.struct(
            x["h"].alias("prev_h"),
            x["l"].cast("long").alias("prev_l"),
            F.when(same, acc["run"] + 1).otherwise(_L(1)).cast("long").alias("run"),
            (acc["extra_u"] + F.when(same, 1).otherwise(0)).cast("long").alias("extra_u"),
            (acc["extra_c"] + F.when(same, x["l"]).otherwise(0))
            .cast("long")
            .alias("extra_c"),
            (acc["dupall_c"] + F.when(closing, run_chars).otherwise(0))
            .cast("long")
            .alias("dupall_c"),
            F.greatest(
                acc["top_c"],
                F.when(~same, run_chars).otherwise(_L(0)).cast("long"),
            ).alias("top_c"),
            (acc["total_c"] + x["l"]).cast("long").alias("total_c"),
        )

    def finish(acc: Column) -> Column:
        run_chars = acc["run"] * acc["prev_l"]
        return F.struct(
            acc["extra_u"].alias("extra_units"),
            acc["extra_c"].alias("extra_chars"),
            (acc["dupall_c"] + F.when(acc["run"] > 1, run_chars).otherwise(0))
            .cast("long")
            .alias("dupall_chars"),
            F.greatest(acc["top_c"], run_chars.cast("long")).alias("top_chars"),
            acc["total_c"].alias("total_chars"),
        )

    return F.aggregate(s, zero, step, finish)


def _hl(x: Column) -> Column:
    """string unit -> struct(h, l)."""
    return F.struct(
        F.xxhash64(x).alias("h"), F.length(x).cast("long").alias("l")
    )


def _gram_hl_expr(word_hashes: Column, word_lens: Column, n: int) -> Column:
    """The struct<h,l> n-gram array WITHOUT materializing gram
    strings: hash = xxhash64-fold over the window's word hashes,
    len = sum of word lens + (n-1) joiner spaces. Built as zip_with
    folds over shifted slices — ngram_expr's one-pass shape on longs
    instead of strings. Degenerate case (fewer than n words) matches
    ngram_expr: ONE whole-text gram — only its LENGTH matters (a
    single unit is never duplicated; top/total read its chars), so
    its hash is pinned to the fold of all word hashes."""
    m = F.size(word_hashes) - (n - 1)
    h = F.slice(word_hashes, 1, F.greatest(m, F.lit(1)))
    ln = F.slice(word_lens, 1, F.greatest(m, F.lit(1)))
    for k in range(1, n):
        nh = F.slice(word_hashes, 1 + k, F.greatest(m, F.lit(1)))
        nl = F.slice(word_lens, 1 + k, F.greatest(m, F.lit(1)))
        h = F.zip_with(h, nh, lambda a, b: F.xxhash64(a, b))
        ln = F.zip_with(ln, nl, lambda a, b: a + b + 1)
    grams = F.zip_with(
        h, ln, lambda a, b: F.struct(a.alias("h"), b.cast("long").alias("l"))
    )
    # degenerate: one whole-text unit — len = sum(word lens) + gaps
    whole_len = (
        F.aggregate(word_lens, _L(0), lambda acc, x: acc + x)
        + F.greatest(F.size(word_lens) - 1, F.lit(0))
    ).cast("long")
    whole = F.array(
        F.struct(
            F.aggregate(
                word_hashes, _L(0), lambda acc, x: F.xxhash64(acc, x)
            ).alias("h"),
            whole_len.alias("l"),
        )
    )
    return F.when(m >= 1, grams).otherwise(whole)


def _stop_hits_expr(lw: Column, stopwords: tuple[str, ...]) -> Column:
    return sum(
        (F.array_contains(lw, sw.lower()).cast("int") for sw in stopwords),
        F.lit(0),
    )


def gopher_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] | None = None,
    stopwords_by_lang: dict[str, tuple[str, ...]] | None = None,
    lang_col: str = "lang",
) -> DataFrame:
    """Append every Gopher signal column to ``df`` (one row per input
    row): n_words, mean_word_len, hash_word_ratio,
    ellipsis_word_ratio, bullet_line_frac, ellipsis_line_frac,
    alpha_word_frac, stop_hits, dup_line_frac, dup_line_char_frac,
    dup_para_frac, dup_para_char_frac, top{2,3,4}_char_frac,
    dup{5..10}_char_frac. Plan: a staged map-only projection chain —
    per-row rules + one sorted ``F.aggregate`` fold per unit kind; no
    shuffle, no python (module doc). ``id_col`` is part of the stable
    API but unused here: nothing leaves the row.

    The required-stopword rule is the ONE language-coupled signal in
    the battery (the paper's list is English; on any other language it
    rejects everything). Retarget it with ``stopwords=`` (one list for
    the whole corpus) or ``stopwords_by_lang=`` (a dict keyed by the
    values of ``lang_col`` — e.g. ``core.lang_id``'s output — compiled
    to ONE codegen when-chain, so per-language routing costs no join,
    no shuffle, no python; rows whose language has no entry fall back
    to ``stopwords``/the paper list). Every other signal is
    script-agnostic as published (``\\p{L}`` alpha classes, character
    fractions)."""
    text = F.col(text_col)
    words = tokens_expr(text)
    lw = F.transform(words, F.lower)
    n_words = F.size(words)
    word_chars = F.length(F.regexp_replace(text, r"\s", ""))
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = (
        F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / F.lit(3)
    lines_all = F.split(text, r"\n")
    lines = F.filter(lines_all, lambda x: x.rlike(r"\S"))
    n_lines = F.size(lines)
    bullets = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•‣▪]")))
    ell_lines = F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$")))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike(r"\p{L}")))
    default_stops = tuple(stopwords) if stopwords else GOPHER_STOPWORDS
    stop_hits = _stop_hits_expr(lw, default_stops)
    if stopwords_by_lang:
        routed = None
        for lang in sorted(stopwords_by_lang):
            cnt = _stop_hits_expr(lw, tuple(stopwords_by_lang[lang]))
            cond = F.col(lang_col) == lang
            routed = (
                F.when(cond, cnt) if routed is None else routed.when(cond, cnt)
            )
        stop_hits = routed.otherwise(stop_hits)

    fl = "double"
    base = df.select(
        "*",
        words.alias("__w"),
        n_words.alias("n_words"),
        (word_chars / F.nullif(n_words, F.lit(0))).cast(fl).alias("mean_word_len"),
        (n_hash / F.nullif(n_words, F.lit(0))).cast(fl).alias("hash_word_ratio"),
        (n_ellipsis / F.nullif(n_words, F.lit(0)))
        .cast(fl)
        .alias("ellipsis_word_ratio"),
        (bullets / F.nullif(n_lines, F.lit(0))).cast(fl).alias("bullet_line_frac"),
        (ell_lines / F.nullif(n_lines, F.lit(0)))
        .cast(fl)
        .alias("ellipsis_line_frac"),
        (alpha_words / F.nullif(n_words, F.lit(0)))
        .cast(fl)
        .alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
    )

    # --- repetition tier: per-kind sorted folds, map-only ----------
    # NB: the trim must be wrapped in a lambda — F.trim's optional
    # second parameter makes F.transform pass (element, index), which
    # silently turns the index into the trim-character set
    trimmed_lines = F.filter(
        F.transform(lines_all, lambda x: F.trim(x)), lambda x: x != ""
    )
    paras = F.filter(
        F.transform(F.split(text, r"\n{2,}"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    # units are struct<h,l> hashes (round 9): per-word hash/len arrays
    # are built ONCE and every n-gram tier derives from them — no gram
    # strings are ever materialized (see _rep_stats / _gram_hl_expr)
    staged = base.select(
        "*",
        F.transform(F.col("__w"), lambda w: F.xxhash64(w)).alias("__wh"),
        F.transform(
            F.col("__w"), lambda w: F.length(w).cast("long")
        ).alias("__wl"),
    )
    # incremental gram-hash chain (round 10): tier n's hash/len arrays
    # extend tier n-1's with ONE zip_with against the n-shifted word
    # arrays (identical values to the from-scratch fold — zip_with is
    # elementwise, and tier n's prefix of tier n-1 is exactly its
    # base). The from-scratch form rebuilt each tier independently:
    # sum(n-1) = 45 zip passes for n=2..10 vs 9 here. Each tier is a
    # NAMED staged column so it evaluates once (the winnowing lesson).
    wh, wl = F.col("__wh"), F.col("__wl")
    gram_ns = sorted((*_TOP_NS, *_DUP_NS))
    chain = staged
    prev_h, prev_l = wh, wl
    for n in gram_ns:
        m = F.greatest(F.size(wh) - (n - 1), F.lit(1))
        h = F.zip_with(
            F.slice(prev_h, 1, m), F.slice(wh, n, m),
            lambda a, b: F.xxhash64(a, b),
        )
        ln = F.zip_with(
            F.slice(prev_l, 1, m), F.slice(wl, n, m), lambda a, b: a + b + 1
        )
        chain = chain.select(
            "*", h.alias(f"__gh{n}"), ln.alias(f"__gl{n}")
        )
        prev_h, prev_l = F.col(f"__gh{n}"), F.col(f"__gl{n}")

    def _gram_units(n: int) -> Column:
        """struct<h,l> array for tier n from the staged chain, with
        _gram_hl_expr's exact degenerate contract (fewer than n words
        -> ONE whole-text gram whose hash is the fold of all word
        hashes and whose length includes the joiner gaps)."""
        grams = F.zip_with(
            F.col(f"__gh{n}"),
            F.col(f"__gl{n}"),
            lambda a, b: F.struct(a.alias("h"), b.cast("long").alias("l")),
        )
        whole_len = (
            F.aggregate(wl, _L(0), lambda acc, x: acc + x)
            + F.greatest(F.size(wl) - 1, F.lit(0))
        ).cast("long")
        whole = F.array(
            F.struct(
                F.aggregate(
                    wh, _L(0), lambda acc, x: F.xxhash64(acc, x)
                ).alias("h"),
                whole_len.alias("l"),
            )
        )
        return F.when(F.size(wh) - (n - 1) >= 1, grams).otherwise(whole)

    kinds: dict[str, Column] = {
        "line": F.transform(trimmed_lines, _hl),
        "para": F.transform(paras, _hl),
    }
    for n in gram_ns:
        kinds[f"g{n}"] = _gram_units(n)
    with_units = chain.select(
        "*", *[arr.alias(f"__u_{k}") for k, arr in kinds.items()]
    )
    with_stats = with_units.select(
        "*",
        *[_rep_stats(F.col(f"__u_{k}")).alias(f"__r_{k}") for k in kinds],
    )

    def fr(k: str, num: Column, den: Column) -> Column:
        return _nz(num / F.nullif(den, F.lit(0)))

    r = {k: F.col(f"__r_{k}") for k in kinds}
    u = {k: F.col(f"__u_{k}") for k in kinds}
    frac_cols = [
        fr("line", r["line"]["extra_units"], F.size(u["line"]))
        .alias("dup_line_frac"),
        fr("line", r["line"]["extra_chars"], r["line"]["total_chars"])
        .alias("dup_line_char_frac"),
        fr("para", r["para"]["extra_units"], F.size(u["para"]))
        .alias("dup_para_frac"),
        fr("para", r["para"]["extra_chars"], r["para"]["total_chars"])
        .alias("dup_para_char_frac"),
    ]
    for n in _TOP_NS:
        g = f"g{n}"
        frac_cols.append(
            fr(g, r[g]["top_chars"], r[g]["total_chars"])
            .alias(f"top{n}_char_frac")
        )
    for n in _DUP_NS:
        g = f"g{n}"
        frac_cols.append(
            fr(g, r[g]["dupall_chars"], r[g]["total_chars"])
            .alias(f"dup{n}_char_frac")
        )
    out = with_stats.select("*", *frac_cols)
    return out.drop(
        "__w", "__wh", "__wl",
        *[f"__u_{k}" for k in kinds],
        *[f"__r_{k}" for k in kinds],
    )


def gopher_pass_expr(thresholds: dict[str, float] | None = None) -> Column:
    """Boolean over gopher_signals' columns: the paper's full keep
    rule with per-threshold overrides (pass only the keys to change).
    NULL signals (empty doc) fail the word-count floor as expected."""
    t = {**GOPHER_DEFAULTS, **(thresholds or {})}
    unknown = set(t) - set(GOPHER_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown gopher thresholds: {sorted(unknown)}")
    cond = F.lit(True)
    for col_name, op, key in PASS_RULES:
        c = F.col(col_name)
        cond = cond & (c >= t[key] if op == ">=" else c <= t[key])
    return F.coalesce(cond, F.lit(False))


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict[str, float] | None = None,
    keep_signals: bool = False,
    stopwords: tuple[str, ...] | None = None,
    stopwords_by_lang: dict[str, tuple[str, ...]] | None = None,
    lang_col: str = "lang",
) -> DataFrame:
    """Apply the full Gopher battery: compute signals, keep passing
    rows. ``keep_signals`` leaves the signal columns on the output for
    auditing (default drops them, returning the input shape).
    ``stopwords`` / ``stopwords_by_lang`` retarget the one
    language-coupled rule for non-English corpora (gopher_signals)."""
    sig = gopher_signals(
        df,
        text_col=text_col,
        id_col=id_col,
        stopwords=stopwords,
        stopwords_by_lang=stopwords_by_lang,
        lang_col=lang_col,
    )
    kept = sig.where(gopher_pass_expr(thresholds))
    if keep_signals:
        return kept
    return kept.select(*df.columns)
