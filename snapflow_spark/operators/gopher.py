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
  fractions for n = 2..10 — need per-document unit counts. Shape:
  ONE explode of all units (lines, paragraphs, and every n-gram
  size, each tagged with its kind) → ONE groupBy(id, kind, unit)
  count → ONE groupBy(id, kind) aggregate → conditional-aggregation
  pivot back to a row per document → broadcast-free equi-join with
  the per-row tier. Cost is O(total units) ≈ (2 + Σn) × words with
  two keyed shuffles regardless of how many rules are on — the same
  explode→count shape as the line-dedup/winnowing family, AQE-skew
  safe, no driver participation.

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

from snapflow_spark.functions.text import ngram_expr, tokens_expr

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


def gopher_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Append every Gopher signal column to ``df`` (one row per input
    row): n_words, mean_word_len, hash_word_ratio,
    ellipsis_word_ratio, bullet_line_frac, ellipsis_line_frac,
    alpha_word_frac, stop_hits, dup_line_frac, dup_line_char_frac,
    dup_para_frac, dup_para_char_frac, top{2,3,4}_char_frac,
    dup{5..10}_char_frac. Plan: one codegen projection + one
    explode/count/agg chain joined back on ``id_col`` (module doc)."""
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
    stop_hits = sum(
        (F.array_contains(lw, sw).cast("int") for sw in GOPHER_STOPWORDS),
        F.lit(0),
    )

    fl = "double"
    base = df.select(
        "*",
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

    # --- repetition tier: one explode over tagged units ------------
    trimmed_lines = F.filter(
        F.transform(lines_all, F.trim), lambda x: x != ""
    )
    paras = F.filter(
        F.transform(F.split(text, r"\n{2,}"), F.trim), lambda x: x != ""
    )

    def tag(kind: str, arr: Column) -> Column:
        return F.transform(
            arr, lambda u: F.struct(F.lit(kind).alias("kind"), u.alias("unit"))
        )

    unit_arrays = [tag("line", trimmed_lines), tag("para", paras)]
    for n in (*_TOP_NS, *_DUP_NS):
        unit_arrays.append(tag(f"g{n}", ngram_expr(words, n)))
    units = df.select(
        F.col(id_col).alias("__gid"),
        F.explode(F.flatten(F.array(*unit_arrays))).alias("__u"),
    ).select("__gid", F.col("__u.kind").alias("__kind"), F.col("__u.unit").alias("__unit"))

    counts = units.groupBy("__gid", "__kind", "__unit").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ulen = F.length("__unit")
    per_kind = counts.groupBy("__gid", "__kind").agg(
        F.sum("cnt").alias("total_units"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0)).alias(
            "extra_units"
        ),
        F.sum(F.col("cnt") * ulen).alias("total_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, (F.col("cnt") - 1) * ulen).otherwise(0)
        ).alias("extra_chars"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * ulen).otherwise(0)).alias(
            "dupall_chars"
        ),
        F.max(F.col("cnt") * ulen).alias("top_chars"),
    )

    def k(kind: str, metric: str) -> Column:
        return F.max(F.when(F.col("__kind") == kind, F.col(metric)))

    rep_cols = [
        (k("line", "extra_units") / F.nullif(k("line", "total_units"), F.lit(0)))
        .alias("dup_line_frac"),
        (k("line", "extra_chars") / F.nullif(k("line", "total_chars"), F.lit(0)))
        .alias("dup_line_char_frac"),
        (k("para", "extra_units") / F.nullif(k("para", "total_units"), F.lit(0)))
        .alias("dup_para_frac"),
        (k("para", "extra_chars") / F.nullif(k("para", "total_chars"), F.lit(0)))
        .alias("dup_para_char_frac"),
    ]
    for n in _TOP_NS:
        rep_cols.append(
            (k(f"g{n}", "top_chars") / F.nullif(k(f"g{n}", "total_chars"), F.lit(0)))
            .alias(f"top{n}_char_frac")
        )
    for n in _DUP_NS:
        rep_cols.append(
            (
                k(f"g{n}", "dupall_chars")
                / F.nullif(k(f"g{n}", "total_chars"), F.lit(0))
            ).alias(f"dup{n}_char_frac")
        )
    rep = per_kind.groupBy("__gid").agg(*rep_cols)

    out = base.join(rep, base[id_col] == rep["__gid"], "left").drop("__gid")
    # NULL-safe all fraction columns (docs with no lines/paras/grams)
    fixes = {
        c: _nz(F.col(c))
        for c in (
            "dup_line_frac", "dup_line_char_frac",
            "dup_para_frac", "dup_para_char_frac",
            *(f"top{n}_char_frac" for n in _TOP_NS),
            *(f"dup{n}_char_frac" for n in _DUP_NS),
        )
    }
    return out.withColumns(fixes)


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
) -> DataFrame:
    """Apply the full Gopher battery: compute signals, keep passing
    rows. ``keep_signals`` leaves the signal columns on the output for
    auditing (default drops them, returning the input shape)."""
    sig = gopher_signals(df, text_col=text_col, id_col=id_col)
    kept = sig.where(gopher_pass_expr(thresholds))
    if keep_signals:
        return kept
    return kept.select(*df.columns)
