"""Dataset mixing — combine corpora to target weights under a token
budget (the Pile/Dolma/LLaMA recipe step that turns cleaned corpora
into a training mix).

Given sources with mixing weights and a total token budget, each
source must contribute ``weight/Σweights × budget`` tokens. Sources
with more tokens than their target are DOWN-sampled; sources with
fewer are UP-sampled by whole epochs plus a fractional epoch (the
standard repeat-factor scheme — e.g. Wikipedia at 3.3 epochs in
GPT-3's table). Both directions use the engine's deterministic
sha256 predicate (operators/curation.py conventions): selection is a
pure function of (salt, epoch, id), so the mix is bit-stable across
engines, repartitions and reruns — never ``rand()``.

Scale shape: ONE metadata aggregate per source (its token total — a
1-row agg, the only driver-side scalars), then a map-only filter per
epoch and a unionByName. No shuffles at all beyond what the caller
already has; the union is plan-level. Epoch copies are lazy plan
branches over the same scan — Spark reads the source once per
surviving epoch filter, which is the honest cost of an N-epoch
repeat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: sha256-derived uniform in [0,1) — the same construction
#: split_by_hash/stratified_sample_by_hash use (curation.py): first
#: 15 hex nibbles = 60 bits, exact in a double.
def _unit_hash(id_col: str, salt: str, epoch: int) -> F.Column:
    h = F.sha2(
        F.concat_ws("|", F.lit(salt), F.lit(str(epoch)), F.col(id_col).cast("string")),
        256,
    )
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / float(1 << 60)


def mix_corpora(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    token_budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    max_epochs: int = 20,
    totals: dict[str, float] | None = None,
) -> DataFrame:
    """Weighted token-budget mix of named corpora.

    Returns the union of all selected documents with two added
    columns: ``mix_source`` (the source name) and ``epoch`` (0-based
    repeat index — 0 for down-sampled sources; up-sampled sources
    carry complete epochs 0..k-1 plus a hash-sampled fractional epoch
    k). Document selection within a fractional epoch is the sha256
    unit-interval predicate keyed by (salt, epoch, id) — deterministic
    and unbiased, with achieved token mass concentrating on the
    target by the law of large numbers (exact-subset-sum selection is
    NP-hard and order-dependent; nobody runs it at corpus scale).

    Raises when a source would need more than ``max_epochs`` repeats
    — that is a recipe error (a tiny corpus given a huge weight), not
    something to paper over silently.

    ``totals`` (optional): precomputed per-source token totals. The
    default runs one 1-row aggregate PER SOURCE; a caller that
    already aggregated them (e.g. one groupBy over a tagged union of
    its sources) passes the dict and the mix plans with ZERO extra
    jobs. Token sums are integers, so a caller-computed total is
    exactly what the internal aggregate would produce.

    AT SCALE, MIX METADATA — NOT RAW TEXT (round 9): each surviving
    epoch is a lazy plan branch over the same source, so an N-epoch
    repeat re-scans its source ~N times. That is fine over a
    materialized ``(id, n_tokens)`` table (integers; MBs per billion
    docs) and ruinous over 100 TB of raw text with the token count
    computed inline — the tokenizer re-runs per epoch. Checkpoint
    token counts upstream (one pass), mix the metadata, then join the
    selection back to text ONCE; selection is a pure function of
    (salt, epoch, id) + totals, so the metadata mix picks bit-for-bit
    the same documents (pinned by test, measured in SCALE.md).
    """
    missing = set(sources) ^ set(weights)
    if missing:
        raise ValueError(f"sources and weights disagree on: {sorted(missing)}")
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    bad_w = {k: v for k, v in weights.items() if float(v) < 0}
    if bad_w:
        raise ValueError(f"negative mixing weights: {bad_w}")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive number")

    parts: list[DataFrame] = []
    for name, df in sources.items():
        target = token_budget * float(weights[name]) / total_w
        if totals is not None and name in totals:
            have = float(totals[name])
        else:
            # the ONE driver scalar per source: its token total
            row = df.agg(F.sum(F.col(token_col).cast("double")).alias("t")).first()
            have = float(row.t or 0.0)
        if have <= 0:
            raise ValueError(f"source {name!r} has no tokens in {token_col!r}")
        ratio = target / have
        if ratio > max_epochs:
            raise ValueError(
                f"source {name!r} needs {ratio:.1f} epochs to meet its "
                f"weight (cap {max_epochs}) — the recipe oversamples a "
                "tiny corpus; lower its weight or raise max_epochs"
            )
        full_epochs = int(ratio)  # complete copies
        frac = ratio - full_epochs
        tagged = df.withColumn("mix_source", F.lit(name))
        for e in range(full_epochs):
            parts.append(tagged.withColumn("epoch", F.lit(e)))
        if frac > 0:
            parts.append(
                tagged.where(_unit_hash(id_col, salt, full_epochs) < frac)
                .withColumn("epoch", F.lit(full_epochs))
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mix_report(mixed: DataFrame, token_col: str = "n_tokens") -> DataFrame:
    """Achieved composition of a mix: per source, documents, tokens,
    epochs used, and token share — the audit table a recipe review
    reads next to its target weights. One groupBy."""
    per = mixed.groupBy("mix_source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("tokens"),
        (F.max("epoch") + 1).alias("epochs"),
    )
    total = F.sum("tokens").over(Window.partitionBy())
    return per.select(
        "mix_source",
        "n_docs",
        "tokens",
        "epochs",
        F.round(F.col("tokens") / total, 4).alias("token_share"),
    )


def temperature_weights(
    totals: dict[str, float], alpha: float = 0.3
) -> dict[str, float]:
    """Exponentially-smoothed sampling weights over group token
    totals — the multilingual rebalancing rule (Lample & Conneau
    2019 §3.1, "Cross-lingual Language Model Pretraining"; mBERT and
    every multilingual run since): with natural shares
    p_g = total_g / Σ totals, sample group g with probability
    q_g ∝ p_g^alpha. ``alpha=1`` preserves the natural distribution,
    ``alpha=0`` is uniform across groups (maximum upweighting of
    low-resource groups), the paper's 0.3 sits between. Pure driver
    arithmetic over the 1-row-per-group totals.

    BIT-STABLE (round 11): every float fold (grand, the q
    normalizer, the returned dict's order) runs over groups sorted
    by name — a dict in collect() order would make the sums depend
    on task scheduling through float addition order, and the
    downstream epoch/fraction selection must be replayable
    digit-for-digit (q_pipeline_docs 'langmix' oracle)."""
    if not totals:
        raise ValueError("temperature_weights needs at least one group")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    items = sorted(totals.items(), key=lambda kv: str(kv[0]))
    grand = float(sum(v for _, v in items))
    if grand <= 0:
        raise ValueError("group token totals must be positive")
    q = {g: (v / grand) ** alpha for g, v in items}
    z = sum(q.values())
    return {g: v / z for g, v in q.items()}


def language_balanced_mix(
    df: DataFrame,
    token_budget: int,
    alpha: float = 0.3,
    lang_col: str = "lang",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "langmix-v1",
    max_epochs: int = 20,
    totals: dict[str, float] | None = None,
) -> DataFrame:
    """Temperature-balanced multilingual mix: ONE groupBy computes
    per-language token totals, ``temperature_weights`` turns them
    into p^alpha sampling weights, and ``mix_corpora`` does the
    deterministic epoch/fractional selection — low-resource languages
    up-sample by whole epochs, dominant ones down-sample, bit-stable
    across engines and repartitions. The totals pass through
    ``totals=`` so planning adds ZERO extra jobs beyond that one
    aggregate. Same metadata-not-text guidance as mix_corpora: at
    100 TB run this over a materialized (id, lang, n_tokens) table
    and join text back once.

    Rows with a NULL language are EXCLUDED before totals: a NULL
    group would claim budget share in the weights while the per-group
    equality filter could never select its rows, silently
    under-delivering the token budget. Route unidentified docs
    through ``core.lang_id`` (or an 'und' bucket) first if they
    should participate.

    ``totals`` (optional, round 17): precomputed per-language token
    totals — the same convention as ``mix_corpora``'s. A caller that
    already aggregated them (e.g. one groupBy serving several mixing
    branches) passes the dict and this plans with ZERO extra jobs;
    token sums are integers, so a caller total is exactly what the
    internal aggregate would produce. NULL-language keys must already
    be excluded (this function never selects their rows)."""
    df = df.where(F.col(lang_col).isNotNull())
    if totals is None:
        rows = (
            df.groupBy(lang_col).agg(F.sum(token_col).alias("__t")).collect()
        )
        totals = {
            r[lang_col]: float(r["__t"] or 0)
            for r in sorted(rows, key=lambda r: r[lang_col])
        }
    else:
        totals = {
            g: float(v)
            for g, v in sorted(totals.items(), key=lambda kv: str(kv[0]))
        }
    # sorted above: collect()/dict order varies, and the weight folds
    # downstream must be bit-stable (temperature_weights)
    totals = {g: v for g, v in totals.items() if v > 0}
    weights = temperature_weights(totals, alpha)
    sources = {
        g: df.where(F.col(lang_col) == g) for g in totals
    }
    return mix_corpora(
        sources,
        weights,
        token_budget,
        token_col=token_col,
        id_col=id_col,
        salt=salt,
        max_epochs=max_epochs,
        totals=totals,
    )
