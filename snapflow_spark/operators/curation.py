"""Training-corpus curation operators (SURVEY.md §2.B.11 north-star:
the ops a large-scale LLM-data pipeline runs between dedup and
tokenizer hand-off): deterministic train/test splitting, stratified
sampling, sequence packing, and train/eval contamination detection.

All four are pure DataFrame algebra (whole-stage codegen, no UDF) and
deterministic: splits and samples key off sha256 of the document id —
never rand() — so a re-run, a backfill, or a second engine (the DuckDB
oracle) assigns every document identically. That determinism is not a
testing convenience: reproducible splits are a correctness requirement
for training pipelines (eval contamination via split drift is a real
failure mode).

Scale notes per op are in the docstrings; the common theme is that
nothing here shuffles more than once, and the only window runs inside
a user-chosen partition key (global total order is not a thing at
100 TB — packing is per-shard by construction, as in real pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# split/sample hashing resolution: sha256 -> first 8 hex chars -> int
# mod _BUCKETS gives ~uniform buckets with 0.01% granularity
_BUCKETS = 10_000


def _hash_bucket(key: Column, salt: str, buckets: int = _BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from sha256(salt || key).
    The 32-bit hex prefix parse (conv base 16) is exactly what the SQL
    oracle replays; no engine-private hash, no RNG."""
    h = F.sha2(F.concat(F.lit(salt), key.cast("string")), 256)
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def split_by_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    test_frac: float = 0.1,
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/test assignment: a document lands in 'test'
    iff its hash bucket falls below test_frac. Changing the salt
    re-rolls the split; changing nothing re-derives it bit-identically
    on any engine or any day — the property a training pipeline needs
    to keep eval sets stable across backfills.

    Scale: a pure projection — no shuffle, no state; composes with
    any downstream agg/write."""
    thresh = int(round(test_frac * _BUCKETS))
    return df.withColumn(
        out_col,
        F.when(_hash_bucket(F.col(id_col), salt) < thresh, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_sample_by_hash(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    default_frac: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep a document iff its hash
    bucket falls below its stratum's fraction. Unlike df.sampleBy
    (seeded Bernoulli over partition iteration order — not stable
    across repartitions), the hash form is a pure row-wise predicate:
    same rows survive regardless of partitioning, cluster size, or
    engine. Up-weighting / re-balancing corpora by language or source
    is the canonical use.

    Scale: filter-only — pushes down past column pruning, no shuffle."""
    # Thresholds are computed driver-side with the SAME expression
    # split_by_hash uses (int(round(f * _BUCKETS))) — a SQL-side
    # `(frac * _BUCKETS).cast("long")` truncates, so 0.35 (not exactly
    # representable in binary) would give 3499 here but 3500 in
    # split_by_hash; one rule for both keeps oracle replays honest.
    thresh = None
    for stratum, f in fractions.items():
        cond = F.col(strata_col) == stratum
        t = F.lit(int(round(f * _BUCKETS)))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    default_t = F.lit(int(round(default_frac * _BUCKETS)))
    thresh = thresh.otherwise(default_t) if thresh is not None else default_t
    return df.where(_hash_bucket(F.col(id_col), salt) < thresh)


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partition_col: str | None = None,
    out_prefix: str = "chunk",
) -> DataFrame:
    """Sequence packing, concat-and-chunk form: documents are laid out
    in id order (within ``partition_col`` if given), token counts
    accumulate, and the training context a document STARTS in is
    floor(start_offset / budget) — exactly the layout a pretraining
    loader produces when it concatenates documents and cuts fixed-size
    contexts. Adds:
      {out_prefix}_start  — the document's global token start offset
      {out_prefix}_id     — the context index it starts in
      {out_prefix}_spans  — True when the document crosses a context
                            boundary (gets split across contexts)

    Scale: ONE window. With partition_col the cumsum runs per shard
    (lang / source / date — how real pipelines pack, since a global
    total order over 100 TB is neither feasible nor wanted); without
    it Spark warns and runs single-task — acceptable only for tests.
    """
    part = [partition_col] if partition_col else []
    w = Window.partitionBy(*part).orderBy(F.col(id_col))
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long")
    out = df.withColumn(f"{out_prefix}_start", start)
    end_incl = F.col(f"{out_prefix}_start") + F.col(token_col) - 1
    return out.withColumn(
        f"{out_prefix}_id", F.floor(F.col(f"{out_prefix}_start") / budget)
    ).withColumn(
        f"{out_prefix}_spans",
        (F.col(token_col) > 0)
        & (F.floor(end_incl / budget) > F.col(f"{out_prefix}_id")),
    )


def chunk_text(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping fixed-size TOKEN windows —
    the long-document splitter every context-bounded consumer needs
    (pretraining loaders cut at max sequence length; retrieval
    pipelines embed overlapping passages). One row per window:
    ``chunk_idx`` (0-based), ``chunk_text`` (the window's tokens
    re-joined with single spaces), ``chunk_n_tokens``, plus
    ``chunk_start`` (0-based token offset) for provenance.

    Windows step by ``max_tokens - overlap``; the last window may be
    shorter, and a document is never split into a window that adds no
    NEW tokens (a 600-token doc at 512/64 yields exactly 2 windows).
    Token-less documents keep ONE empty window so no document silently
    disappears from a keyed pipeline.

    Pure codegen — tokenize, ``sequence`` over window starts,
    ``posexplode``, ``slice``, ``array_join`` — map-only except the
    explode's row growth, which IS the output (~n_tokens/step rows per
    doc). Windows are whitespace-token sequences: re-joining
    normalizes intra-window whitespace; consumers needing byte-exact
    source spans should slice by ``chunk_start`` against their own
    offsets. Count windows against a TRAINED tokenizer budget by
    encoding ``chunk_text`` downstream — whitespace tokens
    over-estimate nothing (every trained tokenizer splits at least at
    whitespace, so a window's trained-token count >= its whitespace
    count only through subword growth, which the caller's budget
    margin owns)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    step = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.when(F.trim(F.col(text_col)) == "", F.array()).otherwise(toks)
    n = F.size(toks)
    # windows start at 0, step, 2*step, ... while start < n (always at
    # least one window, even for empty docs)
    n_windows = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(step)), F.lit(1)
    ).cast("int")
    staged = df.select(
        "*", toks.alias("__ct_toks"), n_windows.alias("__ct_nw")
    )
    starts = F.transform(
        F.sequence(F.lit(0), F.col("__ct_nw") - 1),
        lambda i: i * step,
    )
    out = staged.select(
        "*", F.posexplode(starts).alias("chunk_idx", "chunk_start")
    )
    window = F.slice(
        F.col("__ct_toks"), F.col("chunk_start") + 1, max_tokens
    )
    return out.select(
        *[c for c in df.columns if c != text_col],
        "chunk_idx",
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.array_join(window, " ").alias("chunk_text"),
        F.size(window).cast("long").alias("chunk_n_tokens"),
    )


def pack_sequences_bfd(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partition_col: str | None = None,
    out_prefix: str = "chunk",
) -> DataFrame:
    """Sequence packing, WHOLE-document bin form: assign each document
    to a training context (bin) of at most ``budget`` tokens without
    ever splitting a document — the other packing regime next to
    ``pack_sequences``' concat-and-chunk (chunking has zero padding
    but splits documents across context boundaries; bin packing keeps
    documents intact and the objective becomes MINIMIZING PADDING
    WASTE). Uses first-fit-decreasing — the classic 11/9·OPT + 6/9
    guarantee (Johnson 1973 / Dósa 2007, public results) — with a
    max-segment-tree over bin residuals, so per-shard packing is
    O(n log n), not the naive O(n²) first-fit scan.

    Deterministic: docs are packed in (token_col desc, id asc) order;
    same input -> same bins under any upstream partitioning. Documents
    LARGER than the budget get a bin of their own and
    ``{out_prefix}_oversize`` = True (caller decides: truncate, split
    via pack_sequences, or drop).

    Scale: grouped ``applyInPandas`` per ``partition_col`` shard
    (lang / source / date — real pipelines pack within shards; a
    global bin-pack over 100 TB is neither feasible nor wanted, same
    contract as ``pack_sequences``); bin ids are per-shard. Without
    ``partition_col`` everything is one group — acceptable only for
    tests. Adds ``{out_prefix}_bin`` (long) and
    ``{out_prefix}_oversize`` (boolean)."""
    import pandas as pd

    bcol, ocol = f"{out_prefix}_bin", f"{out_prefix}_oversize"
    cap = int(budget)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # the no-partition_col path groups on a synthetic __g tag (a
        # bare groupBy(lit(1)) resolves as a GROUP BY ordinal)
        pdf = pdf.drop(columns=["__g"], errors="ignore")
        order = pdf.sort_values(
            [token_col, id_col], ascending=[False, True]
        ).index
        sizes = pdf[token_col].to_numpy()
        n = len(pdf)
        # segment tree over bin residuals: tree[1] is the max; leaf i
        # holds bin i's remaining capacity (0 while unopened — an
        # unopened leaf can't win a "first bin with residual >= s"
        # descent because s >= 1)
        size_pow = 1
        while size_pow < max(n, 1):
            size_pow *= 2
        tree = [0] * (2 * size_pow)

        def update(i: int, val: int) -> None:
            i += size_pow
            tree[i] = val
            i //= 2
            while i:
                tree[i] = max(tree[2 * i], tree[2 * i + 1])
                i //= 2

        def first_fit(s: int) -> int:
            if tree[1] < s:
                return -1
            i = 1
            while i < size_pow:  # descend left-first: FIRST fitting bin
                i = 2 * i if tree[2 * i] >= s else 2 * i + 1
            return i - size_pow

        n_bins = 0
        bins = pd.Series(0, index=pdf.index, dtype="int64")
        oversize = pd.Series(False, index=pdf.index, dtype="bool")
        for idx in order:
            s = int(sizes[pdf.index.get_loc(idx)])
            if s > cap:
                bins[idx] = n_bins
                oversize[idx] = True
                n_bins += 1  # own bin, residual stays 0 (closed)
                continue
            b = first_fit(max(s, 1))
            if b < 0 or b >= n_bins:
                b = n_bins
                n_bins += 1
                update(b, cap - s)
            else:
                update(b, tree[b + size_pow] - s)
            bins[idx] = b
        out = pdf.copy()
        out[bcol] = bins
        out[ocol] = oversize
        return out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema += f", `{bcol}` long, `{ocol}` boolean"
    if partition_col:
        groups = df.groupBy(partition_col)
    else:
        groups = df.withColumn("__g", F.lit(1)).groupBy("__g")
    return groups.applyInPandas(pack, schema)


def contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_overlap: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Train/eval contamination detection: (train_id, eval_id,
    n_shared) for every train document sharing >= min_overlap distinct
    token n-grams with an eval document. Long n-grams (n=8 default)
    are the standard benchmark-leak signal (a shared 8-gram is
    essentially verbatim overlap, not chance).

    Scale shape: both sides explode to (gram, id) pairs, distinct per
    doc; the eval side — benchmarks are tiny relative to a 100 TB
    corpus — is broadcast so the gram join is map-side with NO shuffle
    of the train grams; the count-by-pair agg then shuffles only the
    matching pairs (rare). Set broadcast_eval=False to fall back to a
    hash join on the gram when the eval side is genuinely large."""
    from snapflow_spark.functions.text import ngram_expr, tokens_expr

    def _grams(d: DataFrame, out_id: str) -> DataFrame:
        return d.select(
            F.col(id_col).alias(out_id),
            F.explode(
                F.array_distinct(ngram_expr(tokens_expr(text_col), n))
            ).alias("gram"),
        )

    tg = _grams(train, "train_id")
    eg = _grams(eval_df, "eval_id")
    if broadcast_eval:
        eg = F.broadcast(eg)
    return (
        tg.join(eg, "gram")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_overlap)
    )


def cap_per_domain(
    df: DataFrame,
    cap: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap-v1",
    observation=None,
) -> DataFrame:
    """Per-domain document cap — the anti-domination sampler every web
    corpus runs (one crawl-happy domain must not become 30% of the
    training mix): keep at most ``cap`` documents per domain,
    deterministically. Selection order within a domain is the sha256
    of (salt || id) — a stable shuffle, so the kept subset is an
    unbiased sample that any engine re-derives bit-identically (a
    row_number over arrival order would keep whatever happened to be
    crawled first; rand() would keep different docs every run).

    Scale shape: ONE window shuffle partitioned by domain. A mega
    domain sorts its partition (that is what per-domain selection
    means), but the sort key is a fixed 64-hex digest and the output
    cuts to ``cap`` rows; for caps ≪ domain size a cheaper two-phase
    variant (hash-bucket pre-filter to ~2·cap, then the window) drops
    the sorted volume — same result, worth it only when domains run to
    billions of rows.

    ``observation`` (``pyspark.sql.Observation``): the cap drops rows
    BY DESIGN; in production that loss must be measurable. When given,
    counters accumulate during the caller's own action (zero extra
    scans): ``rows_in``, ``rows_kept``, ``rows_dropped``, and
    ``capped_domains`` (domains that actually hit the cap — counted
    exactly as rows with rank cap+1, which exists once per such
    domain). Read ``observation.get`` AFTER the first action."""
    order = F.sha2(F.concat(F.lit(salt), F.col(id_col).cast("string")), 256)
    w = Window.partitionBy(domain_col).orderBy(order.asc(), F.col(id_col).asc())
    ranked = df.withColumn("__cap_rn", F.row_number().over(w))
    if observation is not None:
        rn = F.col("__cap_rn")
        ranked = ranked.observe(
            observation,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum((rn <= cap).cast("long")).alias("rows_kept"),
            F.sum((rn > cap).cast("long")).alias("rows_dropped"),
            F.sum((rn == cap + 1).cast("long")).alias("capped_domains"),
        )
    return ranked.where(F.col("__cap_rn") <= cap).drop("__cap_rn")


def deterministic_shuffle(
    df: DataFrame,
    salt: str = "shuffle-v1",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Deterministic global pseudo-random ORDER for training output —
    the step between packing/mixing and writing shards: sequence
    models need documents well-mixed across sources, and the order
    must be reproducible (resume a run, re-emit a shard, compare two
    engines) — so never ``rand()`` and never orderBy(rand()).

    The sort key is sha256(salt || id) — uniformly distributed and a
    pure function of (salt, id), so the TOTAL order is bit-stable
    across repartitions, reruns, and engines (the split/sample/cap
    convention of this module; a different salt — e.g. one per epoch
    — yields an independent order). ``repartitionByRange`` over the
    key + ``sortWithinPartitions`` gives globally ordered output
    partitions (partition i entirely precedes i+1), which is exactly
    the property shard writers need: ONE range-shuffle, no global
    single-task sort. ``key_col`` keeps the hex key on the output
    (resume bookkeeping / verification); otherwise it is dropped.

    At 100 TB: the range partitioner samples the key distribution —
    sha256 keys are uniform, so ranges balance without skew handling;
    output size per partition is governed by ``num_partitions``
    (default: spark.sql.shuffle.partitions)."""
    key = F.sha2(
        F.concat(F.lit(salt), F.col(id_col).cast("string")), 256
    ).alias("__shuffle_key")
    keyed = df.select("*", key)
    n = int(num_partitions) if num_partitions else None
    parts = (
        keyed.repartitionByRange(n, "__shuffle_key")
        if n
        else keyed.repartitionByRange("__shuffle_key")
    )
    out = parts.sortWithinPartitions("__shuffle_key")
    if key_col is not None:
        return out.withColumnRenamed("__shuffle_key", key_col)
    return out.drop("__shuffle_key")
