"""The live web-ingest gate — the brief's end-to-end curation
pipeline as ONE composition that runs identically on a batch
DataFrame and a Structured Streaming source:

    WARC responses → HTTP split → byte-sniff router → HTML main-text
    extraction → language ID → Gopher rule battery → trained-KN
    perplexity gate → embedding → (caller) IVF-PQ ``append_to_saved``

Every stage is map-only (codegen expressions or Arrow-batched pandas
UDFs; the KN gate uses ``score(attach=True)``, a broadcast-model
column attach, and the embed stage is a scalar UDF) — so the SAME
function body compiles to a valid append-mode streaming plan with no
watermarks, no stateful operators, and batch == stream row-for-row
(pinned in tests/test_streaming.py).  The CCNet threshold is a FIXED
``ppl_max`` here, not a corpus quantile: on a live stream there is no
"whole corpus" to take terciles over — the deployment recipe is to
compute thresholds once on a reference slice (``perplexity_buckets``
on yesterday's batch) and gate the stream on those frozen numbers.

The index append is deliberately NOT inside this function: writing is
the sink's job.  Stream form::

    curated = web_ingest_gate(stream_df, lm=lm, ppl_max=t, ...)
    curated.writeStream.foreachBatch(
        lambda b, _id: IVFPQIndex.append_to_saved(
            b.sparkSession, index_path, b.select("doc_id", "embedding"),
            id_col="doc_id")
    ).start()

which is exactly the standing-index delta-ingest shape SCALE.md's
``op_ivfpq_append`` row measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["web_ingest_gate"]


def web_ingest_gate(
    records: DataFrame,
    *,
    langs: tuple[str, ...] | None = ("en",),
    gopher_thresholds: dict | bool | None = None,
    lm=None,
    ppl_max: float | None = None,
    embed_model=None,
    embed_dim: int | None = None,
    embed_batch_size: int = 1024,
    min_status: int = 200,
    max_status: int = 299,
) -> DataFrame:
    """Curate raw WARC ``response`` records into embedded, gated
    documents.  ``records`` is the ``read_warc`` schema (batch) or
    the ``readStream.format("warc")`` stream — same column contract,
    same plan shape.

    Stages (each optional knob independently disables its gate):
    HTTP split + 2xx filter → byte-sniffed ``html`` rows only →
    ``extract_main_text`` boilerplate removal → ``lang_id_expr``
    filter to ``langs`` (``None`` or an EMPTY sequence disables —
    keep-all, the YAML ``langs: []`` contract) → Gopher pass
    filter (``gopher_thresholds`` dict overrides thresholds;
    ``False`` disables the gate) → KN perplexity gate (``lm`` + ``ppl_max``; scores
    attach map-only so the gate composes on streams) → embedding
    (``embed_model`` import path/callable, else the hashed lexical
    default with ``embed_dim`` or 64).

    Output: ``doc_id`` (the WARC record id), ``url``, ``lang``,
    ``text``, ``n_tokens``, ``ppl`` (when gated), ``embedding``."""
    from snapflow_spark.functions.html import main_text_from_bytes
    from snapflow_spark.functions.sniff import sniff_format_expr
    from snapflow_spark.functions.text import lang_id_expr, token_count_expr
    from snapflow_spark.operators.gopher import (
        SIGNAL_COLUMNS,
        gopher_pass_expr,
        gopher_signals,
    )
    from snapflow_spark.sources.warc import http_response_parts

    parts = http_response_parts(
        records.where(F.col("warc_type") == "response")
    ).where(
        F.col("http_status").between(int(min_status), int(max_status))
    )
    html = parts.where(
        sniff_format_expr("http_body") == "html"
    ).select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("http_body"),
        F.col("http_content_type"),
    )
    docs = (
        main_text_from_bytes(
            html,
            body_col="http_body",
            content_type_col="http_content_type",
            out_col="text",
        )
        .drop("http_body", "http_content_type")
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
        .withColumn("lang", lang_id_expr("text"))
    )
    # An EMPTY langs sequence means "keep every language", same as
    # None — the YAML builtin (`core.ingest_gate langs: []`) already
    # has that contract, and `isin([])` would silently drop every row,
    # the exact pipeline-killer the YAML fix was written to remove.
    if langs is not None and len(langs) > 0:
        docs = docs.where(F.col("lang").isin(list(langs)))
    docs = docs.withColumn(
        "n_tokens", token_count_expr("text").cast("bigint")
    )
    if gopher_thresholds is not False:
        sig = gopher_signals(docs, id_col="doc_id", lang_col="lang")
        docs = sig.where(gopher_pass_expr(gopher_thresholds)).drop(
            *[c for c in SIGNAL_COLUMNS if c in sig.columns]
        )
    if lm is not None:
        if ppl_max is None:
            raise ValueError(
                "web_ingest_gate: lm= needs ppl_max= (freeze the "
                "threshold from perplexity_buckets on a reference "
                "slice — a live stream has no corpus to take "
                "quantiles over)"
            )
        docs = lm.score(docs, id_col="doc_id", attach=True).where(
            F.col("ppl") <= float(ppl_max)
        ).drop("n_grams", "cross_entropy")
    if embed_model is not None:
        from snapflow_spark.functions.embed import embed_with_model

        docs = embed_with_model(
            docs,
            embed_model,
            text_col="text",
            out_col="embedding",
            dim=embed_dim,
            batch_size=embed_batch_size,
        )
    else:
        from snapflow_spark.functions.text import hashed_embedding_udf

        docs = docs.withColumn(
            "embedding",
            hashed_embedding_udf("text", dim=int(embed_dim or 64)),
        )
    return docs
