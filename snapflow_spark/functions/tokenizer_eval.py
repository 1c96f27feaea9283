"""Tokenizer EVALUATION over a Spark corpus — the measurement a team
runs after ``train-bpe`` / ``train-unigram`` to pick a vocabulary:
compression rate (chars and bytes per token), fertility (tokens per
document) and OOV coverage, overall or per group (the per-language
breakdown is the standard vocab-size/coverage trade table from the
SentencePiece and multilingual-LM literature).

Plan shape: ONE encode pass (the tokenizer's Arrow-batched UDF), one
posexplode, one broadcast join against the (token, id) table for
vocabulary membership, one aggregation. Document-level totals ride
the token rows on the ``pos == 0`` trick (each doc's char/byte
lengths are attributed to its first token row; ``posexplode_outer``
keeps token-less documents as a null-token row), so no second pass
over the encoded corpus is needed. OOV tokens are, by both trainers'
construction, exactly the single characters never seen in training —
they map to id NULL under the left join, the id -1 convention's
corpus-side form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["tokenizer_stats"]


def tokenizer_stats(
    spark: SparkSession,
    docs: DataFrame,
    tokenizer,
    text_col: str = "text",
    by: str | None = None,
) -> DataFrame:
    """Compression/coverage metrics for a TRAINED tokenizer
    (``BPETokenizer`` or ``UnigramTokenizer`` — anything with
    ``encode_col`` + ``id_table``) over ``docs``; one row per ``by``
    group (or a single global row): ``n_docs``, ``n_tokens``,
    ``n_oov_tokens``, ``n_chars``, ``n_bytes``,
    ``chars_per_token``, ``bytes_per_token``, ``tokens_per_doc``,
    ``oov_frac``."""
    keys = [by] if by else []
    rows = docs.select(
        *keys,
        F.length(F.col(text_col)).alias("__c"),
        F.octet_length(F.col(text_col)).alias("__b"),
        F.posexplode_outer(tokenizer.encode_col(spark, text_col)).alias(
            "pos", "token"
        ),
    ).join(F.broadcast(tokenizer.id_table(spark)), "token", "left")
    first = F.coalesce(F.col("pos"), F.lit(0)) == 0
    agg = rows.groupBy(*keys).agg(
        F.sum(F.when(first, 1).otherwise(0)).cast("bigint").alias("n_docs"),
        F.count("token").cast("bigint").alias("n_tokens"),
        F.sum(
            F.when(F.col("token").isNotNull() & F.col("token_id").isNull(), 1)
            .otherwise(0)
        ).cast("bigint").alias("n_oov_tokens"),
        F.sum(F.when(first, F.col("__c")).otherwise(0))
        .cast("bigint")
        .alias("n_chars"),
        F.sum(F.when(first, F.col("__b")).otherwise(0))
        .cast("bigint")
        .alias("n_bytes"),
    )
    tok = F.col("n_tokens")
    return agg.select(
        *keys,
        "n_docs",
        "n_tokens",
        "n_oov_tokens",
        "n_chars",
        "n_bytes",
        F.when(tok > 0, F.round(F.col("n_chars") / tok, 4)).alias(
            "chars_per_token"
        ),
        F.when(tok > 0, F.round(F.col("n_bytes") / tok, 4)).alias(
            "bytes_per_token"
        ),
        F.when(F.col("n_docs") > 0, F.round(tok / F.col("n_docs"), 4)).alias(
            "tokens_per_doc"
        ),
        F.when(tok > 0, F.round(F.col("n_oov_tokens") / tok, 6)).alias(
            "oov_frac"
        ),
    )
