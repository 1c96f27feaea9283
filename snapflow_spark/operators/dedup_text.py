"""Document deduplication operators (SURVEY.md §2.B.11; BASELINE
north-star: LLM-training-data pipeline dedup at 100 TB).

Four tiers, cheapest-first — the standard corpus-dedup cascade:
  1. exact_dedup          — sha256 of normalized text; one shuffle on the hash
  2. simhash_candidates   — 64-bit SimHash, banded: near-dup candidates
                            via equality joins on 16-bit bands (4 shuffles
                            on tiny keys, no pairwise blowup)
  3. minhash_candidates   — MinHashLSH (pyspark.ml) over token sets:
                            Jaccard-near candidates via LSH bucket join
  4. ngram_jaccard_pairs  — exact n-gram Jaccard verification of a
                            bounded candidate set (array_intersect /
                            array_union, JVM-side)
Every stage is candidates -> verify: the pairwise work only ever runs
on LSH-bucket collisions, never on the full N² — that is what makes
near-dedup feasible at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from snapflow_spark.functions.text import fingerprint_expr, simhash_udf, tokens_expr


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per normalized-text fingerprint;
    adds n_copies. Plain hash-groupBy — AQE handles skewed fingerprints
    (e.g. empty documents)."""
    return (
        df.withColumn("fingerprint", fingerprint_expr(text_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def simhash_bands(df: DataFrame, text_col: str = "text", n_bands: int = 4) -> DataFrame:
    """Attach a 64-bit SimHash and explode it into ``n_bands`` equal bit
    bands; near-identical docs (small hamming distance) share at least
    one band value with high probability."""
    bits = 64 // n_bands
    sim = df.withColumn("simhash", simhash_udf(text_col))
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.shiftrightunsigned(F.col("simhash"), i * bits)
                .bitwiseAND(F.lit((1 << bits) - 1))
                .alias("band_val"),
            )
            for i in range(n_bands)
        ]
    )
    return sim.withColumn("band", F.explode(bands)).select(
        "*", F.col("band.band_idx").alias("band_idx"), F.col("band.band_val").alias("band_val")
    ).drop("band")


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs: equality join on banded SimHash, then
    exact hamming verification via bit_count(xor) — all JVM-side."""
    banded = simhash_bands(
        df.select(id_col, text_col), text_col, n_bands
    ).select(id_col, "simhash", "band_idx", "band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    num_hash_tables: int = 8,
    vocab_size: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-dup candidates (pyspark.ml): shingle -> binary
    token vector -> minhash band buckets -> bucket join. Returns pairs
    (id_a < id_b) with the estimated jaccard distance."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = df.select(id_col, tokens_expr(text_col).alias("tokens")).where(
        F.size("tokens") > 0
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=vocab_size, binary=True)
    feats = tf.transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.col("jaccard_dist"),
        )
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_expr(tokens: Column, n: int = 3) -> Column:
    """Sliding word n-grams as an array column (codegen, no UDF)."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tokens)))


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs — the
    verify stage after any LSH candidate generator. Joins the (small)
    pair set back to the corpus twice, then set algebra in codegen."""
    grams = df.select(
        F.col(id_col),
        F.array_distinct(ngram_expr(tokens_expr(text_col), n)).alias("grams"),
    )
    ga = grams.select(F.col(id_col).alias("id_a"), F.col("grams").alias("grams_a"))
    gb = grams.select(F.col(id_col).alias("id_b"), F.col("grams").alias("grams_b"))
    return (
        candidate_pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("grams_a", "grams_b"))
                / F.size(F.array_union("grams_a", "grams_b"))
            ).alias("jaccard"),
        )
    )
