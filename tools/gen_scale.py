"""Deterministic ~Nx scale-up of the sf0.1 fixtures for scale-proof runs.

Purpose (SCALE.md): every 100 TB claim in this repo is backed by plan
shape; this generator produces a local ~10x corpus so the heavy-tail
operators can be MEASURED at two scale factors and shown ~linear.

Design: replica r (1..factor-1) is an isomorphic copy of the base
corpus in a disjoint namespace, so per-replica internal structure —
exact-dup groups, near-dup pairs, token frequency shape, cluster
geometry, per-user event history — is preserved while nothing
collides across replicas:

- documents: every token gets a replica suffix (``regexp_replace`` on
  ``\\S+`` — pure codegen). Two docs that were near-dups stay
  near-dups (same Jaccard/simhash distance), and no shingle or band
  bucket is shared across replicas, so dedup OUTPUT scales exactly
  linearly with input — wall-clock ratios are interpretable.
- embeddings: replica r applies a deterministic per-replica SIGN-FLIP
  pattern over dimensions (a reflection — an exact isometry): every
  within-replica distance/cosine is preserved bit-for-bit, so each
  replica carries the base corpus's full cluster geometry, while
  cross-replica cosines collapse to ~0 (about half the dims flip).
  A small additive perturbation instead would leave replicas at
  cosine≈1 of their originals and blow up near-dup outputs ~1900x
  (measured) — the reflection keeps near-dup output linear in the
  factor. Ids offset per replica.
- events: user_id/event_id offset per replica — group COUNT scales
  by the factor while per-group size stays constant (the realistic
  shape for applyInPandas / sessionization at more data).

Everything is seedless integer/trig arithmetic on existing values —
rerunning reproduces byte-identical logical content. Generation runs
through Spark itself (union of selects + parquet write), so the same
script scales past local memory. Remaining tables are copied verbatim
so any registry query can run against the output dir.

Usage::

    python tools/gen_scale.py --out .scratch/sf1 [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapflow_spark.catalog import TABLES, table_path
from snapflow_spark.session import build_session, tune

ID_STRIDE = 100_000_000  # replica id offset; far above any base id


def _replicate(base: DataFrame, factor: int, per_replica) -> DataFrame:
    out = None
    for r in range(factor):
        piece = per_replica(base, r)
        out = piece if out is None else out.unionByName(piece)
    return out


def scale_documents(df: DataFrame, factor: int) -> DataFrame:
    def rep(base: DataFrame, r: int) -> DataFrame:
        if r == 0:
            return base
        # Disjoint token namespace per replica: suffix every token.
        text = F.regexp_replace("text", r"(\S+)", "$1~r" + str(r))
        return base.select(
            (F.col("doc_id") + F.lit(r * ID_STRIDE)).alias("doc_id"),
            text.alias("text"),
            F.col("lang"),
            F.col("source"),
            F.length(text).cast("long").alias("n_chars"),
        )

    return _replicate(df, factor, rep)


def scale_embeddings(df: DataFrame, factor: int) -> DataFrame:
    def rep(base: DataFrame, r: int) -> DataFrame:
        if r == 0:
            return base
        # sign s(r, i) = ±1 from the parity of a 64-bit hash of
        # (replica, dim) — same pattern for every vector in a replica.
        emb = F.transform(
            "embedding",
            lambda x, i: (
                x * (F.lit(1) - F.lit(2) * F.pmod(F.xxhash64(F.lit(r), i), F.lit(2)))
            ).cast("float"),
        )
        return base.select(
            (F.col("vec_id") + F.lit(r * ID_STRIDE)).alias("vec_id"),
            emb.alias("embedding"),
            F.col("label"),
        )

    return _replicate(df, factor, rep)


def scale_events(df: DataFrame, factor: int) -> DataFrame:
    # NOTE: ts arrives as raw nanos (long) — the fixture is
    # TIMESTAMP(NANOS) read under nanosAsLong; we keep it as int64
    # nanos in the output, which load_table converts identically.
    def rep(base: DataFrame, r: int) -> DataFrame:
        if r == 0:
            return base
        return base.select(
            (F.col("event_id") + F.lit(r * ID_STRIDE)).alias("event_id"),
            F.col("ts"),
            (F.col("user_id") + F.lit(r * ID_STRIDE)).alias("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.col("props"),
        )

    return _replicate(df, factor, rep)


SCALED = {
    "documents": scale_documents,
    "embeddings": scale_embeddings,
    "events": scale_events,
}


def generate(spark: SparkSession, src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    tune(spark)  # nanosAsLong for the raw events read
    for name in TABLES:
        dst = os.path.join(out, f"{name}.parquet")
        if name in SCALED:
            base = spark.read.parquet(table_path(src, name))
            scaled = SCALED[name](base, factor)
            # Keep files at a realistic per-file size instead of one
            # blob per replica branch.
            scaled.repartition(8).write.mode("overwrite").parquet(dst)
            n = spark.read.parquet(dst).count()
            print(f"{name}: x{factor} -> {n} rows", flush=True)
        else:
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            shutil.copyfile(table_path(src, name), dst)
            print(f"{name}: copied", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".scratch/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    spark = build_session("gen-scale")
    generate(spark, args.src, args.out, args.factor)


if __name__ == "__main__":
    main()
