"""Vector similarity search (SURVEY.md §2.B.11; PAPERS.md top-k
similarity corpus).

- brute_force_topk: exact cosine top-k — the correctness baseline and
  the oracle-hashable path. One scan, per-partition heaps
  (TakeOrderedAndProject), no UDF: fine up to ~10^7 vectors per probe.
- ivf_topk: IVF (inverted-file) scale path — KMeans-partition the
  corpus once, search only the nprobe closest cells. At 100 TB the
  corpus is written partitioned by centroid id, so a probe reads
  nprobe/k of the data (partition pruning does the rest).
- embedding_near_dup_pairs: cosine-threshold near-dup pairs via
  random-projection LSH on unit vectors (||a-b||^2 = 2-2cos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snapflow_spark.functions.vectors import cosine_similarity, l2_norm
from snapflow_spark.operators.topk import grouped_topk, topk


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for every probe row. The probe set
    is broadcast (it is small by construction); the corpus never
    shuffles. Returns (probe_id, vec_id, cos) with deterministic
    tie-break on vec_id."""
    p = F.broadcast(
        probes.select(
            F.col(probe_id_col), F.col(vec_col).alias("__probe_vec")
        )
    )
    scored = corpus.select(id_col, vec_col).crossJoin(p).select(
        probe_id_col,
        id_col,
        cosine_similarity(vec_col, "__probe_vec").alias("cos"),
    )
    return grouped_topk(
        scored, [probe_id_col], [F.col("cos").desc(), F.col(id_col).asc()], k
    )


class IVFIndex:
    """Inverted-file index: corpus rows assigned to KMeans centroids.

    build() is one ML fit + one projection; search() prunes to the
    nprobe nearest cells then brute-forces within them. Recall is
    tunable via nprobe; nprobe == k_cells degenerates to exact."""

    def __init__(self, model, assigned: DataFrame, vec_col: str, id_col: str):
        self.model = model
        self.assigned = assigned  # corpus + "cell" column
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        k_cells: int = 16,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = 42,
    ) -> "IVFIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = corpus.withColumn("__features", array_to_vector(F.col(vec_col)))
        km = KMeans(k=k_cells, seed=seed, featuresCol="__features", predictionCol="cell")
        model = km.fit(feats)
        assigned = model.transform(feats).drop("__features")
        # At scale: persist `assigned` partitioned by cell
        # (df.write.partitionBy("cell")) so search prunes at the reader.
        return cls(model, assigned, vec_col, id_col)

    def search(self, probes: DataFrame, k: int = 5, nprobe: int = 4,
               probe_id_col: str = "probe_id") -> DataFrame:
        import numpy as np

        centers = np.array([np.asarray(c) for c in self.model.clusterCenters()])
        probe_rows = probes.select(probe_id_col, self.vec_col).collect()

        # Driver-side nprobe selection is OK: #probes is small and
        # centers is k_cells × dim — never corpus-sized.
        cells_per_probe = []
        for r in probe_rows:
            v = np.array(r[self.vec_col], dtype=np.float64)
            norm = np.linalg.norm(v) * np.linalg.norm(centers, axis=1)
            cos = (centers @ v) / np.where(norm == 0, 1, norm)
            best = np.argsort(-cos)[:nprobe]
            cells_per_probe.append((r[probe_id_col], [int(c) for c in best], list(r[self.vec_col])))

        spark = probes.sparkSession
        probe_cells = spark.createDataFrame(
            [(pid, cell, vec) for pid, cells, vec in cells_per_probe for cell in cells],
            f"{probe_id_col} bigint, cell int, __probe_vec array<float>",
        )
        pruned = self.assigned.join(F.broadcast(probe_cells), "cell")
        scored = pruned.select(
            probe_id_col,
            self.id_col,
            cosine_similarity(self.vec_col, "__probe_vec").alias("cos"),
        )
        return grouped_topk(
            scored, [probe_id_col], [F.col("cos").desc(), F.col(self.id_col).asc()], k
        )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    cos_threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_hash_tables: int = 4,
    bucket_length: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Cosine-near-duplicate pairs at scale: normalize to unit vectors,
    then euclidean random-projection LSH — for unit vectors
    ||a-b|| = sqrt(2-2cos), so the cosine threshold maps exactly to a
    distance threshold. Returns (id_a < id_b, cos)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    unit = corpus.select(
        id_col,
        F.transform(
            F.col(vec_col), lambda x: x.cast("double") / l2_norm(F.col(vec_col))
        ).alias("__unit"),
    ).withColumn("__features", array_to_vector("__unit"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="__features", outputCol="__hashes",
        numHashTables=num_hash_tables, bucketLength=bucket_length, seed=seed,
    )
    model = lsh.fit(unit)
    dist_threshold = float((2.0 - 2.0 * cos_threshold) ** 0.5)
    pairs = model.approxSimilarityJoin(unit, unit, dist_threshold, distCol="dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            (1.0 - F.col("dist") * F.col("dist") / 2.0).alias("cos"),
        )
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
