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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snapflow_spark.catalog import ensure_parallelism
from snapflow_spark.functions.vectors import cosine_similarity, l2_norm
from snapflow_spark.operators.buckets import bucketed_pairs
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
    scored = ensure_parallelism(corpus.select(id_col, vec_col)).crossJoin(p).select(
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
    tunable via nprobe; nprobe == k_cells degenerates to exact.
    save()/load() persist the assignment partitionBy(cell) — the
    100 TB layout where a probe's scan reads only nprobe/k_cells of
    the data via partition pruning — plus a tiny centroid table."""

    def __init__(self, centers, assigned: DataFrame, vec_col: str, id_col: str):
        import numpy as np

        self.centers = np.asarray(centers, dtype=np.float64)  # (k_cells, dim)
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
        max_iter: int = 8,
    ) -> "IVFIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        # no ensure_parallelism here: KMeans.fit launches maxIter jobs,
        # so more partitions of a small corpus = scheduler overhead, and
        # a big corpus arrives pre-split from its scan anyway.
        # max_iter=8: a coarse IVF quantizer needs rough cells, not
        # converged clustering — recall comes from nprobe, and each
        # extra iteration is one more full pass over the corpus.
        feats = corpus.withColumn("__features", array_to_vector(F.col(vec_col)))
        km = KMeans(
            k=k_cells, seed=seed, maxIter=max_iter,
            featuresCol="__features", predictionCol="cell",
        )
        model = km.fit(feats)
        assigned = model.transform(feats).drop("__features")
        import numpy as np

        centers = np.array([np.asarray(c) for c in model.clusterCenters()])
        return cls(centers, assigned, vec_col, id_col)

    def save(self, path: str) -> None:
        """Persist: assignment Hive-partitioned by cell + centroid
        table. Search on a loaded index prunes cell partitions at the
        file listing."""
        self.assigned.write.mode("overwrite").partitionBy("cell").parquet(
            f"{path}/assigned"
        )
        spark = self.assigned.sparkSession
        rows = [(i, [float(x) for x in c]) for i, c in enumerate(self.centers)]
        spark.createDataFrame(rows, "cell int, center array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{path}/centroids")

    @classmethod
    def load(
        cls,
        spark,
        path: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "IVFIndex":
        centroid_rows = spark.read.parquet(f"{path}/centroids").collect()
        centers = [
            r["center"] for r in sorted(centroid_rows, key=lambda r: r["cell"])
        ]
        assigned = spark.read.parquet(f"{path}/assigned")
        return cls(centers, assigned, vec_col, id_col)

    def search(self, probes: DataFrame, k: int = 5, nprobe: int = 4,
               probe_id_col: str = "probe_id") -> DataFrame:
        import numpy as np

        centers = self.centers
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
    n_bands: int = 24,
    bits_per_band: int = 12,
    max_bucket: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Cosine-near-duplicate pairs via signed-random-projection LSH:
    each vector gets n_bands*bits_per_band hyperplane sign bits
    (P[bit match] = 1 - angle/pi) from one numpy matmul per Arrow
    batch; bits group into band keys; ONE shuffle on the band key;
    exact cosine is computed in-bucket (the member struct carries the
    vector), so candidates are verified with no join-back.

    Band shape tradeoff: detection for cos>=0.9 with 24x12 bands is
    ~0.98 while a random (near-orthogonal) pair collides in a band
    w.p. 2^-12 — wider bands flood the verify stage with random
    collisions (measured 30x the candidate pairs at 12x6).

    Replaces pyspark.ml BucketedRandomProjectionLSH.approxSimilarityJoin
    (measured 6.8s vs <2s on sf0.1; and ml.Vector conversion costs an
    extra python<->JVM round per row at scale)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    rng = np.random.default_rng(seed)
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_row["d"])
    # dim x n_planes projection matrix; the sign bits come from one
    # numpy matmul per Arrow batch. (A higher-order-fn formulation —
    # 72 aggregate(zip_with(...)) per row — is interpreted, not
    # codegen'd, and measured ~4s vs <1s for the matmul.)
    planes_t = rng.standard_normal((n_bands * bits_per_band, dim)).T.copy()
    powers = (1 << np.arange(bits_per_band - 1, -1, -1)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def band_keys(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (m @ planes_t) > 0  # (n, n_planes)
        keys = bits.reshape(len(m), n_bands, bits_per_band).astype(np.int64) @ powers
        return pd.Series(list(keys))

    banded = (
        ensure_parallelism(
            corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__vec"))
        )
        .select("id", "__vec", F.posexplode(band_keys("__vec")).alias("band_idx", "band_val"))
    )
    pairs = bucketed_pairs(
        banded,
        ["band_idx", "band_val"],
        F.struct("id", "__vec"),
        lambda x, y: F.struct(
            x["id"].alias("id_a"),
            y["id"].alias("id_b"),
            cosine_similarity(x["__vec"], y["__vec"]).alias("cos"),
        ),
        max_bucket=max_bucket,
    )
    return pairs.where(F.col("cos") >= cos_threshold).dropDuplicates(["id_a", "id_b"])
