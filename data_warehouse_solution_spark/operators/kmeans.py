"""Distributed Lloyd's k-means over embedding columns — the IVF
coarse-quantizer TRAINER (SCALE.md promises it: "the full IVF trainer
is iterations of exactly that plan").

Each iteration is two distributed steps, both pure DataFrame ops:

- E-step (assign): centroids broadcast (k x dim doubles — always
  tiny), each vector computes its nearest centroid in one narrow
  map (a k-way least() over F.aggregate dot products). No shuffle.
- M-step (update): posexplode(embedding) -> groupBy(cluster, dim)
  -> avg -> re-assemble arrays. One shuffle of |vectors| x dim
  scalar rows, partial-aggregated map-side.

The driver only holds the k centroids and the inertia trace — never
the vectors — so the same loop runs unchanged on a 1000-executor
cluster. Lloyd's algorithm guarantees a non-increasing inertia,
which the tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _sq_dist(a, b) -> F.Column:
    """Squared L2 distance between two array columns, accumulated in
    double left-to-right (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(vectors: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, embedding) + driver-held centroids -> (vec_id,
    embedding, cluster, sq_dist). Centroids ship inside the closure
    (k x dim doubles — always broadcast-sized); the assignment is a
    narrow vectorized map, no shuffle: one numpy (n, k) distance
    matrix per Arrow batch, argmin per row (first minimum — the same
    tie-break as the previous least(struct(dist, idx)) expression
    form, which evaluated k interpreted higher-order functions per
    row and dominated training time: ~0.9 s per Lloyd iteration at
    sf0.1 vs ~0.05 s vectorized, across the ~50 iterations the PQ +
    IVF trainers run)."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    emb_type = dict(vectors.dtypes)["embedding"]

    def assign(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = pdf[["vec_id", "embedding"]].copy()
            if len(pdf) == 0:
                out["cluster"] = pd.Series([], dtype="int32")
                out["sq_dist"] = pd.Series([], dtype="float64")
                yield out
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            out["cluster"] = d.argmin(1).astype("int32")
            out["sq_dist"] = d.min(1)
            yield out

    return vectors.mapInPandas(
        assign, f"vec_id long, embedding {emb_type}, cluster int, sq_dist double"
    )


def train_kmeans(
    spark: SparkSession,
    vectors: DataFrame,
    k: int = 8,
    max_iters: int = 10,
    tol: float = 1e-6,
) -> tuple[list[list[float]], list[float]]:
    """Lloyd's k-means on (vec_id, embedding). Returns (centroids,
    inertia_per_iteration). Deterministic: initialized from the k
    smallest vec_ids (fixture vectors are pre-shuffled; swap in a
    k-means++ sampler for adversarial inputs)."""
    vectors = vectors.select("vec_id", "embedding").cache()
    init_rows = vectors.orderBy("vec_id").limit(k).collect()
    centroids = [[float(x) for x in r["embedding"]] for r in init_rows]
    inertia_trace: list[float] = []
    for _ in range(max_iters):
        assigned = assign_clusters(vectors, centroids)
        stats = (
            assigned.select("cluster", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
        )
        inertia = assigned.agg(F.sum("sq_dist").alias("s")).collect()[0]["s"]
        new_rows = (
            stats.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cluster", F.col("dm.m").alias("centroid"))
            .collect()
        )
        new_centroids = list(centroids)
        for r in new_rows:
            new_centroids[r["cluster"]] = [float(x) for x in r["centroid"]]
        inertia_trace.append(float(inertia))
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            break
    vectors.unpersist()
    return centroids, inertia_trace


def train_ivf_index(
    spark: SparkSession, sf_dir: str, k: int = 8, max_iters: int = 10
) -> DataFrame:
    """Train the IVF coarse quantizer on the embeddings fixture and
    return the posting-list assignment (vec_id, cluster, sq_dist) —
    the 'inverted file' an IVF search probes instead of the corpus."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids, _ = train_kmeans(spark, e, k=k, max_iters=max_iters)
    return assign_clusters(e.select("vec_id", "embedding"), centroids).select(
        "vec_id", "cluster", "sq_dist"
    )
