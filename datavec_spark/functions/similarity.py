"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan with native array
expressions (JVM-side fold), no shuffle except the final top-k.
Scale path: IVF-style partitioned search — assign every vector to its
nearest of C centroids (one broadcastable centroid list), search only the
nprobe closest partitions to the query. Centroids come from a deterministic
seeded sample + a few Lloyd iterations computed distributedly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_topk(
    df: DataFrame, query: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: one scan + global top-k (orderBy+limit is
    planned as TakeOrderedAndProject — per-partition heaps, no full sort)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.linalg.norm(query))
    cos = _dot(v, q) / (_norm(v) * F.lit(qn))
    return (
        df.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def train_ivf_centroids(
    df: DataFrame, vec_col: str = "embedding", n_centroids: int = 16,
    iters: int = 3, seed: int = 42,
) -> np.ndarray:
    """Deterministic mini k-means: seeded sample init, Lloyd iterations as
    distributed assign+mean (one groupBy per iter). Returns (C, dim)."""
    sample = np.array(
        df.select(vec_col).orderBy(F.xxhash64(F.col(vec_col).cast("array<float>").cast("string"), F.lit(seed)))
        .limit(n_centroids).toPandas()[vec_col].tolist(),
        dtype=np.float64,
    )
    centroids = sample
    for _ in range(iters):
        assigned = assign_to_centroid(df, centroids, vec_col).select("_cid", vec_col)
        agg = (
            assigned.groupBy("_cid")
            .agg(*[F.avg(F.col(vec_col)[i]).alias(f"d{i}") for i in range(centroids.shape[1])])
            .collect()
        )
        new = centroids.copy()
        for r in agg:
            new[r["_cid"]] = [r[f"d{i}"] for i in range(centroids.shape[1])]
        centroids = new
    return centroids


def assign_to_centroid(df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """Add `_cid` = argmin squared-distance to centroids. The centroid list
    is a literal array-of-arrays (broadcast by the plan); comparison is a
    native fold, no UDF."""
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    d2 = F.transform(cents, lambda c: F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, x: s + x))
    best = F.array_position(d2, F.array_min(d2)) - 1
    return df.withColumn("_cid", best.cast("int"))


class IvfIndex:
    """IVF-partitioned ANN: build once (assignment materialized, bucketed by
    centroid id), probe nprobe nearest centroid partitions per query —
    reads 1/C..nprobe/C of the data instead of all of it."""

    def __init__(self, df: DataFrame, centroids: np.ndarray,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        self.vec_col, self.id_col = vec_col, id_col
        self.centroids = centroids
        self.assigned = assign_to_centroid(df, centroids, vec_col) \
            .repartition(max(len(centroids) // 2, 1), F.col("_cid")).persist()

    def search(self, query: list[float], k: int = 10, nprobe: int = 4) -> DataFrame:
        q = np.asarray(query, dtype=np.float64)
        d2 = ((self.centroids - q) ** 2).sum(axis=1)
        probe = [int(i) for i in np.argsort(d2)[:nprobe]]
        subset = self.assigned.where(F.col("_cid").isin(probe))
        return cosine_topk(subset, query, k, self.vec_col, self.id_col)
