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
    """IVF-partitioned ANN: the assignment is materialized ON DISK as
    hive-partitioned parquet (partitionBy("_cid")), so a probe's
    `_cid IN (...)` filter is *partition pruning at planning time* — only
    the nprobe/C matching directories are listed and scanned. (A cached
    DataFrame cannot do this: Spark has no partition pruning on cached
    partitions, every cached block would be scanned per query — the fix for
    the round-1 'probe filter does not prune IO' defect.)"""

    def __init__(self, df: DataFrame, centroids: np.ndarray,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 path: str | None = None):
        import tempfile

        self.vec_col, self.id_col = vec_col, id_col
        self.centroids = centroids
        self.spark = df.sparkSession
        # ownership: a self-created temp dir is ours to delete in drop();
        # a caller-supplied path is the caller's (drop() leaves it in place)
        self._owns_path = path is None
        self.path = path or tempfile.mkdtemp(prefix="ivf_index_")
        assign_to_centroid(df, centroids, vec_col) \
            .write.mode("overwrite").partitionBy("_cid").parquet(self.path)

    def drop(self) -> None:
        """Delete the materialized index files if this instance created them
        (an index build otherwise leaks a full on-disk copy of the dataset
        for the process lifetime and beyond)."""
        if self._owns_path:
            import shutil

            shutil.rmtree(self.path, ignore_errors=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.drop()

    def probe_ids(self, query: list[float], nprobe: int) -> list[int]:
        q = np.asarray(query, dtype=np.float64)
        d2 = ((self.centroids - q) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d2)[:nprobe]]

    def probe_df(self, query: list[float], nprobe: int) -> DataFrame:
        probe = self.probe_ids(query, nprobe)
        return self.spark.read.parquet(self.path).where(F.col("_cid").isin(probe))

    def search(self, query: list[float], k: int = 10, nprobe: int = 4) -> DataFrame:
        return cosine_topk(self.probe_df(query, nprobe), query, k,
                           self.vec_col, self.id_col)
