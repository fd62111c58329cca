"""Scan-parallelism floor for per-row-heavy operators.

A small table stored as one parquet file is one row group, and a row group
is the unit of split — so the scan plans as a SINGLE task no matter how
many cores the cluster has (spark.sql.files.maxPartitionBytes cannot split
inside a row group). Operators whose cost is dominated by per-row compute
(minhash signature arrays, shingling, simhash bit sums, hyperplane dot
products) then run serially on one core while the rest of the cluster
idles.

ensure_parallelism() is the adaptive guard (guide §1.2 step 1 /  §6 "input
split size"): repartition up to the cluster's default parallelism ONLY when
the planned scan parallelism is far below it. At real scale — thousands of
row groups — the input already plans wide and this is a no-op, so nothing
here is tuned to local mode; the shuffle it may introduce moves exactly the
projected input of the heavy operator once, which is always cheaper than
serializing the compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, *part_cols: str) -> DataFrame:
    """Repartition `df` to defaultParallelism iff its planned partition
    count is below half of it. With `part_cols`, partitioning is a
    deterministic hash of those columns (safe under task retry — guide
    §2.5: keyless round-robin repartition of nondeterministic input can
    duplicate/lose rows on fetch failure, SPARK-38388); without, plain
    round-robin."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — planning quirks never fatal here
        return df
    if cur * 2 >= target:
        return df
    if part_cols:
        return df.repartition(target, *[F.col(c) for c in part_cols])
    return df.repartition(target)
