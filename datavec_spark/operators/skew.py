"""Skew handling: salting + two-phase aggregation for hot keys.

The north rule requires explicit hot-(repo)-key handling at 10^10 events.
Three layers of defense, outermost first:

1. **Partial aggregation (free).** Every reduce in this engine is a
   groupBy().agg() of an algebraic aggregate (max_by, sum, count, ...) —
   Spark's hash aggregate combines map-side, so a hot key contributes at
   most one row per map task to the shuffle. This is why the CDC LWW
   collapse needs no salt even with Zipf repos (contrast the reference's
   groupByKey, SparkTransformExecutor.java:231, which ships every row).
2. **AQE skew-join splitting (on by default in session.py)** for joins.
3. **Explicit salting (this module)** for the residual cases: non-algebraic
   aggregations (collect_list), extreme single-key joins, and forced
   repartitions where one partition would otherwise hold a hot key's
   entire volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, salt: int, deterministic_from: list[str] | None = None) -> DataFrame:
    """Add a salt column in [0, salt). Deterministic (hash of the given
    columns) by default-able inputs so retries/replays partition identically;
    spray-salt (row-random via monotonic id) when no columns are given."""
    if deterministic_from:
        expr = F.pmod(F.xxhash64(*[F.col(c) for c in deterministic_from], F.lit(0x5A17)), F.lit(salt))
    else:
        expr = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    return df.withColumn(SALT_COL, expr.cast("int"))


def salted_repartition(df: DataFrame, keys: list[str], num_partitions: int, salt: int = 8) -> DataFrame:
    """repartition-by-key with a salt sub-split so a hot key spreads over
    `salt` partitions instead of one (explicit repartition-by-key before
    merge-apply, per the north rule)."""
    return (
        with_salt(df, salt)
        .repartition(num_partitions, *[F.col(k) for k in keys], F.col(SALT_COL))
        .drop(SALT_COL)
    )


def salted_lww(df: DataFrame, keys: list[str], payload: list[str], seq_col: str,
               salt: int = 16) -> DataFrame:
    """Two-phase last-writer-wins: phase 1 collapses per (key, salt) —
    bounding any single reducer's share of a hot key — phase 2 collapses the
    ≤salt survivors per key. Equivalent to a single max_by (it is
    associative); useful when the single-phase shuffle still skews (e.g.
    sort-based agg fallback under memory pressure)."""
    w = F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(seq_col)).alias("w")
    mx = F.max(seq_col).alias(seq_col)
    phase1 = (
        with_salt(df, salt)
        .groupBy(*keys, SALT_COL)
        .agg(w, mx)
        .select(*keys, "w.*", seq_col)
    )
    return (
        phase1.groupBy(*keys)
        .agg(F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(seq_col)).alias("w"),
             F.max(seq_col).alias(seq_col))
        .select(*keys, "w.*", seq_col)
    )


def salted_collect_list(df: DataFrame, keys: list[str], value_col: str,
                        order_col: str, salt: int = 16) -> DataFrame:
    """Order-preserving collect_list with salting (collect_list has no
    map-side combine — THE case where hot keys genuinely blow up)."""
    part = (
        with_salt(df, salt, deterministic_from=[order_col])
        .groupBy(*keys, SALT_COL)
        .agg(F.sort_array(F.collect_list(F.struct(F.col(order_col), F.col(value_col)))).alias("part"))
    )
    merged = part.groupBy(*keys).agg(
        F.array_sort(F.flatten(F.collect_list("part"))).alias("pairs")
    )
    return merged.select(
        *keys, F.transform(F.col("pairs"), lambda p: p[value_col]).alias(f"{value_col}_list")
    )
