"""Whole-DataFrame normalization suite (Normalization.java parity).

Reference: datavec-spark/.../Normalization.java:23 — zeromeanUnitVariance
(:33,107), normalize/min-max (:58,84,295), with exclude-columns variants and
sequence flavors; column stats via DataFrames.std/min/max/mean (:58-111).

Spark restatement: one agg pass for all stats, then a single select with
arithmetic expressions — two jobs total regardless of column count
(the reference computes per-column stats with separate passes)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "double", "float", "smallint", "tinyint"}


def _numeric_cols(df: DataFrame, exclude: list[str] | None) -> list[str]:
    ex = set(exclude or [])
    return [c for c, t in df.dtypes if t in _NUMERIC and c not in ex]


def zeromean_unit_variance(df: DataFrame, exclude: list[str] | None = None) -> DataFrame:
    """(col - mean) / stdev for every numeric column (Normalization.java:33)."""
    cols = _numeric_cols(df, exclude)
    stats = df.agg(*[F.mean(c).alias(f"{c}__m") for c in cols],
                   *[F.stddev_samp(c).alias(f"{c}__s") for c in cols]).collect()[0]
    out = {}
    for c in cols:
        m, s = stats[f"{c}__m"], stats[f"{c}__s"]
        if s is None or s == 0.0:
            s = 1.0
        out[c] = (F.col(c) - m) / s
    return df.withColumns(out)


def min_max_scale(df: DataFrame, lo: float = 0.0, hi: float = 1.0,
                  exclude: list[str] | None = None) -> DataFrame:
    """Scale numeric columns to [lo, hi] (Normalization.java:58,84)."""
    cols = _numeric_cols(df, exclude)
    stats = df.agg(*[F.min(c).alias(f"{c}__lo") for c in cols],
                   *[F.max(c).alias(f"{c}__hi") for c in cols]).collect()[0]
    out = {}
    for c in cols:
        a, b = stats[f"{c}__lo"], stats[f"{c}__hi"]
        rng = (b - a) if (a is not None and b is not None and b != a) else 1.0
        out[c] = (F.col(c) - a) / rng * (hi - lo) + lo
    return df.withColumns(out)
