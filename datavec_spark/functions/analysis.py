"""Distributed analysis & quality (AnalyzeSpark parity, SURVEY.md §2.10).

Reference: AnalyzeSpark.analyze (datavec-spark/.../AnalyzeSpark.java:120-258)
runs two tree-aggregations (streaming counters + t-digest, then fixed-bound
histograms); analyzeQuality (AnalyzeSpark.java:359-398) computes per-column
valid/invalid/missing/empty + HyperLogLogPlus uniqueness.

Spark lowering: ONE df.agg(...) pass for all per-column stats (Catalyst
fuses them; partial aggregation is map-side), `approx_percentile` for
quantiles (Spark's built-in sketch replacing t-digest),
`approx_count_distinct` (HLL++) for uniqueness, and a `width_bucket`
groupBy for histograms — keeping the reference's two-phase shape (stats
pass → histogram pass with driver-synced bounds) because histogram bounds
genuinely need the first pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datavec_spark.plans.schema import EngineSchema

_NUMERIC = {"int", "bigint", "double", "float", "smallint", "tinyint", "decimal"}


def analyze(df: DataFrame, quantiles: list[float] | None = None, hist_buckets: int = 20) -> dict:
    """Per-column statistics in one distributed pass (+one for histograms)."""
    quantiles = quantiles or [0.25, 0.5, 0.75, 0.9, 0.99]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    numeric_cols = [c for c, t in df.dtypes if t in _NUMERIC]
    string_cols = [c for c, t in df.dtypes if t == "string"]
    for c in numeric_cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__count"),
            F.min(col).alias(f"{c}__min"),
            F.max(col).alias(f"{c}__max"),
            F.mean(col).alias(f"{c}__mean"),
            F.stddev_samp(col).alias(f"{c}__stdev"),
            F.var_samp(col).alias(f"{c}__variance"),
            F.sum((col == 0).cast("long")).alias(f"{c}__countZero"),
            F.sum((col > 0).cast("long")).alias(f"{c}__countPositive"),
            F.sum((col < 0).cast("long")).alias(f"{c}__countNegative"),
            F.percentile_approx(col, quantiles, 10000).alias(f"{c}__quantiles"),
        ]
    for c in string_cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__count"),
            F.min(F.length(col)).alias(f"{c}__minLength"),
            F.max(F.length(col)).alias(f"{c}__maxLength"),
            F.mean(F.length(col)).alias(f"{c}__meanLength"),
            F.approx_count_distinct(col).alias(f"{c}__unique"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict = {"rows": row["__rows"], "columns": {}}
    for c in numeric_cols:
        out["columns"][c] = {
            k: row[f"{c}__{k}"]
            for k in ["count", "min", "max", "mean", "stdev", "variance",
                      "countZero", "countPositive", "countNegative"]
        }
        out["columns"][c]["quantiles"] = dict(zip(map(str, quantiles), row[f"{c}__quantiles"] or []))
    for c in string_cols:
        out["columns"][c] = {
            k: row[f"{c}__{k}"] for k in ["count", "minLength", "maxLength", "meanLength", "unique"]
        }
    # second pass: fixed-bound histograms for numeric columns
    out["histograms"] = {}
    for c in numeric_cols:
        s = out["columns"][c]
        if s["min"] is None or s["min"] == s["max"]:
            continue
        lo, hi = float(s["min"]), float(s["max"])
        bucket = F.least(
            F.floor((F.col(c) - lo) / ((hi - lo) / hist_buckets)).cast("int"),
            F.lit(hist_buckets - 1),
        )
        counts = {r["b"]: r["n"] for r in
                  df.where(F.col(c).isNotNull()).groupBy(bucket.alias("b"))
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        width = (hi - lo) / hist_buckets
        out["histograms"][c] = [
            {"lo": lo + i * width, "hi": lo + (i + 1) * width, "count": counts.get(i, 0)}
            for i in range(hist_buckets)
        ]
    return out


def analyze_quality(df: DataFrame, schema: EngineSchema, rsd: float = 0.05) -> dict:
    """Per-column valid/invalid/missing/empty/unique — one distributed pass."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for spec in schema.columns:
        if spec.name not in df.columns:
            continue
        c = F.col(spec.name)
        valid = spec.validity_expr()
        aggs += [
            F.sum((c.isNotNull() & valid).cast("long")).alias(f"{spec.name}__valid"),
            F.sum((c.isNotNull() & ~valid).cast("long")).alias(f"{spec.name}__invalid"),
            F.sum(c.isNull().cast("long")).alias(f"{spec.name}__missing"),
            F.sum((c.cast("string") == "").cast("long")).alias(f"{spec.name}__empty"),
            F.approx_count_distinct(c, rsd).alias(f"{spec.name}__unique"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()
    out = {"rows": row["__rows"], "columns": {}}
    for spec in schema.columns:
        if spec.name not in df.columns:
            continue
        out["columns"][spec.name] = {
            k: row[f"{spec.name}__{k}"] for k in ["valid", "invalid", "missing", "empty", "unique"]
        }
    return out


def sample_invalid(df: DataFrame, schema: EngineSchema, column: str, n: int = 10) -> list:
    """AnalyzeSpark.sampleInvalidFromColumn parity (AnalyzeSpark.java:426)."""
    spec = schema.column(column)
    bad = df.where(F.col(column).isNull() | ~spec.validity_expr())
    return [r[column] for r in bad.select(column).limit(n).collect()]


def most_frequent(df: DataFrame, column: str, n: int = 10) -> DataFrame:
    """AnalyzeSpark.sampleMostFrequentFromColumn (AnalyzeSpark.java:454)."""
    return (
        df.groupBy(column).agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col(column))
        .limit(n)
    )
