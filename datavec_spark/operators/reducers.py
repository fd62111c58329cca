"""Reducer: group-by-key multi-op aggregation (DataVec IAssociativeReducer).

Reference semantics (transform/reduce/Reducer.java:54): group on key
columns, apply one or MORE ReduceOps per value column
(ReduceOp.java:42-52: Prod Min Max Range Append Prepend Sum Mean Stdev
UncorrectedStdDev Variance PopulationVariance Count CountUnique TakeFirst
TakeLast), optionally conditioned (reduce only rows passing a Condition,
Reducer.java:61,134-148). Output columns are named "op(col)"
(Reducer.java:163-165) unless aliased.

Spark lowering: a single groupBy().agg(...) — partial aggregation
(map-side combine) replaces the reference's aggregateByKey accumulators
(SparkTransformExecutor.java:252-291) and native multi-column grouping
replaces its string-concatenated keys (MapToPairForReducerFunction.java:30-53).
TakeFirst/TakeLast are made deterministic with min_by/max_by over an
explicit order column when given (the LWW resolver of the CDC engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datavec_spark.operators.conditions import condition_expr
from datavec_spark.operators.transforms import op


def _agg_expr(reduce_op: str, column: str, cond: Column | None, order_col: str | None, rsd: float) -> Column:
    c = F.col(column)
    if cond is not None:
        c = F.when(cond, c)  # conditional reduction: nulls ignored by aggs
    if reduce_op == "Sum":
        return F.sum(c)
    if reduce_op == "Prod":
        return F.product(c)
    if reduce_op == "Min":
        return F.min(c)
    if reduce_op == "Max":
        return F.max(c)
    if reduce_op == "Range":
        return F.max(c) - F.min(c)
    if reduce_op == "Mean":
        return F.mean(c)
    if reduce_op == "Stdev":
        return F.stddev_samp(c)
    if reduce_op == "UncorrectedStdDev":
        return F.stddev_pop(c)
    if reduce_op == "Variance":
        return F.var_samp(c)
    if reduce_op == "PopulationVariance":
        return F.var_pop(c)
    if reduce_op == "Count":
        return F.count(c)
    if reduce_op == "CountUnique":
        return F.approx_count_distinct(c, rsd)  # HLL++, AggregatorImpls.java:483-487
    if reduce_op == "CountUniqueExact":
        return F.count_distinct(c)
    if reduce_op == "TakeFirst":
        return F.min_by(c, F.col(order_col)) if order_col else F.first(c, ignorenulls=False)
    if reduce_op == "TakeLast":
        return F.max_by(c, F.col(order_col)) if order_col else F.last(c, ignorenulls=False)
    if reduce_op == "Append":  # StringAggregatorImpls.java:19
        # value aliased inside the struct: with a condition, c is an unnamed
        # F.when(...) expression and getField(column) would not resolve
        return F.concat_ws("", F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("_o"), c.alias(column)))).getField(column)) \
            if order_col else F.concat_ws("", F.collect_list(c))
    if reduce_op == "Prepend":  # StringAggregatorImpls.java:41
        return F.concat_ws("", F.reverse(F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("_o"), c.alias(column)))).getField(column))) \
            if order_col else F.concat_ws("", F.reverse(F.collect_list(c)))
    raise ValueError(f"unknown reduce op: {reduce_op}")


def reduce_by_key(
    df: DataFrame,
    key_columns: list[str],
    ops: dict[str, list[str] | str],
    condition: dict | None = None,
    order_col: str | None = None,
    rsd: float = 0.05,
    aliases: dict[str, str] | None = None,
) -> DataFrame:
    """ops: {column: [reduce_op, ...]}. Output names "op(col)" or aliases."""
    cond = condition_expr(condition) if condition else None
    aliases = aliases or {}
    aggs = []
    for column, col_ops in ops.items():
        if isinstance(col_ops, str):
            col_ops = [col_ops]
        for r in col_ops:
            name = aliases.get(f"{r}({column})", f"{r.lower()}({column})")
            aggs.append(_agg_expr(r, column, cond, order_col, rsd).alias(name))
    return df.groupBy(*key_columns).agg(*aggs)


@op("reduce")
def _reduce_op(df, key_columns, ops, condition=None, order_col=None, rsd=0.05, aliases=None):
    return reduce_by_key(df, key_columns, ops, condition, order_col, rsd, aliases)


@op("geographic_midpoint")  # GeographicMidpointReduction.java:41
def _geographic_midpoint(df, key_columns, lat_col, lon_col, out_lat="midpoint_lat", out_lon="midpoint_lon"):
    """Geographic mean: average the unit vectors on the sphere, convert back."""
    lat = F.radians(F.col(lat_col))
    lon = F.radians(F.col(lon_col))
    agg = df.groupBy(*key_columns).agg(
        F.mean(F.cos(lat) * F.cos(lon)).alias("_x"),
        F.mean(F.cos(lat) * F.sin(lon)).alias("_y"),
        F.mean(F.sin(lat)).alias("_z"),
    )
    hyp = F.sqrt(F.col("_x") ** 2 + F.col("_y") ** 2)
    return agg.select(
        *key_columns,
        F.degrees(F.atan2(F.col("_z"), hyp)).alias(out_lat),
        F.degrees(F.atan2(F.col("_y"), F.col("_x"))).alias(out_lon),
    )
