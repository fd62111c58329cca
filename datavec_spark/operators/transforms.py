"""TransformProcess: an ordered, JSON-round-trippable chain of declarative
ops compiled to native DataFrame transformations.

DataVec's TransformProcess (transform/TransformProcess.java:101) is an
ordered List<DataAction> executed row-at-a-time over boxed Writables; here
every step lowers to Column expressions (whole-stage codegen) — schema
propagation is df.schema, optimization is Catalyst's. The op names and
semantics mirror the reference operator inventory (SURVEY.md §2.3/2.4/2.9,
builder sugar TransformProcess.java:680-1453); serde mirrors
transform/serde/JsonSerializer.java:35.

Per-row Python is never used: custom ops register vectorized pandas_udf /
mapInPandas callables via `register_custom` (the Transform.java:122
extension point, Arrow-batched instead of per-record).
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datavec_spark.operators.conditions import condition_expr

OPS: dict[str, Callable] = {}
_CUSTOM: dict[str, Callable[[DataFrame], DataFrame]] = {}


def op(name: str):
    def deco(fn):
        OPS[name] = fn
        return fn

    return deco


def register_custom(name: str, fn: Callable[[DataFrame], DataFrame]) -> None:
    """Register a custom vectorized op (pandas_udf / mapInPandas-backed).
    Referenced from a chain as {"op": "custom", "name": name} — the spec
    stays serializable; the callable is resolved from this registry at
    execution time (mirrors DataVec's classpath scanning registry,
    TransformProcess.java:483-584)."""
    _CUSTOM[name] = fn


# ---------------------------------------------------------------------------
# column ops (§2.3)
# ---------------------------------------------------------------------------


@op("remove_columns")  # RemoveColumnsTransform.java:38
def _remove_columns(df, columns):
    return df.drop(*columns)


@op("keep_columns")  # RemoveAllColumnsExceptForTransform.java:39
def _keep_columns(df, columns):
    return df.select(*columns)


@op("rename_columns")  # RenameColumnsTransform.java:37
def _rename_columns(df, mapping):
    return df.withColumnsRenamed(mapping)


@op("reorder_columns")  # ReorderColumnsTransform.java:39 (unspecified go last)
def _reorder_columns(df, columns):
    rest = [c for c in df.columns if c not in columns]
    return df.select(*columns, *rest)


@op("duplicate_columns")  # DuplicateColumnsTransform.java:40
def _duplicate_columns(df, columns, new_names):
    return df.withColumns({n: F.col(c) for c, n in zip(columns, new_names)})


@op("add_constant")  # AddConstantColumnTransform.java:36
def _add_constant(df, column, value, col_type="double"):
    return df.withColumn(column, F.lit(value).cast(col_type))


@op("cast")  # ConvertToString/Double/Integer (transform/string/ConvertToString.java:13 etc.)
def _cast(df, column, to):
    return df.withColumn(column, F.col(column).cast(to))


@op("parse_double")  # ParseDoubleTransform.java:18
def _parse_double(df, column):
    return df.withColumn(column, F.col(column).cast("double"))


# ---------------------------------------------------------------------------
# math (§2.9; MathOp.java:34-36, MathFunction.java:24-26)
# ---------------------------------------------------------------------------

_MATH_OPS = {
    "Add": lambda c, s: c + s,
    "Subtract": lambda c, s: c - s,
    "Multiply": lambda c, s: c * s,
    "Divide": lambda c, s: c / s,
    "Modulus": lambda c, s: c % s,
    "ReverseSubtract": lambda c, s: s - c,
    "ReverseDivide": lambda c, s: s / c,
    "ScalarMin": lambda c, s: F.least(c, s),
    "ScalarMax": lambda c, s: F.greatest(c, s),
}

_MATH_FNS = {
    "ABS": F.abs, "ACOS": F.acos, "ASIN": F.asin, "ATAN": F.atan, "CEIL": F.ceil,
    "COS": F.cos, "COSH": F.cosh, "EXP": F.exp, "FLOOR": F.floor, "LOG": F.log,
    "LOG10": F.log10, "SIGNUM": F.signum, "SIN": F.sin, "SINH": F.sinh,
    "SQRT": F.sqrt, "TAN": F.tan, "TANH": F.tanh,
}


@op("math_op")  # DoubleMathOpTransform.java:37 / Integer/Long variants
def _math_op(df, column, math_op, scalar, out=None):
    dt = dict(df.dtypes)[column]
    c = _MATH_OPS[math_op](F.col(column), F.lit(scalar))
    return df.withColumn(out or column, c.cast(dt) if math_op not in ("Divide", "ReverseDivide") else c)


@op("columns_math_op")  # BaseColumnsMathOpTransform.java:59 (n-ary over columns)
def _columns_math_op(df, out, math_op, columns):
    acc = F.col(columns[0])
    for c in columns[1:]:
        acc = _MATH_OPS[math_op](acc, F.col(c))
    return df.withColumn(out, acc)


@op("math_function")  # DoubleMathFunctionTransform.java:32
def _math_function(df, column, function, out=None):
    return df.withColumn(out or column, _MATH_FNS[function](F.col(column)))


# ---------------------------------------------------------------------------
# replace / conditional edits (§2.9)
# ---------------------------------------------------------------------------


@op("replace_empty")  # ReplaceEmptyIntegerWithValueTransform.java:30 / ReplaceEmptyStringTransform.java:30
def _replace_empty(df, column, value):
    c = F.col(column)
    return df.withColumn(column, F.when(c.isNull() | (c.cast("string") == ""), F.lit(value)).otherwise(c))


@op("replace_invalid")  # ReplaceInvalidWithIntegerTransform.java:26
def _replace_invalid(df, column, value, schema_json):
    from datavec_spark.plans.schema import EngineSchema

    spec = EngineSchema.from_json(schema_json).column(column)
    c = F.col(column)
    return df.withColumn(column, F.when(c.isNull() | ~spec.validity_expr(), F.lit(value)).otherwise(c))


@op("conditional_replace")  # ConditionalReplaceValueTransform.java:44
def _conditional_replace(df, column, condition, value):
    return df.withColumn(column, F.when(condition_expr(condition), F.lit(value)).otherwise(F.col(column)))


@op("conditional_replace_with_default")  # ConditionalReplaceValueTransformWithDefault.java:46
def _conditional_replace_with_default(df, column, condition, yes_value, no_value):
    return df.withColumn(column, F.when(condition_expr(condition), F.lit(yes_value)).otherwise(F.lit(no_value)))


@op("conditional_copy")  # ConditionalCopyValueTransform.java:48
def _conditional_copy(df, column, source, condition):
    return df.withColumn(column, F.when(condition_expr(condition), F.col(source)).otherwise(F.col(column)))


# ---------------------------------------------------------------------------
# filters (§2.4)
# ---------------------------------------------------------------------------


@op("filter")  # ConditionFilter.java:37 — drop rows where condition TRUE
def _filter(df, condition):
    cond = condition_expr(condition)
    # null comparison results must count as "condition false" → keep
    return df.where(~F.coalesce(cond, F.lit(False)))


@op("filter_invalid")  # FilterInvalidValues.java:35
def _filter_invalid(df, schema_json, columns=None):
    from datavec_spark.plans.schema import EngineSchema

    return EngineSchema.from_json(schema_json).filter_invalid(df, columns)


# ---------------------------------------------------------------------------
# strings (§2.9)
# ---------------------------------------------------------------------------


@op("append_string")  # AppendStringColumnTransform.java:34
def _append_string(df, column, suffix):
    return df.withColumn(column, F.concat(F.col(column), F.lit(suffix)))


@op("change_case")  # ChangeCaseStringTransform.java:12
def _change_case(df, column, mode="lower"):
    return df.withColumn(column, F.lower(F.col(column)) if mode == "lower" else F.upper(F.col(column)))


@op("concat_columns")  # ConcatenateStringColumns.java:27
def _concat_columns(df, out, columns, delimiter=""):
    return df.withColumn(out, F.concat_ws(delimiter, *[F.col(c) for c in columns]))


@op("remove_whitespace")  # RemoveWhiteSpaceTransform.java:30
def _remove_whitespace(df, column):
    return df.withColumn(column, F.regexp_replace(F.col(column), r"\s", ""))


@op("replace_string")  # ReplaceStringTransform.java:16 — ordered regex map
def _replace_string(df, column, replacements):
    c = F.col(column)
    for pat, rep in replacements:
        c = F.regexp_replace(c, pat, rep)
    return df.withColumn(column, c)


@op("string_map")  # StringMapTransform.java:38 — exact-value dictionary
def _string_map(df, column, mapping):
    pairs = [x for kv in mapping.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    m = F.create_map(*pairs)
    c = F.col(column)
    return df.withColumn(column, F.coalesce(F.element_at(m, c), c))


@op("map_all_except")  # MapAllStringsExceptListTransform.java:32
def _map_all_except(df, column, keep, value):
    c = F.col(column)
    return df.withColumn(column, F.when(c.isin(*keep), c).otherwise(F.lit(value)))


@op("string_list_to_categorical_set")  # StringListToCategoricalSetTransform.java:41
def _string_list_to_categorical_set(df, column, categories, new_names, delimiter=","):
    arr = F.split(F.col(column), delimiter)
    return df.withColumns({n: F.array_contains(arr, cat) for cat, n in zip(categories, new_names)})


@op("string_list_to_counts")  # StringListToCountsNDArrayTransform.java:29 (bag-of-words counts)
def _string_list_to_counts(df, column, vocab, out, delimiter=","):
    arr = F.split(F.col(column), delimiter)

    def count_of(v):
        return F.size(F.filter(arr, lambda x: x == F.lit(v))).cast("double")

    return df.withColumn(out, F.array(*[count_of(v) for v in vocab]))


@op("string_list_to_indices")  # StringListToIndicesNDArrayTransform.java:20
def _string_list_to_indices(df, column, vocab, out, delimiter=","):
    idx = F.map_from_arrays(
        F.array(*[F.lit(v) for v in vocab]), F.array(*[F.lit(i) for i in range(len(vocab))])
    )
    arr = F.split(F.col(column), delimiter)
    return df.withColumn(out, F.transform(arr, lambda x: F.element_at(idx, x)))


# ---------------------------------------------------------------------------
# categorical (§2.9)
# ---------------------------------------------------------------------------


@op("categorical_to_integer")  # CategoricalToIntegerTransform.java:37 — schema state order, NOT frequency
def _categorical_to_integer(df, column, states):
    c = F.col(column)
    out = F.lit(None).cast("int")
    for i, s in enumerate(states):
        out = F.when(c == s, F.lit(i)).otherwise(out)
    return df.withColumn(column, out)


@op("categorical_to_onehot")  # CategoricalToOneHotTransform.java:37
def _categorical_to_onehot(df, column, states):
    cols = {f"{column}[{s}]": (F.col(column) == s).cast("int") for s in states}
    pos = df.columns.index(column)
    names = df.columns[:pos] + list(cols) + df.columns[pos + 1 :]
    return df.withColumns(cols).select(*names)


@op("integer_to_categorical")  # IntegerToCategoricalTransform.java:35
def _integer_to_categorical(df, column, states):
    c = F.col(column)
    out = F.lit(None).cast("string")
    for i, s in enumerate(states):
        out = F.when(c == i, F.lit(s)).otherwise(out)
    return df.withColumn(column, out)


@op("integer_to_onehot")  # IntegerToOneHotTransform.java:43
def _integer_to_onehot(df, column, min_value, max_value):
    cols = {f"{column}[{v}]": (F.col(column) == v).cast("int") for v in range(min_value, max_value + 1)}
    pos = df.columns.index(column)
    names = df.columns[:pos] + list(cols) + df.columns[pos + 1 :]
    return df.withColumns(cols).select(*names)


@op("pivot")  # PivotTransform.java:46
def _pivot(df, key_column, value_column, states, default=None, agg="first"):
    """agg: cell aggregate when a (group, state) has several rows — the
    reference keeps the first encountered (order-dependent); min/max/sum/
    count give deterministic cells under parallel execution."""
    agg_fn = {"first": F.first, "min": F.min, "max": F.max,
              "sum": F.sum, "count": F.count}[agg]
    others = [c for c in df.columns if c not in (key_column, value_column)]
    out = df.groupBy(*others).pivot(key_column, states).agg(agg_fn(value_column))
    if default is not None:
        out = out.fillna(default, subset=states)
    return out


# ---------------------------------------------------------------------------
# time (§2.9)
# ---------------------------------------------------------------------------


@op("string_to_time")  # StringToTimeTransform.java:41
def _string_to_time(df, column, fmt=None):
    return df.withColumn(column, F.to_timestamp(F.col(column), fmt) if fmt else F.to_timestamp(F.col(column)))


@op("time_math_op")  # TimeMathOpTransform.java:39 (Add/Subtract quantity·unit)
def _time_math_op(df, column, math_op, quantity, unit):
    n = quantity if math_op == "Add" else -quantity
    return df.withColumn(column, F.col(column) + F.expr(f"INTERVAL {n} {unit}"))


_TIME_FIELDS = {
    "year": F.year, "month": F.month, "day": F.dayofmonth, "hour": F.hour,
    "minute": F.minute, "second": F.second, "dayofweek": F.dayofweek,
    "dayofyear": F.dayofyear, "weekofyear": F.weekofyear,
}


@op("derive_columns_from_time")  # DeriveColumnsFromTimeTransform.java:58
def _derive_columns_from_time(df, column, fields):
    return df.withColumns({f"{column}_{f}": _TIME_FIELDS[f](F.col(column)) for f in fields})


# ---------------------------------------------------------------------------
# normalizers (§2.9; Normalize.java:32) — two-phase: stats df.agg → expression
# ---------------------------------------------------------------------------


def normalizer_stats(df: DataFrame, column: str) -> dict:
    """Phase-1 analysis (DataVec: pulled from DataAnalysis,
    TransformProcess.java:1039-1083): single distributed agg pass."""
    r = df.agg(
        F.min(column).alias("min"),
        F.max(column).alias("max"),
        F.mean(column).alias("mean"),
        F.stddev_samp(column).alias("std"),
    ).collect()[0]
    return {"min": r["min"], "max": r["max"], "mean": r["mean"], "std": r["std"]}


@op("normalize")
def _normalize(df, column, mode, stats, new_min=0.0, new_max=1.0):
    c = F.col(column)
    mn, mx, mean, std = stats.get("min"), stats.get("max"), stats.get("mean"), stats.get("std")
    if mode == "MinMax":  # MinMaxNormalizer.java:34
        e = (c - mn) / (mx - mn) * (new_max - new_min) + new_min
    elif mode == "MinMax2":  # scale to [-1, 1]
        e = (c - mn) / (mx - mn) * 2.0 - 1.0
    elif mode == "Standardize":  # StandardizeNormalizer.java:29
        e = (c - mean) / std
    elif mode == "SubtractMean":  # SubtractMeanNormalizer.java:26
        e = c - mean
    elif mode == "Log2Mean":  # Log2Normalizer.java:32
        e = F.log2((c - mean) / std + 1.0 + 1e-9)
    else:
        raise ValueError(f"unknown normalize mode {mode}")
    return df.withColumn(column, e)


# ---------------------------------------------------------------------------
# array / NDArray ops (§2.9) — native array exprs, pandas UDF only if needed
# ---------------------------------------------------------------------------


@op("array_scalar_op")  # NDArrayScalarOpTransform.java:36
def _array_scalar_op(df, column, math_op, scalar):
    f = _MATH_OPS[math_op]
    return df.withColumn(column, F.transform(F.col(column), lambda x: f(x, F.lit(scalar))))


@op("array_columns_op")  # NDArrayColumnsMathOpTransform.java:40
def _array_columns_op(df, out, math_op, columns):
    f = _MATH_OPS[math_op]
    acc = F.col(columns[0])
    for c in columns[1:]:
        acc = F.zip_with(acc, F.col(c), lambda a, b: f(a, b))
    return df.withColumn(out, acc)


@op("array_math_function")  # NDArrayMathFunctionTransform.java:35
def _array_math_function(df, column, function):
    f = _MATH_FNS[function]
    return df.withColumn(column, F.transform(F.col(column), lambda x: f(x)))


@op("array_distance")  # NDArrayDistanceTransform.java:42 (Distance.java:22)
def _array_distance(df, out, distance, col_a, col_b):
    a, b = F.col(col_a), F.col(col_b)
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    if distance == "COSINE":
        na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
        nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
        e = dot / (na * nb)
    elif distance == "EUCLIDEAN":
        e = F.sqrt(F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, x: s + x))
    elif distance == "MANHATTAN":
        e = F.aggregate(F.zip_with(a, b, lambda x, y: F.abs(x - y)), F.lit(0.0), lambda s, x: s + x)
    else:
        raise ValueError(f"unknown distance {distance}")
    return df.withColumn(out, e)


# ---------------------------------------------------------------------------
# geo (§2.9, datavec-geo): "lat:lon" string coordinates
# ---------------------------------------------------------------------------


@op("coordinates_distance")  # CoordinatesDistanceTransform.java:38
def _coordinates_distance(df, out, col_a, col_b, stddev_col=None, delimiter=":"):
    """Euclidean distance between delimiter-split coordinate strings of any
    dimensionality; with stddev_col each component difference is scaled by
    the matching stddev component first (the reference's semantics —
    TestGeoTransforms.java: point=-30, mean=20, stddev=10 → 5.0;
    '50|40' vs '10|-20' with stddev '10|5' → sqrt(160))."""
    to_arr = lambda c: F.transform(F.split(F.col(c), delimiter), lambda x: x.cast("double"))
    a, b = to_arr(col_a), to_arr(col_b)
    diff = F.zip_with(a, b, lambda x, y: x - y)
    if stddev_col is not None:
        diff = F.zip_with(diff, to_arr(stddev_col), lambda d, s: d / s)
    return df.withColumn(
        out, F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, d: acc + d * d)))


# ---------------------------------------------------------------------------
# custom escape hatch
# ---------------------------------------------------------------------------


@op("custom")
def _custom(df, name):
    return _CUSTOM[name](df)


# ---------------------------------------------------------------------------
# the chain
# ---------------------------------------------------------------------------


class TransformProcess:
    """Ordered op chain; apply with tp(df). JSON round-trip: to_json/from_json."""

    def __init__(self, steps: list[dict] | None = None):
        self.steps = steps or []

    def add(self, op_name: str, **params) -> "TransformProcess":
        if op_name not in OPS:
            raise ValueError(f"unknown op: {op_name}")
        self.steps.append({"op": op_name, **params})
        return self

    def __call__(self, df: DataFrame) -> DataFrame:
        for step in self.steps:
            params = {k: v for k, v in step.items() if k != "op"}
            df = OPS[step["op"]](df, **params)
        return df

    apply = __call__

    def schema_after(self, spark, input_struct) -> "list[tuple[str, str]]":
        """Schema propagation without executing (getSchemaAfterStep parity):
        run the chain over an empty DataFrame — Catalyst analysis threads
        the schema; nothing is computed."""
        empty = spark.createDataFrame([], input_struct)
        return self(empty).dtypes

    def to_json(self) -> str:
        return json.dumps({"steps": self.steps})

    @classmethod
    def from_json(cls, s: str) -> "TransformProcess":
        steps = json.loads(s)["steps"]
        # validate at deserialization, same contract as add() — a bad spec
        # must fail where it enters (e.g. the REST server returns 400 on
        # POST /transformprocess), not on the first record it transforms
        for step in steps:
            if step.get("op") not in OPS:
                raise ValueError(f"unknown op: {step.get('op')}")
        return cls(steps)
