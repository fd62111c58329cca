"""Transform/condition/filter parity tests.

Fixtures mirror the reference's (FIXTURES.md §B1):
ExecutionTest.java:42-51 — col0: Integer, col1: Categorical{state0,1,2},
col2: Double; rows (0,"state2",0.1), (1,"state1",1.1), (2,"state0",2.1);
expected output of categoricalToInteger + doubleMathOp(Add 10.0) at :64-67.
"""

import pytest

from datavec_spark.operators.transforms import TransformProcess, register_custom
from datavec_spark.plans.schema import EngineSchema


@pytest.fixture(scope="module")
def b1(spark):
    return spark.createDataFrame(
        [(0, "state2", 0.1), (1, "state1", 1.1), (2, "state0", 2.1)],
        "col0 int, col1 string, col2 double",
    )


def test_execution_test_parity(spark, b1):
    # ExecutionTest.java:58-67: categoricalToInteger(col1) then Add 10.0 to col0
    tp = (
        TransformProcess()
        .add("categorical_to_integer", column="col1", states=["state0", "state1", "state2"])
        .add("math_op", column="col0", math_op="Add", scalar=10)
    )
    got = sorted(tuple(r) for r in tp(b1).collect())
    assert got == [(10, 2, 0.1), (11, 1, 1.1), (12, 0, 2.1)]


def test_json_roundtrip_equals(spark, b1):
    tp = (
        TransformProcess()
        .add("categorical_to_onehot", column="col1", states=["state0", "state1", "state2"])
        .add("math_function", column="col2", function="SQRT")
        .add("rename_columns", mapping={"col0": "id"})
    )
    tp2 = TransformProcess.from_json(tp.to_json())
    assert tp2.steps == tp.steps
    a = sorted(tuple(r) for r in tp(b1).collect())
    b = sorted(tuple(r) for r in tp2(b1).collect())
    assert a == b
    # one-hot columns replace the original in place, in order
    assert tp(b1).columns == ["id", "col1[state0]", "col1[state1]", "col1[state2]", "col2"]


def test_column_ops(spark, b1):
    tp = (
        TransformProcess()
        .add("duplicate_columns", columns=["col0"], new_names=["col0_copy"])
        .add("add_constant", column="c", value=5.0)
        .add("reorder_columns", columns=["col2", "col0"])
        .add("remove_columns", columns=["col1"])
    )
    out = tp(b1)
    assert out.columns == ["col2", "col0", "col0_copy", "c"]


def test_conditions_and_filter(spark, b1):
    tp = TransformProcess().add(
        "filter",
        condition={"op": "or", "args": [
            {"op": "<", "column": "col2", "value": 1.0},
            {"op": "in", "column": "col1", "value": ["state0"]},
        ]},
    )
    got = [r["col0"] for r in tp(b1).collect()]
    assert got == [1]  # rows 0 (col2<1) and 2 (state0) dropped


def test_conditional_replace_and_copy(spark, b1):
    tp = (
        TransformProcess()
        .add("conditional_replace", column="col0", value=-1,
             condition={"op": ">=", "column": "col2", "value": 2.0})
        .add("conditional_copy", column="col1", source="col1",
             condition={"op": "true"})
    )
    got = {r["col1"]: r["col0"] for r in tp(b1).collect()}
    assert got == {"state2": 0, "state1": 1, "state0": -1}


def test_string_ops(spark):
    df = spark.createDataFrame([("a b", "x,y"), ("C  d", "y,z")], "s string, l string")
    tp = (
        TransformProcess()
        .add("remove_whitespace", column="s")
        .add("change_case", column="s", mode="upper")
        .add("append_string", column="s", suffix="!")
        .add("string_list_to_categorical_set", column="l",
             categories=["x", "y", "z"], new_names=["has_x", "has_y", "has_z"])
        .add("string_list_to_counts", column="l", vocab=["x", "y", "z"], out="bow")
        .add("string_list_to_indices", column="l", vocab=["x", "y", "z"], out="idx")
    )
    rows = tp(df).collect()
    assert [r["s"] for r in rows] == ["AB!", "CD!"]
    assert [(r["has_x"], r["has_y"], r["has_z"]) for r in rows] == [(True, True, False), (False, True, True)]
    assert [r["bow"] for r in rows] == [[1.0, 1.0, 0.0], [0.0, 1.0, 1.0]]
    assert [r["idx"] for r in rows] == [[0, 1], [1, 2]]


def test_string_map_and_replace(spark):
    df = spark.createDataFrame([("cat",), ("dog",), ("cow",)], "a string")
    tp = (
        TransformProcess()
        .add("string_map", column="a", mapping={"cat": "feline"})
        .add("map_all_except", column="a", keep=["feline", "dog"], value="other")
    )
    assert [r["a"] for r in tp(df).collect()] == ["feline", "dog", "other"]


def test_integer_onehot_and_pivot(spark):
    df = spark.createDataFrame([(1, "k1", 10.0), (2, "k2", 20.0), (1, "k2", 5.0)],
                               "id int, key string, value double")
    oh = TransformProcess().add("integer_to_onehot", column="id", min_value=0, max_value=2)(df)
    assert oh.columns == ["id[0]", "id[1]", "id[2]", "key", "value"]
    pv = TransformProcess().add("pivot", key_column="key", value_column="value",
                                states=["k1", "k2"], default=0.0)(df)
    got = {r["id"]: (r["k1"], r["k2"]) for r in pv.collect()}
    assert got == {1: (10.0, 5.0), 2: (0.0, 20.0)}


def test_time_ops(spark):
    df = spark.createDataFrame([("2024-03-05 10:30:00",)], "t string")
    tp = (
        TransformProcess()
        .add("string_to_time", column="t", fmt="yyyy-MM-dd HH:mm:ss")
        .add("derive_columns_from_time", column="t", fields=["year", "month", "day", "hour"])
        .add("time_math_op", column="t", math_op="Add", quantity=2, unit="HOURS")
    )
    r = tp(df).collect()[0]
    assert (r["t_year"], r["t_month"], r["t_day"], r["t_hour"]) == (2024, 3, 5, 10)
    assert r["t"].hour == 12


def test_normalize_two_phase(spark):
    from datavec_spark.operators.transforms import normalizer_stats

    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,)], "x double")
    stats = normalizer_stats(df, "x")
    out = TransformProcess().add("normalize", column="x", mode="MinMax", stats=stats)(df)
    assert [r["x"] for r in out.collect()] == [0.0, 0.5, 1.0]
    out2 = TransformProcess().add("normalize", column="x", mode="Standardize", stats=stats)(df)
    vals = [r["x"] for r in out2.collect()]
    assert abs(vals[1]) < 1e-12 and abs(vals[0] + 1.0) < 1e-12


def test_array_ops_and_distance(spark):
    df = spark.createDataFrame([([1.0, 2.0], [3.0, 4.0])], "a array<double>, b array<double>")
    tp = (
        TransformProcess()
        .add("array_scalar_op", column="a", math_op="Multiply", scalar=2.0)
        .add("array_columns_op", out="s", math_op="Add", columns=["a", "b"])
        .add("array_distance", out="cos", distance="COSINE", col_a="a", col_b="b")
        .add("array_distance", out="eu", distance="EUCLIDEAN", col_a="a", col_b="b")
        .add("array_distance", out="man", distance="MANHATTAN", col_a="a", col_b="b")
    )
    r = tp(df).collect()[0]
    assert r["a"] == [2.0, 4.0] and r["s"] == [5.0, 8.0]
    import math

    assert abs(r["cos"] - (2 * 3 + 4 * 4) / (math.hypot(2, 4) * math.hypot(3, 4))) < 1e-9
    assert abs(r["eu"] - math.hypot(1, 0)) < 1e-9 and abs(r["man"] - 1.0) < 1e-9


def test_schema_validity_and_filter_invalid(spark):
    schema = (
        EngineSchema.builder()
        .add_string("name", regex="[a-z]+")
        .add_integer("age", min_value=0, max_value=150)
        .add_double("score")
        .build()
    )
    df = spark.createDataFrame(
        [("bob", 30, 1.0), ("X9", 30, 1.0), ("ann", -5, 1.0), ("cat", 10, float("nan")), (None, 1, 1.0)],
        schema.to_struct(),
    )
    out = schema.filter_invalid(df)
    assert [r["name"] for r in out.collect()] == ["bob"]
    # schema JSON round-trip preserves restrictions
    s2 = EngineSchema.from_json(schema.to_json())
    assert s2.column("age").restrictions == {"min_value": 0, "max_value": 150}


def test_schema_propagation_without_execution(spark):
    tp = (
        TransformProcess()
        .add("categorical_to_onehot", column="col1", states=["a", "b"])
        .add("cast", column="col0", to="double")
    )
    dtypes = tp.schema_after(spark, "col0 int, col1 string, col2 double")
    assert dtypes == [("col0", "double"), ("col1[a]", "int"), ("col1[b]", "int"), ("col2", "double")]


def test_custom_vectorized_op(spark, b1):
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def double_it(s: pd.Series) -> pd.Series:
        return s * 2

    register_custom("double_col2", lambda df: df.withColumn("col2", double_it(F.col("col2"))))
    tp = TransformProcess().add("custom", name="double_col2")
    got = sorted(round(r["col2"], 6) for r in tp(b1).collect())
    assert got == [0.2, 2.2, 4.2]
    assert "custom" in tp.to_json()
