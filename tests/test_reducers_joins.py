"""Reducer + Join parity tests.

Reducer fixture mirrors TestMultiOpReduce (FIXTURES.md §B4); join fixture
mirrors datavec-spark TestJoin.java:40-57 — customerInfo(customerID,
customerName) × purchases(purchaseID, customerID, amount), one customer
with no purchases, all four join types (TestJoin.java:183-232).
"""

import math

import pytest

from datavec_spark.operators.joins import join
from datavec_spark.operators.reducers import reduce_by_key


@pytest.fixture(scope="module")
def b4(spark):
    return spark.createDataFrame(
        [
            ("a", 1, 1.0, "x", 10),
            ("a", 2, 2.0, "y", 20),
            ("a", 3, 3.0, "x", 30),
            ("b", 10, 10.0, "z", 40),
        ],
        "key string, intCol int, doubleCol double, textCol string, seq int",
    )


def test_multi_op_reduce(spark, b4):
    out = reduce_by_key(
        b4,
        ["key"],
        {"intCol": ["Min", "Max", "Sum", "Mean", "Range", "Count"],
         "doubleCol": ["Stdev", "Variance", "PopulationVariance", "UncorrectedStdDev"],
         "textCol": ["CountUniqueExact"]},
    )
    r = {row["key"]: row for row in out.collect()}
    a = r["a"]
    assert (a["min(intCol)"], a["max(intCol)"], a["sum(intCol)"]) == (1, 3, 6)
    assert a["mean(intCol)"] == 2.0 and a["range(intCol)"] == 2 and a["count(intCol)"] == 3
    assert abs(a["stdev(doubleCol)"] - 1.0) < 1e-12
    assert abs(a["variance(doubleCol)"] - 1.0) < 1e-12
    assert abs(a["populationvariance(doubleCol)"] - 2.0 / 3.0) < 1e-12
    assert abs(a["uncorrectedstddev(doubleCol)"] - math.sqrt(2.0 / 3.0)) < 1e-12
    assert a["countuniqueexact(textCol)"] == 2
    assert r["b"]["sum(intCol)"] == 10


def test_take_first_last_by_order(spark, b4):
    out = reduce_by_key(b4, ["key"], {"textCol": ["TakeFirst", "TakeLast"]}, order_col="seq")
    r = {row["key"]: (row["takefirst(textCol)"], row["takelast(textCol)"]) for row in out.collect()}
    assert r["a"] == ("x", "x") and r["b"] == ("z", "z")


def test_append_prepend_ordered(spark, b4):
    out = reduce_by_key(b4, ["key"], {"textCol": ["Append", "Prepend"]}, order_col="seq")
    r = {row["key"]: (row["append(textCol)"], row["prepend(textCol)"]) for row in out.collect()}
    assert r["a"] == ("xyx", "xyx"[::-1])


def test_conditional_reduction(spark, b4):
    # Reducer.java:61,134-148: reduce only rows passing the condition
    out = reduce_by_key(
        b4, ["key"], {"intCol": ["Sum"]},
        condition={"op": ">", "column": "doubleCol", "value": 1.5},
    )
    r = {row["key"]: row["sum(intCol)"] for row in out.collect()}
    assert r == {"a": 5, "b": 10}


@pytest.fixture(scope="module")
def join_fixture(spark):
    customers = spark.createDataFrame(
        [(12345, "First"), (23456, "Second"), (34567, "Third")],
        "customerID long, customerName string",
    )
    purchases = spark.createDataFrame(
        [(1000000, 12345, 10.0), (1000001, 12345, 20.0), (1000002, 23456, 30.0)],
        "purchaseID long, customerID long, amount double",
    )
    return customers, purchases


def test_join_types(spark, join_fixture):
    customers, purchases = join_fixture
    inner = join(customers, purchases, "Inner", ["customerID"])
    assert inner.columns == ["customerID", "customerName", "purchaseID", "amount"]
    assert inner.count() == 3

    left = join(customers, purchases, "LeftOuter", ["customerID"])
    rows = {(r["customerID"], r["purchaseID"]) for r in left.collect()}
    assert (34567, None) in rows and len(rows) == 4  # null padding

    right = join(purchases, customers, "RightOuter", ["customerID"])
    assert right.count() == 4

    full = join(customers, purchases, "FullOuter", ["customerID"])
    assert full.count() == 4


def test_join_key_coalesce_on_full_outer(spark):
    # key must come from the non-null side (Join.java:214-265)
    l = spark.createDataFrame([(1, "a")], "k long, lv string")
    r = spark.createDataFrame([(2, "b")], "k long, rv string")
    out = join(l, r, "FullOuter", ["k"])
    got = {row["k"]: (row["lv"], row["rv"]) for row in out.collect()}
    assert got == {1: ("a", None), 2: (None, "b")}


def test_broadcast_join_plan(spark, join_fixture):
    customers, purchases = join_fixture
    out = join(purchases, customers, "Inner", ["customerID"], broadcast_right=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_geographic_midpoint(spark):
    from datavec_spark.operators.reducers import _geographic_midpoint

    df = spark.createDataFrame(
        [("g", 0.0, 10.0), ("g", 0.0, 20.0)], "k string, lat double, lon double"
    )
    r = _geographic_midpoint(df, ["k"], "lat", "lon").collect()[0]
    assert abs(r["midpoint_lat"]) < 1e-9 and abs(r["midpoint_lon"] - 15.0) < 1e-9


def test_append_with_condition_and_order(spark):
    # regression: condition + order_col — value must be aliased inside the
    # sort struct or getField(column) cannot resolve (reducers.py Append)
    from datavec_spark.operators.reducers import reduce_by_key

    df = spark.createDataFrame(
        [("k", 3, "c"), ("k", 1, "a"), ("k", 2, "b"), ("k", 4, "skip")],
        "key string, t int, s string")
    out = reduce_by_key(
        df, ["key"], {"s": ["Append"]},
        condition={"op": "!=", "column": "s", "value": "skip"},
        order_col="t", aliases={"Append(s)": "joined"})
    assert out.collect()[0]["joined"] == "abc"

    out2 = reduce_by_key(
        df, ["key"], {"s": ["Prepend"]},
        condition={"op": "!=", "column": "s", "value": "skip"},
        order_col="t", aliases={"Prepend(s)": "joined"})
    assert out2.collect()[0]["joined"] == "cba"


def test_asof_join_semantics(spark):
    """Inclusive as-of: a right row AT the left ts matches; later rights
    don't; no-prior-right rows yield NULLs; each left row gets exactly the
    latest qualifying right row per key."""
    import datetime as dt

    from pyspark.sql import functions as F

    from datavec_spark.operators.joins import asof_join

    t = lambda s: dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)
    left = spark.createDataFrame(
        [(1, t(10), "a"), (1, t(5), "b"), (2, t(100), "c"), (3, t(50), "d")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t(5), 1.0), (1, t(8), 2.0), (1, t(11), 3.0), (2, t(100), 7.0)],
        "k long, ts timestamp, v double",
    )
    out = {r["tag"]: r for r in asof_join(left, right, ["k"], "ts", ["v"]).collect()}
    assert out["a"]["asof_v"] == 2.0 and out["a"]["asof_ts"] == t(8)
    assert out["b"]["asof_v"] == 1.0  # exact-ts right row matches (inclusive)
    assert out["c"]["asof_v"] == 7.0 and out["c"]["asof_ts"] == t(100)
    assert out["d"]["asof_v"] is None and out["d"]["asof_ts"] is None
