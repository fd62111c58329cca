"""Condition spec → Column expression.

DataVec Conditions (transform/condition/*) are boolean row predicates built
from typed per-column comparisons (ConditionOp.java:24-140: LessThan,
LessOrEqual, GreaterThan, GreaterOrEqual, Equal, NotEqual, InSet, NotInSet)
plus NaN/Infinite/Null/Regex checks, composed with AND/OR/NOT/XOR trees
(BooleanCondition.java:36,83). Here a condition is a JSON-able dict compiled
to a native Column — evaluated in whole-stage codegen, never per-row Python.

Spec grammar:
  {"op": "<", "column": c, "value": v}          # < <= > >= == != in notin
  {"op": "isnull" | "notnull" | "isnan" | "isinf", "column": c}
  {"op": "regex", "column": c, "value": pattern}
  {"op": "invalid", "column": c, "schema": EngineSchema-json}  # fails restrictions
  {"op": "and"|"or"|"xor", "args": [spec, ...]}
  {"op": "not", "args": [spec]}
  {"op": "true"}                                 # TrivialColumnCondition
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CMP = {
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
}


def condition_expr(spec: dict) -> Column:
    op = spec["op"]
    if op in _CMP:
        return _CMP[op](F.col(spec["column"]), F.lit(spec["value"]))
    if op == "in":
        return F.col(spec["column"]).isin(*spec["value"])
    if op == "notin":
        return ~F.col(spec["column"]).isin(*spec["value"])
    if op == "isnull":
        return F.col(spec["column"]).isNull()
    if op == "notnull":
        return F.col(spec["column"]).isNotNull()
    if op == "isnan":
        return F.isnan(F.col(spec["column"]))
    if op == "isinf":
        return F.col(spec["column"]).isin(float("inf"), float("-inf"))
    if op == "regex":
        return F.col(spec["column"]).rlike(spec["value"])
    if op == "invalid":
        from datavec_spark.plans.schema import EngineSchema

        schema = EngineSchema.from_json(spec["schema"]) if isinstance(spec["schema"], str) else spec["schema"]
        col = schema.column(spec["column"])
        return F.col(spec["column"]).isNull() | ~col.validity_expr()
    if op == "true":
        return F.lit(True)
    if op in ("and", "or", "xor"):
        parts = [condition_expr(s) for s in spec["args"]]
        out = parts[0]
        for p in parts[1:]:
            out = out & p if op == "and" else (out | p if op == "or" else out != p)
        return out
    if op == "not":
        return ~condition_expr(spec["args"][0])
    raise ValueError(f"unknown condition op: {op}")
