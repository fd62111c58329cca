"""Schema registry: DataVec Schema/ColumnMetaData semantics on StructType.

The runtime schema is always `df.schema` (Catalyst threads it for free —
replacing TransformProcess.getSchemaAfterStep, TransformProcess.java:182-221).
What DataVec adds on top of Spark's StructType is **validity restrictions**
per column (transform/metadata/*.java) used by quality analysis and
FilterInvalidValues; here each ColumnSpec compiles its restrictions to a
boolean Column expression (evaluated JVM-side, no Python).

Column types mirror transform/ColumnType.java:24-26: String, Integer, Long,
Double, Float, Categorical, Time, Bytes, Boolean, NDArray — mapped to native
Spark types (Categorical = string + domain, Time = timestamp, NDArray =
array<double>). JSON round-trip mirrors Schema.toJson/fromJson
(transform/schema/Schema.java:320-382).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

COLUMN_TYPES = {
    "string": T.StringType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "categorical": T.StringType(),
    "time": T.TimestampType(),
    "bytes": T.BinaryType(),
    "boolean": T.BooleanType(),
    "ndarray": T.ArrayType(T.DoubleType()),
}


@dataclass
class ColumnSpec:
    """One column + validity restrictions (ColumnMetaData.isValid,
    transform/metadata/ColumnMetaData.java:45-89)."""

    name: str
    col_type: str  # key of COLUMN_TYPES
    restrictions: dict[str, Any] = field(default_factory=dict)
    # string: regex, min_length, max_length
    # integer/long/double/float: min_value, max_value; double/float: allow_nan, allow_infinite
    # categorical: states (list)
    # time: min_millis, max_millis

    def spark_type(self) -> T.DataType:
        return COLUMN_TYPES[self.col_type]

    def validity_expr(self) -> Column:
        """True where the cell satisfies every restriction (nulls are
        handled separately as 'missing', matching DataVec quality calc)."""
        c = F.col(self.name)
        conds: list[Column] = []
        r = self.restrictions
        if self.col_type == "string":
            if "regex" in r:
                conds.append(c.rlike("^(?:" + r["regex"] + ")$"))
            if "min_length" in r:
                conds.append(F.length(c) >= r["min_length"])
            if "max_length" in r:
                conds.append(F.length(c) <= r["max_length"])
        elif self.col_type in ("integer", "long", "double", "float"):
            if "min_value" in r:
                conds.append(c >= r["min_value"])
            if "max_value" in r:
                conds.append(c <= r["max_value"])
            if self.col_type in ("double", "float"):
                if not r.get("allow_nan", False):
                    conds.append(~F.isnan(c))
                if not r.get("allow_infinite", False):
                    conds.append(~c.isin(float("inf"), float("-inf")))
        elif self.col_type == "categorical":
            if "states" in r:
                conds.append(c.isin(*r["states"]))
        elif self.col_type == "time":
            if "min_millis" in r:
                conds.append(c >= F.timestamp_millis(F.lit(r["min_millis"])))
            if "max_millis" in r:
                conds.append(c <= F.timestamp_millis(F.lit(r["max_millis"])))
        out = F.lit(True)
        for cond in conds:
            out = out & cond
        return out

    def to_dict(self) -> dict:
        return {"name": self.name, "type": self.col_type, "restrictions": dict(self.restrictions)}

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnSpec":
        return cls(d["name"], d["type"], dict(d.get("restrictions", {})))


@dataclass
class EngineSchema:
    columns: list[ColumnSpec]

    def __post_init__(self):
        names = [c.name for c in self.columns]
        assert len(names) == len(set(names)), f"duplicate column names: {names}"

    # -- construction sugar (Schema.Builder parity, Schema.java:384-754) ----
    @classmethod
    def builder(cls) -> "_Builder":
        return _Builder()

    def column(self, name: str) -> ColumnSpec:
        return next(c for c in self.columns if c.name == name)

    def names(self) -> list[str]:
        return [c.name for c in self.columns]

    def to_struct(self) -> T.StructType:
        return T.StructType([T.StructField(c.name, c.spark_type()) for c in self.columns])

    # -- validity ------------------------------------------------------------
    def row_validity_expr(self, columns: list[str] | None = None) -> Column:
        """True where every (selected) cell is non-null and valid —
        FilterInvalidValues semantics (transform/filter/FilterInvalidValues.java:35)."""
        cols = [c for c in self.columns if columns is None or c.name in columns]
        out = F.lit(True)
        for c in cols:
            out = out & F.col(c.name).isNotNull() & c.validity_expr()
        return out

    def filter_invalid(self, df: DataFrame, columns: list[str] | None = None) -> DataFrame:
        return df.where(self.row_validity_expr(columns))

    # -- inference (Schema.infer, Schema.java:772-790) ------------------------
    @classmethod
    def from_struct(cls, struct: T.StructType) -> "EngineSchema":
        rev = {
            "string": "string",
            "int": "integer",
            "bigint": "long",
            "double": "double",
            "float": "float",
            "timestamp": "time",
            "binary": "bytes",
            "boolean": "boolean",
        }
        cols = []
        for f in struct.fields:
            s = f.dataType.simpleString()
            cols.append(ColumnSpec(f.name, rev.get(s, "ndarray" if s.startswith("array") else "string")))
        return cls(cols)

    # -- serde (Schema.toJson/fromJson parity) ---------------------------------
    def to_json(self) -> str:
        return json.dumps({"columns": [c.to_dict() for c in self.columns]})

    @classmethod
    def from_json(cls, s: str) -> "EngineSchema":
        return cls([ColumnSpec.from_dict(d) for d in json.loads(s)["columns"]])


class _Builder:
    def __init__(self):
        self._cols: list[ColumnSpec] = []

    def _add(self, name, t, **r):
        self._cols.append(ColumnSpec(name, t, {k: v for k, v in r.items() if v is not None}))
        return self

    def add_string(self, name, regex=None, min_length=None, max_length=None):
        return self._add(name, "string", regex=regex, min_length=min_length, max_length=max_length)

    def add_integer(self, name, min_value=None, max_value=None):
        return self._add(name, "integer", min_value=min_value, max_value=max_value)

    def add_long(self, name, min_value=None, max_value=None):
        return self._add(name, "long", min_value=min_value, max_value=max_value)

    def add_double(self, name, min_value=None, max_value=None, allow_nan=False, allow_infinite=False):
        return self._add(name, "double", min_value=min_value, max_value=max_value,
                         allow_nan=allow_nan, allow_infinite=allow_infinite)

    def add_float(self, name, min_value=None, max_value=None):
        return self._add(name, "float", min_value=min_value, max_value=max_value)

    def add_categorical(self, name, states):
        return self._add(name, "categorical", states=list(states))

    def add_time(self, name, min_millis=None, max_millis=None):
        return self._add(name, "time", min_millis=min_millis, max_millis=max_millis)

    def add_boolean(self, name):
        return self._add(name, "boolean")

    def add_ndarray(self, name):
        return self._add(name, "ndarray")

    # patterned bulk add (Schema.java:451-474)
    def add_doubles(self, pattern: str, lo: int, hi: int):
        for i in range(lo, hi + 1):
            self._add(pattern % i, "double")
        return self

    def build(self) -> EngineSchema:
        return EngineSchema(list(self._cols))
