from datavec_spark.plans.schema import ColumnSpec, EngineSchema

__all__ = ["ColumnSpec", "EngineSchema"]
