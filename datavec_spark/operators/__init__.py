from datavec_spark.operators.conditions import condition_expr
from datavec_spark.operators.transforms import TransformProcess

__all__ = ["condition_expr", "TransformProcess"]
