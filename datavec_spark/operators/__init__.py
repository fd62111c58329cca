from datavec_spark.operators.conditions import condition_expr
from datavec_spark.operators.transforms import TransformProcess

# importing registers their ops into the TransformProcess registry
import datavec_spark.operators.geo  # noqa: F401
import datavec_spark.operators.joins  # noqa: F401
import datavec_spark.operators.reducers  # noqa: F401
import datavec_spark.operators.sequence  # noqa: F401
import datavec_spark.functions.nlp  # noqa: F401

__all__ = ["condition_expr", "TransformProcess"]
