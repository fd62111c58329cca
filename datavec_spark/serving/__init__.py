from datavec_spark.serving.rest import RestTransformServer

__all__ = ["RestTransformServer"]
