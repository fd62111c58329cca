from datavec_spark.streaming.replay import CdcEngine

__all__ = ["CdcEngine"]
