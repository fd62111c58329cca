from datavec_spark.sources.icelite import IceliteTable

__all__ = ["IceliteTable"]
